"""Shared DuckDB-oracle SQL fragments.

Single source of truth for oracle-side expressions that must mirror a
Spark-side helper in functions/ — one definition, imported by every oracle
that uses it, so a change to the Spark helper has exactly one DuckDB
counterpart to update (and the drift shows up in every oracle at once).
"""

# DuckDB mirror of functions/text.py::token_count's non-empty branch:
# whitespace-normalized split, counted.
TOKENS_DUCK_BARE = (
    "len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))"
)

# Full mirror including the blank-text -> 0 guard.
TOKENS_DUCK = (
    "CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0 "
    f"THEN 0 ELSE {TOKENS_DUCK_BARE} END"
)

# DuckDB mirror of functions/text.py::quality_score (round 12, r11 ADVICE
# #3): length band * (0.7 * alpha ratio + 0.3 * (1 - punct ratio)),
# rounded to 6 dp. Previously hand-inlined at ~5 oracle sites; any change
# to quality_score now has exactly this one DuckDB counterpart. NOTE:
# contains literal '{'/'}' (the punct character class) — interpolate via
# f-string replacement field or concatenation, never str.format().
QUALITY_SCORE_DUCK = """round(
    (CASE WHEN length(text) BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.5 END)
    * (0.7 * (CASE WHEN length(text) > 0
              THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text)
              ELSE 0.0 END)
       + 0.3 * (1 - (CASE WHEN length(text) > 0
                THEN length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))::DOUBLE / length(text)
                ELSE 0.0 END))),
    6)"""
