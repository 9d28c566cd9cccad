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
