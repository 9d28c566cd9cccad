"""Text-analysis primitives (SURVEY.md §2.9 X3) as Column expressions.

Language-ID, quality scoring, token counting and fingerprinting for the
``documents`` table. All JVM-side (regex + string builtins); no Python in the
hot path, so these run at full scan speed over 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic
# language ID. Deliberately small and deterministic — the point is the Spark
# plumbing (scan-speed scoring), not linguistic accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "les", "des", "est"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("的", "是", "了", "在", "我"),
}


def normalize_ws(text: Column) -> Column:
    """Collapse runs of whitespace to single spaces and trim."""
    return F.trim(F.regexp_replace(text, "\\s+", " "))


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    norm = normalize_ws(text)
    return F.when(F.length(norm) == 0, F.lit(0)).otherwise(
        F.size(F.split(norm, " "))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: splits on word/number/punctuation boundaries
    (a cheap regex stand-in for BPE vocab size estimation)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0)
    )


def stopword_hits(text: Column, words: tuple[str, ...]) -> Column:
    """How many of ``words`` occur (word-bounded) in lowercased text."""
    lowered = F.lower(text)
    hits = [
        F.when(lowered.rlike(r"(^|\s)" + w + r"(\s|$)"), 1).otherwise(0)
        for w in words
    ]
    out = hits[0]
    for h in hits[1:]:
        out = out + h
    return out


def detect_lang(text: Column) -> Column:
    """Heuristic language ID: the language whose marker set hits most.

    Ties resolve by the (stable) ordering of LANG_MARKERS; no hits -> 'und'.
    """
    scores = [(lang, stopword_hits(text, ws)) for lang, ws in LANG_MARKERS.items()]
    best_score = scores[0][1]
    for _, s in scores[1:]:
        best_score = F.greatest(best_score, s)
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for lang, s in reversed(scores):
        expr = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text: Column) -> Column:
    """Cheap document-quality score in [0, 1]: length band, alpha ratio,
    punctuation ratio. Mirrors the usual pretraining-data filters."""
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    punct_ratio = F.when(n > 0, punct / n).otherwise(F.lit(0.0))
    len_band = F.when((n >= 50) & (n <= 20000), F.lit(1.0)).otherwise(F.lit(0.5))
    score = len_band * (F.lit(0.7) * alpha_ratio + F.lit(0.3) * (1 - punct_ratio))
    return F.round(score, 6)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text. Stable across engines (DuckDB md5 matches)."""
    return F.md5(F.lower(normalize_ws(text)))


def shingles(text: Column, k: int = 5) -> Column:
    """Word k-shingles of normalized text as an array<string> (for MinHash /
    Jaccard near-dup). Documents shorter than k words yield the whole text
    as a single shingle.

    Implementation note: built by zip_with-ing k shifted slices of the token
    array, NOT by indexing the array inside a transform() lambda. Interpreted
    higher-order functions re-evaluate captured subexpressions per element
    (no CSE), so `transform(idx, i -> slice(split(text), i, k))` re-splits
    the whole document for every position — O(n^2), ~50 s for one 100 KB
    doc. The zip form evaluates each slice once: linear."""
    toks = F.split(F.lower(normalize_ws(text)), " ")
    n = F.size(toks)
    m = F.greatest(n - (k - 1), F.lit(1))  # number of shingles
    out = F.slice(toks, 1, m)
    for j in range(1, k):
        # zip the running prefix with the j-shifted tokens; slice is padded
        # via least() so short docs still produce their single shingle
        shifted = F.slice(toks, 1 + j, m)
        out = F.zip_with(
            out, shifted,
            lambda acc, t: F.when(t.isNotNull(), F.concat(acc, F.lit(" "), t)).otherwise(acc),
        )
    return out
