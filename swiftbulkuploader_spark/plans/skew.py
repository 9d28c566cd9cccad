"""Skew mitigation helpers (SURVEY.md §4.2 / the 100 TB checklist).

AQE's skew-join handles most cases at runtime; these helpers cover the two
shapes AQE can't fix:

* `salted_agg`  — a groupBy where one key holds a huge share of rows (think
  `lang='en'` over a web corpus): pre-aggregate on (key, salt) first, then
  merge. Two shuffles, but the first spreads the hot key over `n_salts`
  reducers; correct for any algebraic aggregate expressed as
  (partial exprs, merge exprs).
* `salted_join` — fact-to-dim join where a handful of fact keys are hot and
  the dim is too big to broadcast: replicate each dim row `n_salts` times,
  salt the fact side randomly-but-deterministically (hash of a stable col),
  join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, key: str, n_salts: int, partials: dict[str, Column],
               merges: dict[str, Column]) -> DataFrame:
    """Two-phase aggregation over a skewed key.

    partials: output-name -> aggregate Column over the raw rows
    merges:   output-name -> aggregate Column over the partial columns

    Example (count + sum):
        salted_agg(df, "lang", 32,
                   {"n": F.count("*"), "s": F.sum("x")},
                   {"n": F.sum("n"), "s": F.sum("s")})
    """
    salt = (F.xxhash64(F.monotonically_increasing_id()) % n_salts).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(*[c.alias(name) for name, c in partials.items()])
    )
    return partial.groupBy(key).agg(*[c.alias(name) for name, c in merges.items()])


def salted_join(fact: DataFrame, dim: DataFrame, key: str, n_salts: int,
                fact_salt_col: str | None = None) -> DataFrame:
    """Equi-join with dim-side replication: dim rows are exploded across
    `n_salts` salt values; fact rows pick a deterministic salt from a stable
    column (or a per-row id), so each hot fact key spreads over n_salts
    reducers while every fact row still meets its dim row exactly once."""
    dim_salted = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    basis = F.col(fact_salt_col) if fact_salt_col else F.monotonically_increasing_id()
    fact_salted = fact.withColumn(
        "_salt", (F.pmod(F.xxhash64(basis), F.lit(n_salts))).cast("int")
    )
    return fact_salted.join(dim_salted, [key, "_salt"]).drop("_salt")
