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


def bucketed_rank(df: DataFrame, key: str, order_col: str, bucket_width: int,
                  out: str = "rn",
                  tie_cols: tuple[str, ...] = ()) -> DataFrame:
    """Skew-free ``row_number() OVER (PARTITION BY key ORDER BY
    order_col[, tie_cols])`` for a NUMERIC non-negative order column —
    the window shape AQE cannot split (WindowExec funnels every row of a
    hot key to ONE task; a Zipf mega-domain owning 10-20% of a 100 TB
    crawl makes that task the job).

    Decomposition (order-aligned buckets, r10 verdict ask #2):

    1. bucket = floor(order_col / bucket_width) — monotone in
       order_col, so ranking within a bucket + counting earlier buckets
       reproduces the global per-key rank exactly;
    2. local row_number per (key, bucket) — max partition is the per-key
       rows in ONE bucket (~bucket occupancy), spread over tasks;
    3. per-(key, bucket) counts (map-side combined, one row per pair)
       cumulative-summed per key over the BOUNDED bucket axis;
    4. join offsets back on (key, bucket) — hash-spread keys.

    Exactness requires order_col to be unique per key (ties within a
    bucket are broken by tie_cols, but CROSS-bucket ties would split a
    peer group); callers pass a per-key-unique column (the frontier's
    keeper_doc — group minima of a partition are distinct).

    Cost: two extra shuffles vs the single-window plan. The trade is
    deliberate: the window plan's hot-key task is O(hot-key rows) on one
    core; every stage here is bounded by bucket occupancy regardless of
    the key distribution (measured: tools/scaling_probe.py
    url_frontier_* shapes, SCALING.md Zipf row).
    """
    from pyspark.sql.window import Window

    with_b = df.withColumn(
        "_bkt", F.floor(F.col(order_col) / F.lit(bucket_width)).cast("long")
    )
    cnt = with_b.groupBy(key, "_bkt").agg(F.count(F.lit(1)).alias("_c"))
    woff = (
        Window.partitionBy(key).orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = cnt.select(
        key, "_bkt",
        F.coalesce(F.sum("_c").over(woff), F.lit(0)).alias("_off"),
    )
    wloc = Window.partitionBy(key, "_bkt").orderBy(order_col, *tie_cols)
    return (
        with_b.withColumn("_lrn", F.row_number().over(wloc))
        .join(off, [key, "_bkt"])
        .withColumn(out, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_bkt", "_lrn", "_off")
    )
