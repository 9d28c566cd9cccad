"""Statistical-inference aggregates: linear-regression family, correlation,
and sketch-backed frequent-items.

Rounds out §2.9/X6 profiling with the bivariate statistics a corpus- or
cost-model pass needs (price ~ quantity fit per segment) and the heavy-hitter
sketch every 100 TB categorical profile starts with. The regression family
(`regr_*`) and `corr`/`covar_samp` are single-pass, mergeable aggregate
states in Spark — partial aggregation map-side, one shuffle of O(groups)
state, no second pass. `approx_top_k` is a frequent-items sketch
(SpaceSaving-style): bounded memory per partition, merged at the driver —
the scale path for "top N values of a column" that avoids a full
groupBy/count shuffle of every distinct value.

Reference parity: the reference has no statistics beyond counters
(bulkupload.py:320-331 progress %, :363-387 rate); these are north-star
extensions (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swiftbulkuploader_spark.catalog import load_table


def x6_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-return-flag OLS fit of extendedprice on quantity: slope/intercept/
    R², correlation, sample covariance, and the marginal stddevs.

    All are algebraic aggregates (sums of x, y, xy, x², y²) — one pass,
    partial+final merge, O(1) state per group. Results rounded to 6 dp on
    both engines: the sums differ only in summation order (~1e-12 rel), far
    inside the rounding margin.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_count(y, x).cast("long").alias("n"),
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.round(F.corr(y, x), 6).alias("corr_yx"),
            F.round(F.covar_samp(y, x), 6).alias("covar_yx"),
            F.round(F.stddev_samp(x), 6).alias("sd_qty"),
            F.round(F.stddev_samp(y), 6).alias("sd_price"),
        )
    )


def x6_top_frequent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters of `p_brand` via the `approx_top_k` frequent-items
    sketch, exploded back to (item, cnt) rows.

    Run in the sketch's *exact regime*: k (25) covers every distinct brand
    and the tracked-item budget (default 10⁴) exceeds the distinct count, so
    counts are exact and the result is oracle-checkable against a plain
    GROUP BY — which is precisely how the sketch is validated before being
    trusted at a scale where the GROUP BY is unaffordable.
    """
    part = load_table(spark, sf_dir, "part")
    topk = part.agg(F.expr("approx_top_k(p_brand, 25)").alias("tk"))
    return (
        topk.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("brand"),
            F.col("e.count").cast("long").alias("cnt"),
        )
    )


QUERIES = {
    "x6_regression_stats": x6_regression_stats,
    "x6_top_frequent": x6_top_frequent,
}

ORACLES = {
    "x6_regression_stats": """
        SELECT l_returnflag,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
               round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
               round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
               round(corr(l_extendedprice, l_quantity), 6) AS corr_yx,
               round(covar_samp(l_extendedprice, l_quantity), 6) AS covar_yx,
               round(stddev_samp(l_quantity), 6) AS sd_qty,
               round(stddev_samp(l_extendedprice), 6) AS sd_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "x6_top_frequent": """
        SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS cnt
        FROM part
        GROUP BY p_brand
    """,
}
