"""Distribution windows and time-range frames.

Completes the window-function family beyond W1-W5 (pipeline_queries /
analytics_extra): relative-position distributions (percent_rank, cume_dist)
and RANGE-frame moving aggregates over event time — the "last hour of
activity per user" shape a training-data pipeline uses for rate limiting
and burst profiling. None of this exists in the reference (zero window
functions, SURVEY.md §2.5); each query is DuckDB-oracled.

Scale notes:
* Both shapes shuffle once on the partition key and sort within partitions;
  group sizes are bounded by per-customer / per-user activity, so the plan
  survives a 100x scale-up unchanged.
* The RANGE frame orders on integer microseconds (unix_micros), not a
  timestamp: Spark range frames require a numeric ordering expression, and
  integer bounds make the Spark and DuckDB (epoch_us) frames bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from swiftbulkuploader_spark.catalog import load_table

_HOUR_US = 3_600_000_000  # one hour in microseconds


def w6_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist of each order within its customer's history.

    Both are exact rationals evaluated as double division of identical
    integer inputs, so they hash-match across engines with no rounding.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


def w7_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving one-hour window per user over event time (RANGE frame):
    events-in-last-hour count and rolling value sum.

    ROWS frames count neighbors; RANGE frames bound by *value distance* —
    the correct semantics for time ("last hour", not "last 5 events").
    Summed values are rounded to 2dp first so both engines add identical
    doubles (cross-engine float-order discipline, see tools/verify_local).
    """
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-_HOUR_US, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(F.sum(F.round("value", 2)).over(w), 2).alias("sum_last_hour"),
    )


def w8_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST / NULLS LAST window ordering over a sparse
    column. Engines disagree on the default (Spark: nulls smallest;
    DuckDB: NULLS LAST) — portable ordered computation must always state
    it; this query pins both directions with a deterministic tiebreak."""
    events = load_table(spark, sf_dir, "events")
    sparse = F.when(F.col("event_id") % 7 == 0, F.col("value"))  # non-null ~1/7, null ~6/7
    w_last = Window.partitionBy("user_id").orderBy(
        sparse.asc_nulls_last(), F.col("event_id").asc()
    )
    w_first = Window.partitionBy("user_id").orderBy(
        sparse.desc_nulls_first(), F.col("event_id").asc()
    )
    return events.select(
        "user_id",
        "event_id",
        F.row_number().over(w_last).cast("long").alias("rn_nulls_last"),
        F.row_number().over(w_first).cast("long").alias("rn_nulls_first"),
    )


def w9_sliding_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median over a sliding 10-row frame per user (ROWS frame,
    ordered on integer microseconds + id for a total order). An aggregate
    most engines only offer as a full-group scalar, run windowed — the
    robust-smoothing shape for sensor/metric streams. Inputs rounded to 2dp
    first so the interpolated midpoint is the same IEEE double on both
    engines."""
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us, "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    v2 = F.round("value", 2)
    return events.select(
        "user_id",
        "event_id",
        F.round(F.percentile(v2, F.lit(0.5)).over(w), 6).alias("med_10"),
    )


QUERIES = {
    "w6_distribution_windows": w6_distribution_windows,
    "w7_time_range_frame": w7_time_range_frame,
    "w8_null_ordering": w8_null_ordering,
    "w9_sliding_median": w9_sliding_median,
}

ORACLES = {
    "w9_sliding_median": """
        SELECT user_id, event_id,
               round(quantile_cont(round(value, 2), 0.5) OVER w, 6) AS med_10
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY epoch_us(ts) ASC, event_id ASC
                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    """,
    "w6_distribution_windows": """
        SELECT o_custkey, o_orderkey,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
    "w7_time_range_frame": """
        SELECT user_id, event_id,
               count(*) OVER w AS n_last_hour,
               round(sum(round(value, 2)) OVER w, 2) AS sum_last_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    "w8_null_ordering": """
        SELECT user_id, event_id,
               CAST(row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY (CASE WHEN event_id % 7 = 0 THEN value END)
                            ASC NULLS LAST, event_id ASC) AS BIGINT) AS rn_nulls_last,
               CAST(row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY (CASE WHEN event_id % 7 = 0 THEN value END)
                            DESC NULLS FIRST, event_id ASC) AS BIGINT) AS rn_nulls_first
        FROM events
    """,
}
