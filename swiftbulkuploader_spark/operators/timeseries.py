"""Time-series regularization: gap-fill (time spine + forward fill).

Event streams are irregular; downstream models want a regular grid. The
operator: per key, build the hourly spine spanning that key's activity
window (`sequence` + `explode` — no driver loop, no UDF), left-join the
bucketed observations, and forward-fill with `last(value, ignorenulls)`
over an ordered window. Everything is one narrow shuffle on the key plus
the spine explode; spine rows ∝ keys x hours, independent of event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from swiftbulkuploader_spark.catalog import load_table


def gap_fill(events: DataFrame, key: str, ts: str, value: str,
             step: str = "1 hour") -> DataFrame:
    """(key, hour, value, filled): one row per key per step in the key's
    [min, max] activity window; `value` is the step's mean observation
    (null where no events), `filled` carries the last observation forward."""
    bucketed = events.select(
        key,
        F.date_trunc("hour", F.col(ts)).alias("bucket"),
        F.col(value).alias("v"),
    ).groupBy(key, "bucket").agg(F.avg("v").alias("v"))

    spans = bucketed.groupBy(key).agg(
        F.min("bucket").alias("t0"), F.max("bucket").alias("t1")
    )
    spine = spans.select(
        key,
        F.explode(
            F.sequence("t0", "t1", F.expr(f"INTERVAL {step}"))
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(bucketed, [key, "bucket"], "left")
        .select(
            key,
            "bucket",
            F.round("v", 6).alias("value"),
            F.round(F.last("v", ignorenulls=True).over(w), 6).alias("filled"),
        )
    )


def x7_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user value grid over events, forward-filled."""
    events = load_table(spark, sf_dir, "events")
    out = gap_fill(events, key="user_id", ts="ts", value="value")
    return out.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "value",
        "filled",
    )


QUERIES = {
    "x7_gap_fill": x7_gap_fill,
}

ORACLES = {
    "x7_gap_fill": """
        WITH bucketed AS (
            SELECT user_id, date_trunc('hour', ts) AS bucket, avg(value) AS v
            FROM events GROUP BY user_id, date_trunc('hour', ts)
        ), spans AS (
            SELECT user_id, min(bucket) AS t0, max(bucket) AS t1
            FROM bucketed GROUP BY user_id
        ), spine AS (
            SELECT user_id,
                   unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket
            FROM spans
        )
        SELECT s.user_id,
               strftime(s.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
               round(b.v, 6) AS value,
               round(last_value(b.v IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled
        FROM spine s LEFT JOIN bucketed b USING (user_id, bucket)
    """,
}
