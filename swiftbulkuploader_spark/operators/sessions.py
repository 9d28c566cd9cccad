"""Sessionization (gap-based) over the events stream — the engine's custom
stateful operator showcase.

Batch form (`x7_sessionize`): pure window functions — lag + cumulative sum of
gap-breaks assigns session ids in two narrow shuffles on user_id. Fully
SQL-expressible, DuckDB-oracle-checked.

Streaming form lives in streaming/stateful.py (applyInPandasWithState) with
identical semantics, so the batch oracle doubles as the streaming spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from swiftbulkuploader_spark.catalog import load_table

GAP_MINUTES = 30


def sessionize(events: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """Assign gap-based sessions per user: a new session starts when the gap
    since the previous event exceeds `gap_minutes`."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    # microsecond precision on both sides of the oracle (DuckDB epoch_us);
    # whole-second casts would disagree on fractional-second boundaries
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    is_new = (
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(ts_us - F.lag(ts_us).over(w) > gap_us, 1)
        .otherwise(0)
    )
    return events.withColumn("session_no", F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))


def x7_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollup: bounds, event count, total value. Two shuffles on
    user_id (window + groupBy share the partitioning — Catalyst reuses the
    exchange)."""
    events = load_table(spark, sf_dir, "events")
    return (
        sessionize(events)
        .groupBy("user_id", "session_no")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def x7_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-length distribution — the report a funnel analysis starts
    from."""
    events = load_table(spark, sf_dir, "events")
    per_session = sessionize(events).groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events")
    )
    return per_session.groupBy("n_events").agg(
        F.count("*").alias("n_sessions")
    )


QUERIES = {
    "x7_sessionize": x7_sessionize,
    "x7_session_stats": x7_session_stats,
}

_SESSIONIZED = f"""
    SELECT user_id, ts, event_id, value,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
    FROM (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL THEN 1
                    WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id))
                         > {GAP_MINUTES * 60 * 1_000_000} THEN 1
                    ELSE 0 END AS is_new
        FROM events
    )
"""

ORACLES = {
    "x7_sessionize": f"""
        SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM ({_SESSIONIZED})
        GROUP BY user_id, session_no
    """,
    "x7_session_stats": f"""
        SELECT n_events, count(*) AS n_sessions
        FROM (
            SELECT user_id, session_no, count(*) AS n_events
            FROM ({_SESSIONIZED})
            GROUP BY user_id, session_no
        )
        GROUP BY n_events
    """,
}
