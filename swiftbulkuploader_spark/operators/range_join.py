"""Bucketed range join — the time-window join (SURVEY.md §2.9 custom-operator
tier: an operator Spark lacks, built as a composition of DataFrame ops).

Problem: "for each error event, how many events did the same user emit
within ±5 minutes?" A naive `a JOIN b ON a.user = b.user AND |a.ts - b.ts|
<= 5min` gives Spark an equi-key (user) but each hot user still explodes
into a per-user cross product, and with no equi-key at all it degenerates to
BroadcastNestedLoopJoin — quadratic, dead at scale.

The bucketed formulation: quantize time into interval-width buckets; a row
can only match rows in its own or adjacent buckets, so joining on
(user_id, bucket) with the probe side EXPLODED to its 3 candidate buckets
turns the range join into a pure equi-join (hash, shuffle on the composite
key) followed by the exact range filter. Cost: 3x probe-side duplication —
constant — instead of a quadratic nested loop.

Oracle: DuckDB runs the naive inequality join (correct at sf0.01 scale),
proving the bucketed rewrite is semantics-preserving.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from swiftbulkuploader_spark.catalog import load_table

WINDOW_MINUTES = 5


def range_join_counts(events: DataFrame, anchor_filter: Column,
                      window_minutes: int = WINDOW_MINUTES) -> DataFrame:
    """For each anchor event (rows matching `anchor_filter`), count events of
    the same user within ±window (excluding the anchor row itself)."""
    win_us = window_minutes * 60 * 1_000_000
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))

    probe = events.filter(anchor_filter).select(
        F.col("event_id").alias("anchor_id"),
        F.col("user_id"),
        ts_us.alias("anchor_us"),
        F.explode(
            F.array(
                (ts_us / win_us).cast("long") - 1,
                (ts_us / win_us).cast("long"),
                (ts_us / win_us).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    build = events.select(
        F.col("event_id").alias("other_id"),
        F.col("user_id"),
        ts_us.alias("other_us"),
        (ts_us / win_us).cast("long").alias("bucket"),
    )
    joined = probe.join(build, ["user_id", "bucket"]).filter(
        (F.abs(F.col("other_us") - F.col("anchor_us")) <= win_us)
        & (F.col("other_id") != F.col("anchor_id"))
    )
    # left join back so anchors with zero neighbors keep a row (count 0)
    counts = joined.groupBy("anchor_id").agg(
        F.countDistinct("other_id").alias("n_nearby")
    )
    anchors = events.filter(anchor_filter).select(F.col("event_id").alias("anchor_id"))
    return anchors.join(counts, "anchor_id", "left").select(
        "anchor_id",
        F.coalesce("n_nearby", F.lit(0)).alias("n_nearby"),
    )


def x7_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-burst detection: events by the same user within ±5 minutes of
    each error event — the range-join shape every incident pipeline needs."""
    events = load_table(spark, sf_dir, "events")
    return range_join_counts(events, F.col("event_type") == "error")


QUERIES = {
    "x7_error_burst": x7_error_burst,
}

ORACLES = {
    "x7_error_burst": f"""
        SELECT a.event_id AS anchor_id,
               CAST(count(b.event_id) AS BIGINT) AS n_nearby
        FROM events a
        LEFT JOIN events b
          ON a.user_id = b.user_id
         AND b.event_id <> a.event_id
         AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= {WINDOW_MINUTES * 60 * 1_000_000}
        WHERE a.event_type = 'error'
        GROUP BY a.event_id
    """,
}
