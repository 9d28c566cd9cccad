"""Continuous aggregate: streaming maintenance of the hourly rollup table.

The streaming twin of operators/timeseries.py::hourly_rollup — the
"hypertable continuous aggregate" pattern: raw events stream in, the
(event_type, hour) rollup table stays current, and every coarser resolution
(x7_multi_rollup) reads the rollup, never the raw stream.

Incremental by partition: the rollup is day-partitioned; each micro-batch
aggregates its own rows, reads back ONLY the day-partitions it touches
(partition-pruned scan), sums delta into them, and rewrites just those
partitions via dynamic partition overwrite. Work per batch ∝ touched days,
not table size — the property that keeps a years-long rollup maintainable
at 100 TB of raw events.

Idempotent by construction: a crash between write and checkpoint replays
the micro-batch into the same day-partitions — same inputs, same overwrite,
same result (the at-least-once + idempotent-sink guarantee the upload stage
documents, SURVEY.md §2.7). No watermark state lives in the streaming
engine; the rollup table IS the state, durable and mergeable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _aggregate(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round("value", 2)).alias("total_value"),
        )
        .withColumn("day", F.to_date("hour"))
    )


def _merge_batch(rollup_path: str):
    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        delta = _aggregate(batch)
        prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            try:
                current = spark.read.parquet(rollup_path)
                exists = True
            except Exception:
                exists = False
            if not exists:
                delta.write.partitionBy("day").mode("overwrite").parquet(rollup_path)
                return
            # driver-side list of touched days: tiny (bounded by batch time
            # span), and it makes the read below a partition-PRUNED scan
            days = [r["day"] for r in delta.select("day").distinct().collect()]
            touched = current.filter(F.col("day").isin(days))
            merged = (
                touched.unionByName(delta)
                .groupBy("event_type", "hour", "day")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("total_value").alias("total_value"),
                )
            )
            # materialize BEFORE overwriting partitions we just read from
            # (a lazy plan would read-after-truncate); dynamic mode rewrites
            # only the day-partitions present in `merged`
            merged.localCheckpoint(eager=True).write.partitionBy("day").mode(
                "overwrite"
            ).parquet(rollup_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    return fn


def stream_hourly_rollup(events_stream: DataFrame, rollup_path: str,
                         checkpoint: str):
    """Start the continuous aggregate: events stream -> durable day-
    partitioned hourly rollup at `rollup_path`. Returns the StreamingQuery."""
    return (
        events_stream.writeStream.foreachBatch(_merge_batch(rollup_path))
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
