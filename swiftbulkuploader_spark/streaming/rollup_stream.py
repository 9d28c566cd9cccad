"""Continuous aggregate: streaming maintenance of the hourly rollup table.

The streaming twin of operators/timeseries.py::hourly_rollup — the
"hypertable continuous aggregate" pattern: raw events stream in, the
(event_type, hour) rollup stays current, and every coarser resolution
(x7_multi_rollup) reads the rollup, never the raw stream.

Exactly-once by construction: each micro-batch aggregates its own rows and
writes them to a delta table partitioned by BATCH ID via dynamic partition
overwrite. foreachBatch is at-least-once — a crash between the write and
the checkpoint commit replays the batch — but a replay overwrites the SAME
batch_id partition with the same rows, so the delta table never double
counts (the earlier read-merge-overwrite design did: re-reading a table
that already contained the crashed attempt's delta re-added it).

`read_rollup` folds the deltas to the current rollup (sums of sums — the
same re-aggregation law x7_multi_rollup relies on); `compact` collapses
accumulated delta partitions into one, bounding read fan-in. Work per
batch ∝ batch size; work per read ∝ delta partitions since last compact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swiftbulkuploader_spark.operators.timeseries import hourly_rollup


def _merge_batch(delta_path: str):
    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        delta = hourly_rollup(batch).withColumn("batch_id", F.lit(batch_id))
        prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # dynamic mode replaces exactly the batch_id partition being
            # written: an at-least-once replay is a no-op overwrite
            delta.write.partitionBy("batch_id").mode("overwrite").parquet(delta_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    return fn


def read_rollup(spark: SparkSession, delta_path: str) -> DataFrame:
    """Current rollup = re-aggregation of the per-batch deltas."""
    return (
        spark.read.parquet(delta_path)
        .groupBy("event_type", "hour")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").alias("total_value"),
        )
    )


def compact(spark: SparkSession, delta_path: str, compacted_path: str) -> None:
    """Collapse all delta partitions into a single batch_id=-1 baseline at
    `compacted_path` (kept separate so a crashed compaction never corrupts
    the source deltas; swap paths or re-point readers after success)."""
    (
        read_rollup(spark, delta_path)
        .withColumn("batch_id", F.lit(-1))
        .write.partitionBy("batch_id")
        .mode("overwrite")
        .parquet(compacted_path)
    )


def stream_hourly_rollup(events_stream: DataFrame, delta_path: str,
                         checkpoint: str):
    """Start the continuous aggregate: events stream -> per-batch delta
    partitions at `delta_path` (read with read_rollup). Returns the
    StreamingQuery."""
    return (
        events_stream.writeStream.foreachBatch(_merge_batch(delta_path))
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
