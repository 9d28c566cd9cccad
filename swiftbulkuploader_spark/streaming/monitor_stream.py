"""Streaming maintenance of the sequential experiment monitor.

The streaming twin of operators/stats_inference.py::x6_sequential_monitor
— the monitor you would ACTUALLY run during a live experiment: event
micro-batches arrive, each contributes its (hour, arm-moment) delta, and
the dashboard reads the cumulative O'Brien-Fleming readout without ever
rescanning history. This works because the monitor's whole state is six
SUM-MERGEABLE exact-integer cells per hour (monitor_hourly_cells):
sums of per-batch sums equal the batch-mode sums EXACTLY (integer
decimals, no summation-order ulps), so the streamed readout is
bit-identical to x6_sequential_monitor on the same data — pinned by
tests/test_monitor_stream.py.

Exactly-once by the rollup_stream discipline: each micro-batch writes its
OWN delta under a batch_id partition via dynamic partition overwrite, so
an at-least-once foreachBatch replay overwrites the same partition with
the same rows (see streaming/rollup_stream.py's module docstring for why
read-merge-overwrite designs double count).

At 100 TB: per-batch work ∝ batch size (one map-side-combined rollup to
<= hours-per-batch rows); read cost ∝ delta partitions x hourly grid —
calendar-bounded, never corpus-bounded. Reference parity: the closest
reference behavior is the polled progress counter (bulkupload.py:320-331)
— this is that counter generalized to a statistically valid live readout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swiftbulkuploader_spark.operators.stats_inference import (
    monitor_hourly_cells,
    monitor_readout,
)

_CELLS = ("pna", "pnb", "psa", "psb", "pqa", "pqb")


def _write_delta(delta_path: str):
    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        delta = monitor_hourly_cells(batch).withColumn(
            "batch_id", F.lit(batch_id)
        )
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            delta.write.partitionBy("batch_id").mode("overwrite").parquet(
                delta_path
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return fn


def read_monitor(spark: SparkSession, delta_path: str) -> DataFrame:
    """Current sequential readout = fold the per-batch moment deltas
    (exact integer sums) and apply the batch readout."""
    cells = (
        spark.read.parquet(delta_path)
        .groupBy("hour")
        .agg(*[F.sum(c).cast("decimal(38,0)").alias(c) for c in _CELLS])
    )
    return monitor_readout(cells)


def stream_experiment_monitor(events_stream: DataFrame, delta_path: str,
                              checkpoint: str):
    """Start the live monitor: events stream -> per-batch moment deltas
    at `delta_path` (read with read_monitor). Returns the
    StreamingQuery."""
    return (
        events_stream.writeStream.foreachBatch(_write_delta(delta_path))
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
