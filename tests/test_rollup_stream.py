"""Continuous aggregate: streamed rollup == batch rollup over the same
events, including buckets that span micro-batches; replay of a micro-batch
(foreachBatch's at-least-once window) must not double count.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from swiftbulkuploader_spark.operators.timeseries import hourly_rollup
from swiftbulkuploader_spark.streaming.rollup_stream import (
    _merge_batch,
    compact,
    read_rollup,
    stream_hourly_rollup,
)

SCHEMA = "event_id: long, ts: timestamp, user_id: long, event_type: string, value: double"


def _ts(day: int, hour: int, minute: int = 0):
    return datetime.datetime(2024, 1, day, hour, minute)


BATCH1 = [
    (1, _ts(1, 10, 0), 1, "view", 1.0),
    (2, _ts(1, 10, 30), 1, "view", 2.0),
    (3, _ts(1, 11, 0), 2, "click", 4.0),
]
# batch 2 re-touches day1 hour 10 (cross-batch bucket) and adds day 2
BATCH2 = [
    (4, _ts(1, 10, 45), 3, "view", 8.0),
    (5, _ts(2, 9, 0), 1, "view", 16.0),
    (6, _ts(2, 9, 30), 2, "purchase", 32.0),
]


def _rollup_dict(df):
    return {
        (r["event_type"], r["hour"]): (r["n_events"], r["total_value"])
        for r in df.collect()
    }


class TestContinuousAggregate:
    def test_streamed_rollup_equals_batch(self, spark, tmp_path):
        src = str(tmp_path / "events")
        spark.createDataFrame(BATCH1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(BATCH2, SCHEMA).coalesce(1).write.mode("append").parquet(src)

        delta = str(tmp_path / "rollup_delta")
        stream = (
            spark.readStream.schema(SCHEMA.replace(":", ""))
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_hourly_rollup(stream, delta, str(tmp_path / "cp"))
        q.awaitTermination(120)

        got = _rollup_dict(read_rollup(spark, delta))
        expected = _rollup_dict(hourly_rollup(spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)))
        assert got == expected
        # cross-batch bucket really accumulated (2 events in b1 + 1 in b2)
        assert got[("view", _ts(1, 10))][0] == 3
        # per-batch partitions on disk (the exactly-once unit)
        assert any(d.startswith("batch_id=") for d in os.listdir(delta))

    def test_batch_replay_does_not_double_count(self, spark, tmp_path):
        """foreachBatch is at-least-once: re-delivering the SAME batch_id
        (crash between write and checkpoint commit) must be a no-op."""
        delta = str(tmp_path / "delta")
        fn = _merge_batch(delta)
        b1 = spark.createDataFrame(BATCH1, SCHEMA)
        fn(b1, 0)
        once = _rollup_dict(read_rollup(spark, delta))
        fn(b1, 0)  # replay
        assert _rollup_dict(read_rollup(spark, delta)) == once
        # a genuinely new batch still accumulates
        fn(spark.createDataFrame(BATCH2, SCHEMA), 1)
        final = _rollup_dict(read_rollup(spark, delta))
        assert final == _rollup_dict(
            hourly_rollup(spark.createDataFrame(BATCH1 + BATCH2, SCHEMA))
        )

    def test_restart_is_idempotent(self, spark, tmp_path):
        src = str(tmp_path / "events")
        spark.createDataFrame(BATCH1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
        delta = str(tmp_path / "delta")
        cp = str(tmp_path / "cp")

        for _ in range(2):  # second run: checkpoint says nothing new
            stream = spark.readStream.schema(SCHEMA.replace(":", "")).parquet(src)
            q = stream_hourly_rollup(stream, delta, cp)
            q.awaitTermination(120)

        got = read_rollup(spark, delta)
        assert got.count() == 2  # (view,10h) and (click,11h)
        assert got.agg(F.sum("n_events")).first()[0] == 3

    def test_compact_preserves_rollup(self, spark, tmp_path):
        delta = str(tmp_path / "delta")
        fn = _merge_batch(delta)
        fn(spark.createDataFrame(BATCH1, SCHEMA), 0)
        fn(spark.createDataFrame(BATCH2, SCHEMA), 1)
        before = _rollup_dict(read_rollup(spark, delta))
        compacted = str(tmp_path / "compacted")
        compact(spark, delta, compacted)
        assert _rollup_dict(read_rollup(spark, compacted)) == before
        # one baseline partition remains
        assert os.listdir(compacted + "/batch_id=-1")
