"""Continuous aggregate: streamed rollup == batch rollup over the same
events, including buckets that span micro-batches.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from swiftbulkuploader_spark.operators.timeseries import hourly_rollup
from swiftbulkuploader_spark.streaming.rollup_stream import stream_hourly_rollup

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


class TestContinuousAggregate:
    def test_streamed_rollup_equals_batch(self, spark, tmp_path):
        src = str(tmp_path / "events")
        spark.createDataFrame(BATCH1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(BATCH2, SCHEMA).coalesce(1).write.mode("append").parquet(src)

        rollup = str(tmp_path / "rollup")
        stream = (
            spark.readStream.schema(SCHEMA.replace(":", ""))
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_hourly_rollup(stream, rollup, str(tmp_path / "cp"))
        q.awaitTermination(120)

        got = {
            (r["event_type"], r["hour"]): (r["n_events"], r["total_value"])
            for r in spark.read.parquet(rollup).collect()
        }
        batch = hourly_rollup(spark.createDataFrame(BATCH1 + BATCH2, SCHEMA))
        expected = {
            (r["event_type"], r["hour"]): (r["n_events"], r["total_value"])
            for r in batch.collect()
        }
        assert got == expected
        # cross-batch bucket really accumulated (2 events in b1 + 1 in b2)
        assert got[("view", _ts(1, 10))][0] == 3
        # day-partitioned layout on disk (partition pruning surface)
        assert any(d.startswith("day=") for d in os.listdir(rollup))

    def test_restart_is_idempotent(self, spark, tmp_path):
        src = str(tmp_path / "events")
        spark.createDataFrame(BATCH1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
        rollup = str(tmp_path / "rollup")
        cp = str(tmp_path / "cp")

        for _ in range(2):  # second run: checkpoint says nothing new
            stream = spark.readStream.schema(SCHEMA.replace(":", "")).parquet(src)
            q = stream_hourly_rollup(stream, rollup, cp)
            q.awaitTermination(120)

        got = spark.read.parquet(rollup)
        assert got.count() == 2  # (view,10h) and (click,11h)
        assert got.agg(F.sum("n_events")).first()[0] == 3
