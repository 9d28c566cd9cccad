"""Spark 4 transformWithStateInPandas: running per-user profile.

The end-to-end run needs the Python `protobuf` package (Spark's state-server
protocol), which this container does not ship — that test is gated behind an
import-try (same policy as the multimodal codecs). Plan construction and
schema wiring are always tested; the classic-API stateful operator
(streaming/stateful.py) is executed end-to-end in test_sessions.py.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from swiftbulkuploader_spark.streaming.stateful_v2 import (
    OUTPUT_SCHEMA,
    stream_running_profile,
)

try:
    from google import protobuf  # noqa: F401
    HAVE_PROTOBUF = True
except ImportError:
    HAVE_PROTOBUF = False


def _ts(minutes: float):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=minutes)


SCHEMA = "event_id: long, ts: timestamp, user_id: long, event_type: string, value: double"

BATCH1 = [
    (1, _ts(0), 1, "view", 1.0),
    (2, _ts(1), 1, "click", 2.0),
    (3, _ts(2), 2, "view", 4.0),
]
BATCH2 = [
    (4, _ts(3), 1, "view", 8.0),
    (5, _ts(4), 2, "purchase", 16.0),
    (6, _ts(5), 3, "view", 32.0),
]


class TestTransformWithState:
    def test_plan_constructs_with_contract_schema(self, spark, tmp_path):
        src = str(tmp_path / "events")
        spark.createDataFrame(BATCH1, SCHEMA).write.parquet(src)
        stream = spark.readStream.schema(SCHEMA.replace(":", "")).parquet(src)
        out = stream_running_profile(stream)
        assert out.isStreaming
        assert out.schema == OUTPUT_SCHEMA

    @pytest.mark.skipif(not HAVE_PROTOBUF, reason="transformWithState needs python protobuf (not in container)")
    def test_final_state_equals_batch_aggregate(self, spark, tmp_path):
        src = str(tmp_path / "events")
        # two files -> two micro-batches (maxFilesPerTrigger=1): state must
        # survive the batch boundary, not just accumulate within one batch
        spark.createDataFrame(BATCH1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(BATCH2, SCHEMA).coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(SCHEMA.replace(":", ""))
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream_running_profile(stream)
            .writeStream.format("memory").queryName("profile")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        updates = spark.table("profile")
        final = {
            r["user_id"]: (r["n_events"], r["total_value"], r["n_types"])
            for r in updates.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
                ),
            ).filter("rn = 1").collect()
        }

        batch = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
        expected = {
            r["user_id"]: (r["n"], r["total"], r["n_types"])
            for r in batch.groupBy("user_id").agg(
                F.count("*").alias("n"),
                F.sum("value").alias("total"),
                F.countDistinct("event_type").alias("n_types"),
            ).collect()
        }
        assert final == expected
        u1 = sorted(r["n_events"] for r in updates.filter("user_id = 1").collect())
        assert u1 == [2, 3]
