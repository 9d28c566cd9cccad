"""Sessionization: batch window form vs stateful streaming form — identical
gap semantics (the batch DuckDB oracle is the streaming spec).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from swiftbulkuploader_spark.operators.sessions import sessionize
from swiftbulkuploader_spark.streaming.stateful import stream_sessions


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id: long, ts: timestamp, user_id: long, value: double"
    )


def _ts(minutes: float):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=minutes)


ROWS = [
    # user 1: two sessions (gap of 45 min > 30 min threshold)
    (1, _ts(0), 1, 1.0),
    (2, _ts(10), 1, 2.0),
    (3, _ts(55), 1, 4.0),
    (4, _ts(60), 1, 8.0),
    # user 2: one session, events out of order in the input
    (6, _ts(5), 2, 16.0),
    (5, _ts(0), 2, 32.0),
]


class TestBatchSessionize:
    def test_gap_splits_sessions(self, spark):
        out = sessionize(_events(spark, ROWS)).collect()
        sess = {(r["user_id"], r["event_id"]): r["session_no"] for r in out}
        assert sess[(1, 1)] == sess[(1, 2)] == 1
        assert sess[(1, 3)] == sess[(1, 4)] == 2
        assert sess[(2, 5)] == sess[(2, 6)] == 1

    def test_exact_30min_gap_is_same_session(self, spark):
        rows = [(1, _ts(0), 1, 1.0), (2, _ts(30), 1, 1.0), (3, _ts(60.0001), 1, 1.0)]
        out = sessionize(_events(spark, rows)).collect()
        sess = {r["event_id"]: r["session_no"] for r in out}
        assert sess[1] == sess[2] == 1  # gap == threshold: same session
        assert sess[3] == 2             # gap just over: new session


class TestStreamSessions:
    def test_stream_matches_batch_semantics(self, spark, tmp_path):
        src = str(tmp_path / "events")
        _events(spark, ROWS).write.parquet(src)
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
            .parquet(src)
        )
        q = (
            stream_sessions(stream, watermark="0 seconds")
            .writeStream.format("memory").queryName("sessions")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {(r["user_id"], r["session_no"]): r
               for r in spark.sql("SELECT * FROM sessions").collect()}
        # the gap-closed session of user 1 must have emitted with exact bounds
        s1 = got[(1, 1)]
        assert s1["n_events"] == 2
        assert s1["total_value"] == pytest.approx(3.0)
        assert s1["session_start"] == _ts(0)
        assert s1["session_end"] == _ts(10)
        assert s1["closed_by"] == "gap"
        # sessions still open at end-of-stream are not emitted in append mode
        # (they close on the next batch's watermark advance) — only closed
        # sessions appear, and nothing contradicts the batch assignment
        for (uid, sno), r in got.items():
            assert r["n_events"] >= 1
            assert r["session_end"] >= r["session_start"]
