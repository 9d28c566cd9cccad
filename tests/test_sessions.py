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


class TestEWMASmooth:
    def test_recursion_matches_reference(self, spark, tmp_path):
        """Pin the fold: s1=x1, s_t = 0.75*s_{t-1} + 0.25*x_t over the
        CHRONOLOGICAL order (not insertion order), and drift = ewma-mean."""
        from datetime import datetime

        import pytest

        from swiftbulkuploader_spark.operators.timeseries import x7_ewma_smooth

        t = lambda s: datetime(2024, 1, 1, 0, 0, s)
        # inserted out of order on purpose: sort must be by ts
        rows = [
            (3, t(30), 1, "a", 100.0, "{}"),
            (1, t(10), 1, "a", 10.0, "{}"),
            (2, t(20), 1, "a", 20.0, "{}"),
            (4, t(5), 2, "a", 7.0, "{}"),   # single-event user: ewma = value
        ]
        df = spark.createDataFrame(
            rows,
            "event_id: long, ts: timestamp_ntz, user_id: long, "
            "event_type: string, value: double, props: string",
        )
        df.write.parquet(str(tmp_path / "events.parquet"))
        got = {r["user_id"]: r for r in x7_ewma_smooth(spark, str(tmp_path)).collect()}
        s = 10.0
        s = 0.75 * s + 0.25 * 20.0
        s = 0.75 * s + 0.25 * 100.0
        assert got[1]["n_events"] == 3
        assert got[1]["last_value"] == 100.0
        assert got[1]["ewma"] == pytest.approx(s)
        assert got[1]["recency_drift"] == pytest.approx(s - (130.0 / 3))
        assert got[2]["ewma"] == 7.0 and got[2]["n_events"] == 1
        assert got[2]["recency_drift"] == pytest.approx(0.0)
