"""Observability (S9/A7/A8): observe() counters, progress format, batch and
Structured-Streaming rate windows.
"""

from __future__ import annotations

import datetime

from swiftbulkuploader_spark.plans.upload import ATTEMPTS_SCHEMA
from swiftbulkuploader_spark.streaming.progress import (
    observed,
    progress_line,
    rate_over_window,
    stream_rate,
)


def _attempts(spark, rows):
    return spark.createDataFrame(rows, ATTEMPTS_SCHEMA)


def _ts(s: int):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


ROWS = [
    (1, "/a", "a", _ts(0), 1, True, None),
    (2, "/b", "b", _ts(1), 1, True, None),
    (3, "/c", "c", _ts(2), 1, False, "boom"),
    (3, "/c", "c", _ts(3), 2, True, None),
    (4, "/d", "d", _ts(7), 1, True, None),
]


class TestObserve:
    def test_counters_from_job_side_effect(self, spark):
        df, obs = observed(_attempts(spark, ROWS))
        df.write.format("noop").mode("overwrite").save()
        got = obs.get
        assert got == {"n_attempts": 5, "n_ok": 4, "n_failed": 1}

    def test_progress_line_format(self):
        # the reference's 8-decimal % (bulkupload.py:323-331)
        assert progress_line(1, 3) == "1/3 files uploaded. 33.33333333%"
        assert progress_line(0, 0) == "0/0 files uploaded. 100.00000000%"


class TestRateWindows:
    def test_batch_window_counts(self, spark):
        out = {r["window_start"].second: (r["n_ok"], r["rate_per_s"])
               for r in rate_over_window(_attempts(spark, ROWS), "5 seconds").collect()}
        assert out[0] == (3, 0.6)   # 3 successes in [0,5)
        assert out[5] == (1, 0.2)   # 1 success in [5,10)

    def test_stream_equals_batch(self, spark, tmp_path):
        """availableNow streaming over the same attempts produces the same
        windows as the batch aggregation (exactly-once, checkpointed)."""
        attempts_dir = str(tmp_path / "attempts")
        _attempts(spark, ROWS).write.parquet(attempts_dir)
        q = (
            stream_rate(spark, attempts_dir, window="5 seconds")
            .writeStream.format("memory").queryName("rates")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = {r["window_start"].second: (r["n_ok"], r["rate_per_s"])
               for r in spark.sql("SELECT * FROM rates").collect()}
        assert got == {0: (3, 0.6), 5: (1, 0.2)}


class TestStreamStaticJoin:
    def test_attempt_stream_enriched_with_manifest_dim(self, spark, tmp_path):
        """Stream-static join: the attempt stream enriched with the (static)
        manifest — per-micro-batch hash join against the dim, no state."""
        import pyspark.sql.functions as F

        manifest = spark.createDataFrame(
            [(1, "/a", 100), (2, "/b", 2000), (3, "/c", 30)],
            "id: long, path: string, size: long",
        )
        attempts_dir = str(tmp_path / "att")
        _attempts(spark, ROWS).write.parquet(attempts_dir)
        stream = spark.readStream.schema(ATTEMPTS_SCHEMA).parquet(attempts_dir)
        enriched = stream.join(F.broadcast(manifest.withColumnRenamed("path", "mpath")), "id")
        q = (
            enriched.select("id", "ok", "size")
            .writeStream.format("memory").queryName("enriched")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "cp2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = spark.sql("SELECT * FROM enriched").collect()
        assert len(got) == 4  # id=4 has no manifest row -> dropped by inner join
        assert {r["id"] for r in got} == {1, 2, 3}
        assert all(r["size"] in (100, 2000, 30) for r in got)


class TestStreamBatchParityAtScale:
    def test_append_mode_stream_matches_batch_at_sf01(self, spark, tmp_path):
        """Stream==batch rate parity at DATA scale (150k attempts derived
        from the sf0.1 orders table), in APPEND mode across multiple
        micro-batches — the configuration where watermark semantics can
        actually diverge (complete mode never finalizes windows, one batch
        never advances the watermark mid-stream).

        Files are range-partitioned by ts and fed one per trigger, so the
        watermark advances between batches; every window the stream emits
        must match the batch aggregation exactly, and every window whose
        end precedes the final watermark must have been emitted."""
        import pyspark.sql.functions as F

        from swiftbulkuploader_spark.catalog import load_table

        base = 1_704_067_200  # 2024-01-01 00:00:00 UTC
        attempts = load_table(spark, "/root/testdata/sf0.1", "orders").select(
            F.col("o_orderkey").alias("id"),
            F.concat(F.lit("/f/"), F.col("o_orderkey")).alias("path"),
            F.concat(F.lit("k/"), F.col("o_orderkey")).alias("key"),
            F.timestamp_seconds(
                F.lit(base) + F.pmod(F.xxhash64("o_orderkey"), F.lit(3600))
            ).alias("ts"),
            F.lit(1).alias("try_no"),
            (F.col("o_orderkey") % 10 != 0).alias("ok"),
            F.lit(None).cast("string").alias("error"),
        )
        attempts_dir = str(tmp_path / "attempts")
        # 6 time-ordered files -> 6 micro-batches; rows within a file stay
        # unsorted, exercising in-batch disorder under the 30 s watermark.
        # The file source orders by MODIFICATION time, so the slices are
        # written sequentially (one job each, mtime strictly increasing) —
        # a single range-partitioned write leaves tie-broken mtimes and a
        # later slice read first would poison the watermark.
        import time as _time

        sec = F.pmod(F.xxhash64("o_orderkey"), F.lit(3600))
        for slice_no in range(6):
            attempts.filter(
                (sec >= slice_no * 600) & (sec < (slice_no + 1) * 600)
            ).coalesce(1).write.mode("append").parquet(attempts_dir)
            _time.sleep(0.3)

        batch = {
            r["window_start"]: (r["n_ok"], r["rate_per_s"])
            for r in rate_over_window(
                spark.read.parquet(attempts_dir), "60 seconds"
            ).collect()
        }

        stream = (
            spark.readStream.schema(ATTEMPTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(attempts_dir)
            .withWatermark("ts", "30 seconds")
        )
        import pyspark.sql.functions as F2

        dur = F2.unix_timestamp(F2.col("w.end")) - F2.unix_timestamp(F2.col("w.start"))
        agg = (
            stream.filter(F2.col("ok"))
            .groupBy(F2.window("ts", "60 seconds").alias("w"))
            .agg(F2.count("*").alias("n_ok"))
            .select(
                F2.col("w.start").alias("window_start"),
                "n_ok",
                F2.round(F2.col("n_ok") / dur.cast("double"), 4).alias("rate_per_s"),
            )
        )
        q = (
            agg.writeStream.format("memory").queryName("rates_sf01")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = {
            r["window_start"]: (r["n_ok"], r["rate_per_s"])
            for r in spark.sql("SELECT * FROM rates_sf01").collect()
        }

        # every emitted window agrees with batch exactly
        assert streamed, "append-mode stream emitted nothing"
        for ws, v in streamed.items():
            assert batch[ws] == v, (ws, v, batch[ws])
        # completeness: windows closed by the final watermark were emitted
        # (availableNow ends the query, so trailing windows may be unflushed)
        import datetime as _dt

        max_ts = _dt.datetime(2024, 1, 1, 0, 59, 59)
        final_wm = max_ts - _dt.timedelta(seconds=30)
        closed = {ws for ws in batch
                  if ws + _dt.timedelta(seconds=60) <= final_wm}
        assert closed <= set(streamed), sorted(closed - set(streamed))
        assert len(streamed) >= len(closed) >= 50


class TestRateSourceSmoke:
    def test_rate_source_progress_and_windows(self, spark, tmp_path):
        """A8's streaming mapping pinned WITHOUT filesystem mtime coupling
        (the file-source watermark trap, CLAUDE.md): the built-in `rate`
        source drives the shared window aggregation; trigger progress must
        report processedRowsPerSecond/numInputRows, and every emitted
        window must satisfy the rate contract rate_per_s = n_ok / 1s."""
        import time as _t

        from swiftbulkuploader_spark.streaming.progress import (
            stream_rate_from_rate_source,
        )

        q = (
            stream_rate_from_rate_source(spark, rows_per_second=50)
            .writeStream.format("memory").queryName("rate_src_rates")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .start()
        )
        try:
            deadline = _t.time() + 60
            # wait until the engine has processed real input (>= 2 batches
            # with rows) — no sleep-and-hope on a loaded box
            done: list = []  # bound even if the deadline is already past
            while _t.time() < deadline:
                done = [p for p in q.recentProgress
                        if p["numInputRows"] > 0]
                if len(done) >= 2:
                    break
                _t.sleep(0.5)
            assert len(done) >= 2, "rate source produced no batches in 60s"
            # the A8 streaming counters exist and are sane
            assert all(p["processedRowsPerSecond"] >= 0 for p in done)
            assert sum(p["numInputRows"] for p in done) > 0
        finally:
            q.stop()
        rows = spark.sql("SELECT * FROM rate_src_rates").collect()
        assert rows, "no windows emitted"
        # window contract: 1-second tumbling windows, rate = count / 1s,
        # and no window can exceed the configured source rate
        assert all(r["rate_per_s"] == float(r["n_ok"]) for r in rows)
        assert max(r["n_ok"] for r in rows) <= 50
