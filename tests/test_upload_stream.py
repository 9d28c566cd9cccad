"""Streaming upload (foreachBatch): manifests arriving over time drive
uploads; the checkpoint makes restart resume where it stopped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from swiftbulkuploader_spark.sources.ingest import ingest_listing
from swiftbulkuploader_spark.sources.objectstore import LocalFSObjectStore, StoreFactory
from swiftbulkuploader_spark.streaming.upload_stream import stream_upload


def _make_tree(root, files):
    for name, data in files.items():
        p = root / name
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(data)


def test_incremental_manifests_upload_once(spark, tmp_path):
    src = tmp_path / "src"
    batch1 = {"a/one.txt": b"1", "a/two.txt": b"22"}
    batch2 = {"b/three.txt": b"333"}
    _make_tree(src, batch1)

    manifest_dir = str(tmp_path / "manifest")
    attempts = str(tmp_path / "attempts")
    cp = str(tmp_path / "cp")
    bucket = str(tmp_path / "bucket")
    factory = StoreFactory("localfs", root=bucket)

    # first manifest file arrives
    ingest_listing(spark, str(src)).write.mode("append").parquet(manifest_dir)
    q = stream_upload(spark, manifest_dir, factory, attempts, cp,
                      cutoff="src").trigger(availableNow=True).start()
    q.awaitTermination(120)

    store = LocalFSObjectStore(bucket)
    assert store.get("a/one.txt") == b"1"
    assert not store.exists("b/three.txt")

    # second manifest file arrives; restarted query processes ONLY it
    _make_tree(src, batch2)
    ingest_listing(spark, str(src)).filter(
        F.col("path").contains("three")
    ).write.mode("append").parquet(manifest_dir)
    q = stream_upload(spark, manifest_dir, factory, attempts, cp,
                      cutoff="src").trigger(availableNow=True).start()
    q.awaitTermination(120)

    assert store.get("b/three.txt") == b"333"
    # each file uploaded exactly once overall (checkpoint + anti-join)
    log = spark.read.parquet(attempts)
    per_key = {r["key"]: r["count"] for r in log.filter("ok").groupBy("key").count().collect()}
    assert per_key == {"a/one.txt": 1, "a/two.txt": 1, "b/three.txt": 1}


class TestStreamIntervalJoin:
    def test_matches_batch_range_join(self, spark, tmp_path):
        """The stream-stream interval join finds the same (anchor, other)
        pairs as the batch bucketed range join on identical data."""
        import datetime

        from pyspark.sql import functions as F

        from swiftbulkuploader_spark.operators.range_join import range_join_counts
        from swiftbulkuploader_spark.streaming.upload_stream import stream_interval_join

        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            (1, t0, 7, "error", 0.0, "{}"),
            (2, t0 + datetime.timedelta(minutes=3), 7, "click", 0.0, "{}"),
            (3, t0 + datetime.timedelta(minutes=6), 7, "click", 0.0, "{}"),
            (4, t0 + datetime.timedelta(minutes=1), 8, "click", 0.0, "{}"),
            (5, t0 + datetime.timedelta(minutes=4), 7, "view", 0.0, "{}"),
            (6, t0 + datetime.timedelta(minutes=30), 8, "error", 0.0, "{}"),
        ]
        schema = "event_id: long, ts: timestamp, user_id: long, event_type: string, value: double, props: string"
        batch_df = spark.createDataFrame(rows, schema)
        src = str(tmp_path / "events")
        batch_df.write.parquet(src)

        # readStream.schema takes DDL form (no colons)
        ddl = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        stream = spark.readStream.schema(ddl).parquet(src)
        joined = stream_interval_join(
            stream.filter(F.col("event_type") == "error"),
            stream.filter(F.col("event_type") != "error"),
            key="user_id", window_minutes=5,
        )
        q = (
            joined.writeStream.format("memory").queryName("sjoin")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        pairs = {(r["anchor_id"], r["other_id"])
                 for r in spark.sql("SELECT * FROM sjoin").collect()}
        assert pairs == {(1, 2), (1, 5)}  # anchor 1: within-window same-user
        # batch twin agrees on counts
        batch = {r["anchor_id"]: r["n_nearby"]
                 for r in range_join_counts(batch_df, F.col("event_type") == "error").collect()}
        assert batch == {1: 2, 6: 0}

    def test_left_outer_emits_unmatched_after_watermark(self, spark, tmp_path):
        """left_outer: an anchor with no correlated event emits null-padded
        once the watermark proves no match can arrive; matched anchors emit
        pairs as in the inner join."""
        import datetime

        from pyspark.sql import functions as F

        from swiftbulkuploader_spark.streaming.upload_stream import stream_interval_join

        import time

        t0 = datetime.datetime(2024, 1, 1)
        schema = "event_id: long, ts: timestamp, user_id: long, event_type: string, value: double, props: string"
        src = str(tmp_path / "events")
        # batch 1: the anchors; batch 2: a far-future watermark driver — the
        # unmatched anchor's null row can only emit once a LATER batch's
        # watermark proves no match can still arrive
        batches = [
            [
                (1, t0, 7, "error", 0.0, "{}"),                                # matched
                (2, t0 + datetime.timedelta(minutes=3), 7, "click", 0.0, "{}"),
                (6, t0 + datetime.timedelta(minutes=30), 8, "error", 0.0, "{}"),  # no match
            ],
            # watermark drivers on BOTH sides: the global watermark is the
            # MIN across the two stream inputs, so a click-only driver
            # leaves the error-side watermark (and anchor-6's state) frozen
            [
                (9, t0 + datetime.timedelta(hours=3), 9, "click", 0.0, "{}"),
                (11, t0 + datetime.timedelta(hours=3), 10, "error", 0.0, "{}"),
            ],
            # third batch: the null row emits one batch AFTER the watermark
            # advanced past the anchor's window (same one-batch lag as
            # test_watermark_semantics)
            [
                (10, t0 + datetime.timedelta(hours=4), 9, "click", 0.0, "{}"),
                (12, t0 + datetime.timedelta(hours=4), 10, "error", 0.0, "{}"),
            ],
        ]
        for rows in batches:
            spark.createDataFrame(rows, schema).coalesce(1) \
                .write.mode("append").parquet(src)
            time.sleep(1.1)
        ddl = schema.replace(":", "")
        stream = (
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        joined = stream_interval_join(
            stream.filter(F.col("event_type") == "error"),
            stream.filter(F.col("event_type") != "error"),
            key="user_id", window_minutes=5, how="left_outer",
        )
        q = (
            joined.writeStream.format("memory").queryName("sjoin_outer")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {(r["anchor_id"], r["other_id"])
               for r in spark.table("sjoin_outer").collect()}
        # anchors 1 and 6 are settled (watermark far past their windows):
        # 1 matched, 6 emitted null-padded exactly once; later driver
        # anchors (11/12) may or may not have settled — ignore them
        settled = {p for p in got if p[0] in (1, 6)}
        assert settled == {(1, 2), (6, None)}
