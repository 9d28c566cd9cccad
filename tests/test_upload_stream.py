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
