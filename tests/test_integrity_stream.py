"""Stream == batch for the integrity manifest: partials maintained per
micro-batch merge to the EXACT batch-query manifest, and an
at-least-once replay of a batch is idempotent. Files are written
SEQUENTIALLY (CLAUDE.md rule 9: the file source orders by modification
time)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
DOC_SCHEMA = "doc_id long, text string"


def _manifest_dict(df):
    return {r["shard"]: (r["n_docs"], r["n_bytes"], r["checksum"])
            for r in df.collect()}


class TestIntegrityStream:
    def test_stream_equals_batch_and_replay_idempotent(self, spark,
                                                       tmp_path):
        from swiftbulkuploader_spark.catalog import load_table
        from swiftbulkuploader_spark.operators.training_prep import (
            integrity_manifest_from_docs,
        )
        from swiftbulkuploader_spark.streaming.integrity_stream import (
            _partials_batch,
            read_integrity_manifest,
            stream_integrity_ingest,
        )

        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        batch_expected = _manifest_dict(integrity_manifest_from_docs(docs))

        # two micro-batches partitioned by doc_id parity, written
        # sequentially so the file source sees them in order
        src = str(tmp_path / "doc_batches")
        b1 = [(r["doc_id"], r["text"])
              for r in docs.filter("doc_id % 2 = 0").collect()]
        b2 = [(r["doc_id"], r["text"])
              for r in docs.filter("doc_id % 2 = 1").collect()]
        spark.createDataFrame(b1, DOC_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
        spark.createDataFrame(b2, DOC_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)

        out = str(tmp_path / "partials")
        ckpt = str(tmp_path / "ckpt")
        stream = stream_integrity_ingest(
            spark.readStream.schema(DOC_SCHEMA).option(
                "maxFilesPerTrigger", 1
            ).parquet(src),
            out, ckpt,
        )
        stream.awaitTermination(120)

        streamed = _manifest_dict(read_integrity_manifest(spark, out))
        assert streamed == batch_expected

        # at-least-once replay: re-running batch 0's fold with the same
        # batch_id overwrites its own partition — manifest unchanged
        replay = spark.createDataFrame(b1, DOC_SCHEMA)
        _partials_batch(8, out)(replay, 0)
        assert _manifest_dict(
            read_integrity_manifest(spark, out)
        ) == batch_expected

        # partials are per-batch-proportional bookkeeping: one row per
        # (batch, populated shard), never a corpus-side rewrite
        partials = spark.read.parquet(out)
        assert partials.count() <= 2 * 8
        assert set(
            r["batch_id"] for r in partials.select("batch_id")
            .distinct().collect()
        ) == {0, 1}
