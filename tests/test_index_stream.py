"""Stream == batch == save-time for ANN index ingestion: new embeddings
quantized per micro-batch against the LOADED artifact must get the
bit-identical cluster the batch save path assigns, the artifact is
loaded exactly once per stream (derivation audit), no training entry
point runs, and a replayed batch overwrites its own delta partition
(idempotent). Files are written SEQUENTIALLY (CLAUDE.md rule 9: the
file source orders by modification time)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
EMB_SCHEMA = "vec_id long, embedding array<float>"


def _deltas(df):
    return {r["vec_id"]: (r["cluster"], r["batch_id"])
            for r in df.collect()}


class TestIndexIngestStream:
    def test_stream_equals_batch_and_replay_idempotent(self, spark,
                                                       tmp_path,
                                                       monkeypatch):
        from swiftbulkuploader_spark.catalog import load_table
        from swiftbulkuploader_spark.operators import ann_index, similarity
        from swiftbulkuploader_spark.operators.similarity import (
            assign_ivf_cluster,
        )
        from swiftbulkuploader_spark.streaming.index_stream import (
            _assign_batch,
            read_assignment_deltas,
            stream_index_ingest,
        )

        index_path = str(tmp_path / "index")
        ann_index.save_index(spark, SF, index_path)
        centroids = ann_index.load_index(spark, index_path).centroids

        # "new" embeddings: existing vectors re-keyed + dim-rolled so
        # they are genuinely unseen but deterministic
        emb = load_table(spark, SF, "embeddings")
        new = emb.limit(8).select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.concat(
                F.slice(F.col("embedding"), 2, 63),
                F.slice(F.col("embedding"), 1, 1),
            ).cast("array<float>").alias("embedding"),
        ).collect()
        b1 = [(r["vec_id"], r["embedding"]) for r in new[:4]]
        b2 = [(r["vec_id"], r["embedding"]) for r in new[4:]]

        src = str(tmp_path / "new_embeddings")
        spark.createDataFrame(b1, EMB_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
        spark.createDataFrame(b2, EMB_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)

        # audit: the artifact loads ONCE at wiring; training never runs
        loads = {"n": 0}
        real_load = ann_index.load_index

        def counting_load(*a, **kw):
            loads["n"] += 1
            return real_load(*a, **kw)

        def forbidden(*a, **kw):
            raise AssertionError("ingest path invoked a training function")

        import swiftbulkuploader_spark.streaming.index_stream as ixs
        monkeypatch.setattr(
            ann_index, "load_index", counting_load
        )
        monkeypatch.setattr(similarity, "_ivf_centroids", forbidden)
        monkeypatch.setattr(ann_index, "_ivf_centroids", forbidden)
        monkeypatch.setattr(ann_index, "save_index", forbidden)
        assert ixs is not None  # module import sanity

        stream = (
            spark.readStream.schema(EMB_SCHEMA.replace(":", ""))
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = str(tmp_path / "deltas")
        q = stream_index_ingest(stream, index_path, out,
                                str(tmp_path / "cp"))
        finished = q.awaitTermination(120)
        if not finished:
            q.stop()
            raise AssertionError("availableNow stream hung past 120 s")

        streamed = read_assignment_deltas(spark, out)
        assert streamed.select("batch_id").distinct().count() == 2
        assert loads["n"] == 1  # loaded once, at wiring

        # batch twin: one-shot assignment of the union with the same
        # loaded centroids must agree exactly
        batch = (
            spark.createDataFrame(b1 + b2, EMB_SCHEMA)
            .select("vec_id",
                    F.col("embedding").cast("array<double>").alias("v"))
            .withColumn(
                "cluster", assign_ivf_cluster("v", centroids, round_dp=6)
            )
        )
        got = {r["vec_id"]: r["cluster"] for r in streamed.collect()}
        want = {r["vec_id"]: r["cluster"] for r in batch.collect()}
        assert got == want
        # every new vector assigned to a saved cluster
        assert set(got.values()) <= set(range(len(centroids)))

        # replay idempotence: re-running batch 0's body overwrites its
        # own partition; the manifest is unchanged
        before = sorted(_deltas(streamed).items())
        _assign_batch(centroids, out)(
            spark.createDataFrame(b1, EMB_SCHEMA), 0
        )
        after = sorted(_deltas(read_assignment_deltas(spark, out)).items())
        assert after == before
