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

    def test_streamed_delta_serves_identical_topk(self, spark, tmp_path,
                                                  monkeypatch):
        """r12 verdict ask #5: the ingest-loop close proven under a REAL
        micro-batch — x2_ann_delta_serve's deterministic recrawl batch is
        streamed through stream_index_ingest (foreachBatch quantization
        against the loaded artifact), and the serve read shape
        ((artifact base assignments) UNION (streamed deltas) -> probe
        prune -> exact cosine) must produce the IDENTICAL top-k to the
        batch contract query, with every training entry point
        monkeypatched to raise."""
        from swiftbulkuploader_spark.catalog import load_table
        from swiftbulkuploader_spark.operators import ann_index, similarity
        from swiftbulkuploader_spark.operators.ann_index import (
            DELTA_ID_OFFSET,
        )
        from swiftbulkuploader_spark.operators.similarity import (
            N_PROBE,
            _lit_vec,
            _probe_pick,
            _query_vector,
            cosine_similarity,
        )
        from swiftbulkuploader_spark.streaming.index_stream import (
            read_assignment_deltas,
            stream_index_ingest,
        )

        index_path = str(tmp_path / "index")
        ann_index.save_index(spark, SF, index_path)
        # capture the contract result BEFORE disabling training (it
        # trains its centroids inline — same Lloyd memo the save used)
        want = [
            (r["vec_id"], r["is_delta"], r["cos_sim"])
            for r in ann_index.x2_ann_delta_serve(spark, SF).collect()
        ]
        q_vec = _query_vector(spark, SF, 0)

        emb = load_table(spark, SF, "embeddings")
        delta_src = str(tmp_path / "recrawl")
        emb.filter(F.col("vec_id") % 17 == 0).select(
            (F.col("vec_id") + DELTA_ID_OFFSET).alias("vec_id"),
            "embedding",
        ).coalesce(1).write.mode("append").parquet(delta_src)

        def forbidden(*a, **kw):
            raise AssertionError("serve path invoked a training function")

        monkeypatch.setattr(similarity, "_ivf_centroids", forbidden)
        monkeypatch.setattr(ann_index, "_ivf_centroids", forbidden)
        monkeypatch.setattr(ann_index, "save_index", forbidden)

        stream = spark.readStream.schema(EMB_SCHEMA).parquet(delta_src)
        out = str(tmp_path / "deltas")
        q = stream_index_ingest(stream, index_path, out,
                                str(tmp_path / "cp2"))
        finished = q.awaitTermination(120)
        if not finished:
            q.stop()
            raise AssertionError("availableNow stream hung past 120 s")

        # the serve read shape: base assignments from the artifact,
        # delta assignments from the STREAM's output, one union
        idx = ann_index.load_index(spark, index_path)
        assign = idx.assignments.select("vec_id", "cluster").unionByName(
            read_assignment_deltas(spark, out).select("vec_id", "cluster")
        )
        base_v = emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        corpus = base_v.unionByName(
            base_v.filter(F.col("vec_id") % 17 == 0).select(
                (F.col("vec_id") + DELTA_ID_OFFSET).alias("vec_id"), "v"
            )
        )
        probe = _probe_pick(spark, idx.centroids, q_vec, N_PROBE)
        got_df = (
            corpus.join(assign, "vec_id")
            .filter(F.col("cluster").isin(probe))
            .select(
                "vec_id",
                (F.col("vec_id") >= DELTA_ID_OFFSET).alias("is_delta"),
                F.round(
                    cosine_similarity(F.col("v"), _lit_vec(q_vec)), 6
                ).alias("cos_sim"),
            )
            .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
            .limit(10)
        )
        got = [(r["vec_id"], r["is_delta"], r["cos_sim"])
               for r in got_df.collect()]
        assert got == want
        assert {d for _, d, _ in got} == {True, False}  # both sources
