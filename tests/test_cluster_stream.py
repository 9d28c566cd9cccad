"""Streaming dup-cluster maintenance invariants (r10 verdict ask #4 —
the incremental_stream discipline applied to graph state): stream ==
batch == from-scratch closure across a 2-batch split, frozen labels
closed exactly once (derivation-count audit), per-batch deltas
batch-proportional, replay idempotent, empty batch an identity.
Files are written SEQUENTIALLY (CLAUDE.md rule 9)."""

from __future__ import annotations

from pyspark.sql import functions as F

EDGE_SCHEMA = "a: long, b: long"

# frozen graph: cluster {1,2,3}, cluster {10,11}, isolated node 20
FROZEN_EDGES = [(1, 2), (2, 3), (10, 11)]
FROZEN_NODES = [(n,) for n in (1, 2, 3, 10, 11, 20)]

# batch 1: new doc 100 joins cluster 1; new pair {101,102}
BATCH1 = [(100, 2), (101, 102)]
# batch 2: new doc 103 BRIDGES clusters {1..} and {10,11} — the
# cross-cluster merge that relabels frozen rows
BATCH2 = [(103, 10), (103, 1)]

EXPECTED = {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 100: 1, 103: 1,
            101: 101, 102: 101, 20: 20}


def _labels(df):
    return {r["node"]: r["cluster_id"] for r in df.collect()}


class TestClusterStreamTwin:
    def test_stream_equals_from_scratch_and_audit(self, spark, tmp_path,
                                                  monkeypatch):
        from swiftbulkuploader_spark.operators import components
        from swiftbulkuploader_spark.streaming.cluster_stream import (
            current_labels,
            prepare_frozen_labels,
            stream_cluster_maintenance,
        )

        # derivation-count audit: connected_components must close the
        # FROZEN graph once (at prepare, before .start()) and then only
        # the batch-sized contracted graphs — 1 + n_batches calls total
        calls = {"cc": 0}
        real_cc = components.connected_components

        def counted(*a, **kw):
            calls["cc"] += 1
            return real_cc(*a, **kw)

        monkeypatch.setattr(components, "connected_components", counted)

        frozen = prepare_frozen_labels(
            spark.createDataFrame(FROZEN_EDGES, EDGE_SCHEMA),
            spark.createDataFrame(FROZEN_NODES, "node: long"),
        )
        assert calls["cc"] == 1

        src = str(tmp_path / "edges")
        spark.createDataFrame(BATCH1, EDGE_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
        spark.createDataFrame(BATCH2, EDGE_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(EDGE_SCHEMA.replace(":", ""))
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        delta = str(tmp_path / "labels")
        q = stream_cluster_maintenance(stream, frozen, delta,
                                       str(tmp_path / "cp"))
        finished = q.awaitTermination(120)
        if not finished:
            q.stop()
            raise AssertionError("availableNow stream hung past 120 s")

        # frozen closed once + one contracted closure per micro-batch
        assert calls["cc"] == 3, calls

        got = _labels(current_labels(spark, frozen, delta))
        assert got == EXPECTED

        # from-scratch closure of the union graph agrees (the oracle
        # argument: incremental == recompute)
        union_edges = spark.createDataFrame(
            FROZEN_EDGES + BATCH1 + BATCH2, EDGE_SCHEMA
        )
        scratch = real_cc(union_edges).select(
            "node", F.col("component").alias("cluster_id")
        )
        scratch_map = _labels(scratch)
        scratch_map[20] = 20  # isolated frozen node, singleton by contract
        assert scratch_map == EXPECTED

        # batch-proportional deltas: each partition holds ONLY the
        # changed/new nodes of its batch
        raw = spark.read.parquet(delta)
        b0 = _labels(raw.filter("batch_id = 0"))
        b1 = _labels(raw.filter("batch_id = 1"))
        assert b0 == {100: 1, 101: 101, 102: 101}
        assert b1 == {103: 1, 10: 1, 11: 1}   # the cross-cluster merge

    def test_replay_idempotent_and_empty_batch_identity(self, spark,
                                                        tmp_path):
        from swiftbulkuploader_spark.streaming.cluster_stream import (
            _merge_batch,
            current_labels,
            prepare_frozen_labels,
        )

        frozen = prepare_frozen_labels(
            spark.createDataFrame(FROZEN_EDGES, EDGE_SCHEMA),
            spark.createDataFrame(FROZEN_NODES, "node: long"),
        )
        delta = str(tmp_path / "labels")
        fn = _merge_batch(frozen, delta)
        fn(spark.createDataFrame(BATCH1, EDGE_SCHEMA), 0)
        fn(spark.createDataFrame(BATCH2, EDGE_SCHEMA), 1)
        once = _labels(current_labels(spark, frozen, delta))
        assert once == EXPECTED

        # at-least-once replay: same frozen prefix -> identical rows
        fn(spark.createDataFrame(BATCH2, EDGE_SCHEMA), 1)
        assert _labels(current_labels(spark, frozen, delta)) == once

        # empty batch: labels unchanged, delta partition empty
        fn(spark.createDataFrame([], EDGE_SCHEMA), 2)
        assert _labels(current_labels(spark, frozen, delta)) == once
        raw = spark.read.parquet(delta)
        assert raw.filter("batch_id = 2").count() == 0

    def test_compaction_preserves_labels_and_restarts_clean(self, spark,
                                                            tmp_path):
        """compact_labels folds frozen + deltas into a new frozen
        snapshot that (a) equals the live labeling exactly and (b) works
        as the frozen frame of a RESTARTED stream — the maintenance job
        that keeps the per-batch prefix read bounded."""
        from swiftbulkuploader_spark.streaming.cluster_stream import (
            _merge_batch,
            compact_labels,
            current_labels,
            prepare_frozen_labels,
        )

        frozen = prepare_frozen_labels(
            spark.createDataFrame(FROZEN_EDGES, EDGE_SCHEMA),
            spark.createDataFrame(FROZEN_NODES, "node: long"),
        )
        delta = str(tmp_path / "labels")
        fn = _merge_batch(frozen, delta)
        fn(spark.createDataFrame(BATCH1, EDGE_SCHEMA), 0)
        fn(spark.createDataFrame(BATCH2, EDGE_SCHEMA), 1)

        snap = compact_labels(spark, frozen, delta,
                              str(tmp_path / "snapshot"))
        assert {r["node"]: r["label"] for r in snap.collect()} == EXPECTED

        # restart against the snapshot with an empty delta dir: a new
        # batch merging node 200 into the big cluster behaves exactly
        # as it would have against the live state
        delta2 = str(tmp_path / "labels2")
        fn2 = _merge_batch(snap.persist(), delta2)
        fn2(spark.createDataFrame([(200, 11)], EDGE_SCHEMA), 0)
        got = {
            r["node"]: r["cluster_id"]
            for r in current_labels(spark, snap, delta2).collect()
        }
        assert got == {**EXPECTED, 200: 1}
