"""Connected components over the near-dup pair graph — dedup clustering.

MinHash/SimHash emit PAIRS; dedup needs CLUSTERS (transitive closure: if
A~B and B~C, {A,B,C} dedup together and one canonical doc survives).

Algorithm: distributed min-label propagation. Every node starts labeled
with itself; each round every node takes the minimum label among itself and
its neighbors; converged when no label changes. Each round is one shuffle
join + one aggregation, fully distributed — no driver-side union-find, which
is the difference between deduping 10^5 and 10^9 documents.

Round count is O(graph diameter). Near-dup clusters are dense (diameter 2-3
in practice), so propagation converges in a handful of rounds; for
adversarially long chains the alternating large-star/small-star algorithm
(Kiveris et al., SoCC'14) gets O(log n) rounds at the cost of a trickier
invariant — the labels table and loop below are the place to swap it in.

Two Spark essentials for ANY iterative DataFrame algorithm, both applied
here:
* `localCheckpoint(eager=True)` per round — truncates lineage; without it
  each round's plan embeds all previous rounds and planning time explodes
  exponentially.
* convergence via a cheap aggregate (sum of label changes), not a
  DataFrame diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iter: int = 25,
                         check_every: int = 2) -> DataFrame:
    """edges (a: long, b: long) -> (node: long, component: long), where
    component = min node id in the connected component.

    Convergence is probed every ``check_every`` rounds, not every round, and
    only the probe round is materialized: ``check_every`` propagation rounds
    accumulate as lineage over the two checkpointed inputs (2 joins + 1 agg
    per round — shallow enough to plan), then ONE ``localCheckpoint`` cuts
    the lineage and a cheap aggregate over the already-materialized frame
    probes for changes. Per ``check_every`` rounds that is 1 materialization
    job + 1 probe job, versus ``check_every`` + 1 before. Correctness does
    not depend on the cadence: labels are monotone non-increasing, so any
    round with zero changes means a fixed point was reached.

    The input edge frame is checkpointed BEFORE the symmetrize union:
    ``e.union(e.swap)`` references ``e`` twice, and Spark does not
    common-subexpression-eliminate across union branches — without the
    checkpoint, an expensive upstream pair pipeline (MinHash band join +
    verify) would execute twice inside the first job."""
    e = (
        edges.selectExpr("a", "b")
        .filter(F.col("a") != F.col("b"))
        .localCheckpoint(eager=True)
    )
    sym = e.union(e.selectExpr("b AS a", "a AS b")).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    def propagate(lbl: DataFrame) -> DataFrame:
        # each node's best neighbor label this round
        nbr = (
            sym.join(lbl.select(F.col("node").alias("b"), "label"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("a", "node")
        )
        return lbl.join(nbr, "node", "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
            (F.col("nbr_label") < F.col("label")).cast("int").alias("changed"),
        )

    done = 0
    while done < max_iter:
        burst = min(check_every, max_iter - done)
        cur = labels
        for _ in range(burst):
            cur = propagate(cur.select("node", "label"))
        done += burst
        cur = cur.localCheckpoint(eager=True)
        labels = cur.select("node", "label")
        # `changed` of the LAST round in the burst: zero means fixed point
        # (monotone labels), regardless of what earlier rounds did.
        n_changed = cur.agg(F.sum("changed")).first()[0] or 0
        if n_changed == 0:
            break

    return labels.select("node", F.col("label").alias("component"))


def dedup_clusters(pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b") -> DataFrame:
    """Near-dup pairs -> (doc_id, cluster_id, is_survivor): transitive
    closure + keep the minimum id per cluster."""
    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    comp = connected_components(edges)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_survivor"),
    )


def x1_dup_clusters(spark, sf_dir: str) -> DataFrame:
    """Contract query: MinHash near-dup pairs -> connected components ->
    per-cluster summary (cluster_id = min doc_id, member count, survivor).

    The full dedup story end-to-end: LSH banding emits PAIRS, label
    propagation closes them transitively into CLUSTERS, and one survivor
    per cluster is kept — what a pretraining dedup pass actually deletes
    against. cluster_id = min(doc_id) is the closure invariant (connected
    components labels each component with its minimum node); survivor_id is
    a POLICY choice layered on top — keep the longest document (n_chars,
    ties to the smaller id), the "keep best, not keep first" rule a real
    dedup pass wants. Rows-only check (the pair set is hash-seed-specific);
    the closure semantics are pinned by tests/test_components.py on crafted
    corpora with known chain structure."""
    from swiftbulkuploader_spark.catalog import load_table
    from swiftbulkuploader_spark.operators.dedup import (
        exact_jaccard,
        minhash_candidates,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs)
    cands = minhash_candidates(sigs, min_est=0.25)
    pairs = exact_jaccard(cands, sigs).filter(F.col("jaccard") >= 0.5)
    clusters = dedup_clusters(pairs).join(docs.select("doc_id", "n_chars"), "doc_id")
    return (
        clusters.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.max_by(
                "doc_id", F.struct(F.col("n_chars"), -F.col("doc_id"))
            ).alias("survivor_id"),
        )
        .orderBy("cluster_id")
    )


QUERIES = {
    "x1_dup_clusters": x1_dup_clusters,
}

# rows-only by design: the pair graph depends on seeded xxhash64 minhashes,
# which DuckDB cannot reproduce; closure correctness is unit-pinned instead.
ORACLES: dict[str, str] = {}
