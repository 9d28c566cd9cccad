"""Trained-ANN artifact persistence (r10 verdict ask #6): save/load the
IVF quantizer as parquet TABLES so a session (or another cluster) that
never ran training serves top-k from the loaded artifact — production
serve paths load quantizers, they don't retrain them.

Artifact layout under one directory (save_index):

* ``centroids/``   (cid int, cv array<double>) — the coarse quantizer;
* ``codebooks/``   (m int, k int, cv array<double>) — the PQ codebooks
  (subspace m, entry k), persisted alongside so the compressed-serve
  path (x2_ivf_pq_topk's ADC) can also load instead of retrain;
* ``assignments/`` (vec_id long), PARTITIONED BY cluster — the
  precomputed corpus assignment. At 100 TB this is the partition-pruned
  read: probing n_probe of n_list clusters scans ~n_probe/n_list of the
  corpus because `cluster` is a physical partition column, which is
  exactly the scale story x2_ivf_topk's docstring promises.

The serve path (`serve_ivf_topk`) answers top-k FROM the artifact:
probe pick over the loaded centroid list, partition-pruned assignment
scan, exact cosine inside the probed clusters — bit-identical to
x2_ivf_topk because the assignment was computed at save time by the
same rounded-argmax expression (assign_ivf_cluster, 6 dp, higher-cid
ties) the inline query plans. The contract query
x2_ivf_topk_from_artifact shares x2_ivf_topk's DuckDB oracle verbatim;
the two-session test (tests/test_ann_index.py) pins that a session
whose training entry points are MONKEYPATCHED TO RAISE still serves
the identical rows from the loaded artifact.

Reference parity: none (ANN extension, SURVEY §2.9); the artifact
discipline mirrors the reference's resume principle — durable state on
storage, not in process memory (readme.md resume semantics).
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swiftbulkuploader_spark.catalog import load_table
from swiftbulkuploader_spark.operators.similarity import (
    N_PROBE,
    _ivf_centroids,
    _lit_vec,
    _pq_codebooks,
    _probe_pick,
    _query_vector,
    assign_ivf_cluster,
    cosine_similarity,
)

# bump when quantizer/assignment semantics change: a stale artifact from
# an older recipe must never be silently served
INDEX_FORMAT_VERSION = 1


def default_index_path(sf_dir: str) -> str:
    """Deterministic per-dataset artifact location (a scratch-dir stand-in
    for the object-store prefix a production index lives under)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    return os.path.join(
        tempfile.gettempdir(),
        f"swiftbulkuploader_ann_index_v{INDEX_FORMAT_VERSION}",
        tag,
    )


@dataclass
class AnnIndex:
    """A loaded index: bounded driver-side quantizer state + the
    distributed assignment table (never collected)."""

    centroids: list[list[float]]
    codebooks: list[list[list[float]]]
    assignments: DataFrame


def save_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    """TRAIN and persist: centroid table, PQ codebooks, and the corpus
    assignment partitioned by cluster. Overwrites any prior artifact at
    `path` (the retrain-and-republish flow)."""
    cents = _ivf_centroids(spark, sf_dir)
    books = _pq_codebooks(spark, sf_dir)
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cid int, cv array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    spark.createDataFrame(
        [
            (m, k, [float(x) for x in entry])
            for m, book in enumerate(books)
            for k, entry in enumerate(book)
        ],
        "m int, k int, cv array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "codebooks"))
    emb = load_table(spark, sf_dir, "embeddings")
    (
        emb.withColumn(
            "cluster",
            assign_ivf_cluster(
                "CAST(embedding AS ARRAY<DOUBLE>)", cents, round_dp=6
            ),
        )
        .select("vec_id", "cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(os.path.join(path, "assignments"))
    )


def load_index(spark: SparkSession, path: str) -> AnnIndex:
    """Load the artifact: two bounded collects (k centroid rows, m*k
    codebook rows — the allowlisted quantizer-state class) plus the
    assignment table as a lazy partitioned frame."""
    crows = spark.read.parquet(os.path.join(path, "centroids")) \
        .orderBy("cid").collect()
    centroids = [[float(x) for x in r["cv"]] for r in crows]
    brows = spark.read.parquet(os.path.join(path, "codebooks")) \
        .orderBy("m", "k").collect()
    n_m = max((r["m"] for r in brows), default=-1) + 1
    books: list[list[list[float]]] = [[] for _ in range(n_m)]
    for r in brows:
        books[r["m"]].append([float(x) for x in r["cv"]])
    assignments = spark.read.parquet(os.path.join(path, "assignments"))
    return AnnIndex(centroids, books, assignments)


def serve_ivf_topk(spark: SparkSession, emb: DataFrame, index: AnnIndex,
                   q: list[float], n_probe: int = N_PROBE,
                   k: int = 10) -> DataFrame:
    """Top-k from the LOADED artifact: probe pick over the centroid list,
    cluster-partition-pruned assignment scan, exact cosine inside the
    probed clusters — the x2_ivf_topk result without any training."""
    probe = _probe_pick(spark, index.centroids, q, n_probe)
    hits = index.assignments.filter(
        F.col("cluster").isin(probe)
    ).select("vec_id")
    qcol = _lit_vec(q)
    return (
        emb.join(hits, "vec_id")
        .select(
            "vec_id",
            F.round(
                cosine_similarity(
                    F.col("embedding").cast("array<double>"), qcol
                ),
                6,
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def x2_ivf_topk_from_artifact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x2_ivf_topk answered FROM the persisted index artifact: train+save
    once per dataset location (idempotent republish if the artifact is
    missing), then load and serve — the contract-level proof that the
    serve path needs only the artifact tables. Shares x2_ivf_topk's
    oracle verbatim; the two-session independence (serve with training
    entry points disabled) is pinned in tests/test_ann_index.py."""
    path = default_index_path(sf_dir)
    from swiftbulkuploader_spark.streaming.state_io import state_path_exists

    if not state_path_exists(spark, os.path.join(path, "assignments")):
        save_index(spark, sf_dir, path)
    index = load_index(spark, path)
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    return serve_ivf_topk(spark, emb, index, q)


QUERIES = {
    "x2_ivf_topk_from_artifact": x2_ivf_topk_from_artifact,
}

# identical semantics, identical oracle: the artifact serve path must
# reproduce the inline IVF query bit-for-bit
from swiftbulkuploader_spark.operators.similarity import (  # noqa: E402
    ORACLES as _SIM_ORACLES,
)

ORACLES = {
    "x2_ivf_topk_from_artifact": _SIM_ORACLES["x2_ivf_topk"],
}
