"""pyspark.ml LSH parity (SURVEY.md §2.9 X2 names these classes explicitly):
MinHashLSH over token sets and BucketedRandomProjectionLSH over embeddings,
both via `approxSimilarityJoin`.

The engine's native LSH (operators/dedup.py, operators/similarity.py) is the
performance path — pure Column expressions, no Vector conversion. These
wrappers exist so a user of the documented pyspark.ml API gets the same
capability with the engine's tables; seeds pinned for determinism.
Rows-only checks (hashing is estimator-specific), pinned by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swiftbulkuploader_spark.catalog import load_table
from swiftbulkuploader_spark.plans.layout import spread

SEED = 42


def ml_minhash_pairs(docs: DataFrame, threshold: float = 0.5, num_tables: int = 8) -> DataFrame:
    """Near-dup pairs via pyspark.ml MinHashLSH over hashed token sets.
    Jaccard distance <= threshold (note: ml reports DISTANCE = 1 - Jaccard)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from swiftbulkuploader_spark.functions.text import shingles

    # word 5-shingles, not bare tokens: documents drawn from a small shared
    # vocabulary have near-identical token SETS, which would pair everything
    toks = spread(docs.select("doc_id", "text")).select(
        "doc_id",
        F.array_distinct(shingles(F.col("text"), 5)).alias("tokens"),
    ).filter(F.size("tokens") > 0)
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 18, binary=True)
    feat = tf.transform(toks)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_tables, seed=SEED)
    model = lsh.fit(feat)
    joined = model.approxSimilarityJoin(feat, feat, threshold, distCol="jaccard_dist")
    return (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1 - F.col("jaccard_dist"), 6).alias("jaccard"),
        )
    )


def ml_brp_pairs(emb: DataFrame, threshold: float = 1.15, num_tables: int = 4) -> DataFrame:
    """Near vectors via BucketedRandomProjectionLSH (euclidean distance).

    Default threshold assumes unit-normalized embeddings (the driver tables
    are): random pairs sit at ~sqrt(2), so 1.15 (cos >= ~0.34) selects only
    genuinely similar vectors."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = emb.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_tables,
        bucketLength=2.0, seed=SEED,
    )
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, threshold, distCol="dist")
    return (
        joined.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.round("dist", 6).alias("euclidean"),
        )
    )


def x2_ml_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ml_minhash_pairs(docs)


def x2_ml_brp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ml_brp_pairs(emb)


# x2_ivf_kmeans_topk moved to operators/similarity.py in round 6: the
# pyspark.ml KMeans quantizer (sampled k-means|| init) forced a rows-only
# check; the native `lloyd_refined_centroids` runs the same distributed
# Lloyd's with deterministic seeding + fixed rounds, so the query is now
# fully DuckDB-oracled there.

QUERIES = {
    "x2_ml_minhash_pairs": x2_ml_minhash_pairs,
    "x2_ml_brp_pairs": x2_ml_brp_pairs,
}

ORACLES: dict[str, str] = {}  # estimator-specific hashing/init: rows-only by design
