"""Streaming twin of x10_integrity_manifest (round 13): the integrity
manifest maintained INCREMENTALLY under a real micro-batch stream —
the property the batch query only claims (checksums are additive, so
partials merge) proven under Structured Streaming's replay semantics.

Each micro-batch folds its documents to per-shard PARTIALS (count,
bytes, checksum-sum) via the SAME per-row derivation the batch
manifest uses (training_prep.integrity_base — stream == batch by
construction, not by re-implementation), written partitioned by
batch_id with dynamic partition overwrite: an at-least-once replay
recomputes the identical partial from the same batch and overwrites in
place (idempotent — the index_stream/cluster_stream discipline). The
serving read merges partials by ONE rollup (sum of sums), yielding the
exact schema and values of the batch x10_integrity_manifest on the
union of all batches.

At 100 TB: per-batch work is batch-proportional (a scan plus an 8-key
partial agg — no corpus-side read), and the read-side merge folds
(n_batches x n_shards) tiny rows. Ingest never rewrites history;
corruption detection stays current to the last micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swiftbulkuploader_spark.operators.training_prep import (
    INTEGRITY_SHARDS,
    integrity_base,
)


def _partials_batch(n_shards: int, out_path: str):
    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        out = (
            integrity_base(batch, n_shards)
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_bytes").cast("long").alias("n_bytes"),
                F.sum(F.col("row_hash").cast("decimal(38,0)"))
                .cast("decimal(38,0)").alias("checksum_part"),
            )
            .withColumn("batch_id", F.lit(batch_id))
        )
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        try:
            out.write.partitionBy("batch_id").mode("overwrite").parquet(
                out_path
            )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )

    return fn


def stream_integrity_ingest(doc_stream: DataFrame, out_path: str,
                            checkpoint: str,
                            n_shards: int = INTEGRITY_SHARDS):
    """Wire a streaming documents source through the per-batch partial
    fold. Returns the StreamingQuery (caller awaits/stops)."""
    return (
        doc_stream.writeStream
        .foreachBatch(_partials_batch(n_shards, out_path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_integrity_manifest(spark: SparkSession,
                            out_path: str) -> DataFrame:
    """Merge the accumulated per-batch partials into the manifest —
    bit-identical schema and values to x10_integrity_manifest over the
    union of all streamed batches (sums of sums; the additive-combine
    property IS the manifest's design)."""
    return (
        spark.read.parquet(out_path)
        .rollup("shard")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_bytes").cast("long").alias("n_bytes"),
            F.sum("checksum_part").cast("decimal(38,0)")
            .cast("string").alias("checksum"),
        )
        .select(
            F.coalesce(F.col("shard"), F.lit(-1)).alias("shard"),
            "n_docs", "n_bytes", "checksum",
        )
        .orderBy("shard")
    )
