"""Streaming twin of ANN-index INGESTION (round 12 — the lifecycle's
last open edge: monitor (x2_index_staleness) -> repair
(partial_reindex) -> serve (x2_*_from_artifact) -> INGEST, this): new
embeddings stream in, each micro-batch is quantized against the LOADED
artifact's coarse centroids — the published quantizer, never a retrain
— and appended as cluster-labeled assignment DELTAS partitioned by
batch id. A serving tier reads (artifact assignments) UNION (deltas)
and is current to the last batch without any index rebuild; the
periodic partial_reindex compacts drift away.

Discipline inherited from incremental_stream / cluster_stream:

* the quantizer state (k centroid rows) is loaded ONCE at wiring,
  before ``.start()`` (a bounded collect — the allowlisted
  quantizer-state class); micro-batches run a broadcast-argmax over the
  literal centroid expression (assign_ivf_cluster, 6-dp rounded, the
  exact expression save_index used), so an appended vector gets the
  BIT-IDENTICAL cluster it would have gotten at save time — stream ==
  batch == save-time assignment by construction (pinned in
  tests/test_index_stream.py with a load-count audit and the training
  entry points monkeypatched to raise);
* deltas are written partitioned by batch_id via dynamic partition
  overwrite: an at-least-once replay recomputes the identical delta
  from the same batch and overwrites in place (idempotent); an empty
  batch writes NO batch_id partition (indistinguishable from an absent
  batch — fine for the union-read contract, same caveat as
  cluster_stream);
* per-batch work is batch-proportional: k cosines per vector, no
  corpus-side read at all.

At 100 TB: this is how a production IVF index absorbs a firehose —
assignment is embarrassingly parallel against broadcast centroids, and
the delta partitions age out into the base table at the next
partial_reindex/republish.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _assign_batch(centroids: list[list[float]], out_path: str):
    from swiftbulkuploader_spark.operators.similarity import (
        assign_ivf_cluster,
    )

    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        out = (
            batch.select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("v"),
            )
            .withColumn(
                "cluster", assign_ivf_cluster("v", centroids, round_dp=6)
            )
            .select("vec_id", "cluster")
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


def stream_index_ingest(new_stream: DataFrame, index_path: str,
                        out_path: str, checkpoint: str):
    """Wire a streaming embeddings source through the per-batch
    quantizer. Loads the artifact's centroids ONCE, here, before the
    query starts; micro-batches only assign. Returns the StreamingQuery
    (caller awaits/stops)."""
    from swiftbulkuploader_spark.operators.ann_index import load_index

    spark = new_stream.sparkSession
    centroids = load_index(spark, index_path).centroids
    return (
        new_stream.writeStream
        .foreachBatch(_assign_batch(centroids, out_path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_assignment_deltas(spark: SparkSession, out_path: str) -> DataFrame:
    """The accumulated (vec_id, cluster, batch_id) delta manifest; a
    serving tier unions this with the artifact's base assignments."""
    return spark.read.parquet(out_path)
