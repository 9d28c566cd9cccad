"""Streaming upload: a growing manifest directory drives uploads continuously
(SURVEY.md §2.7 — checkpoint/resume as a Structured Streaming query).

The batch pipeline answers "upload what's pending now"; this answers the
operational shape the reference actually ran in ("keep uploading as indexing
discovers files"). `foreachBatch` reuses the exact batch upload stage per
micro-batch, so semantics (per-partition store, bounded retries, attempt
rows) are identical; the checkpoint replaces the reference's durable
`uploaded` flag for restart (readme.md:42) — a restarted query resumes from
the last committed micro-batch without re-reading earlier manifest files.

Inside each micro-batch we still anti-join against the attempt log: the
checkpoint dedupes *input files*, the anti-join dedupes *rows* (e.g. the same
path re-listed in a later manifest file), keeping at-least-once + idempotent
keys end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from swiftbulkuploader_spark.sources.objectstore import StoreFactory

MANIFEST_STREAM_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("path", T.StringType()),
    T.StructField("size", T.LongType()),
    T.StructField("mtime", T.TimestampType()),
    T.StructField("uploaded", T.BooleanType()),
    T.StructField("error", T.StringType()),
])


def stream_upload(spark: SparkSession, manifest_dir: str, store_factory: StoreFactory,
                  attempts_path: str, checkpoint_dir: str, cutoff: str = "",
                  max_attempts: int = 5, parallelism: int | None = None):
    """Start (unstarted) a streaming query: manifest parquet dir -> uploads ->
    attempt-log parquet. Returns the DataStreamWriter; call .start()."""
    from pyspark.sql import functions as F

    from swiftbulkuploader_spark.plans.upload import upload

    stream = (
        spark.readStream.schema(MANIFEST_STREAM_SCHEMA)
        .parquet(manifest_dir)
        .filter(F.col("error").isNull())
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_b = batch_df.sparkSession
        try:
            prior = spark_b.read.parquet(attempts_path)
        except Exception:  # noqa: BLE001 - no attempts yet
            prior = None
        attempts = upload(batch_df, store_factory, prior_attempts=prior,
                          cutoff=cutoff, max_attempts=max_attempts,
                          parallelism=parallelism)
        attempts.write.mode("append").parquet(attempts_path)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
