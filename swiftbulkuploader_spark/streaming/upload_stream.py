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
        from swiftbulkuploader_spark.streaming.state_io import (
            read_state_or_none,
        )

        spark_b = batch_df.sparkSession
        # None only when no attempts exist yet; a real read failure
        # raises so the checkpoint replays the batch (state_io docs)
        prior = read_state_or_none(spark_b, attempts_path)
        attempts = upload(batch_df, store_factory, prior_attempts=prior,
                          cutoff=cutoff, max_attempts=max_attempts,
                          parallelism=parallelism)
        attempts.write.mode("append").parquet(attempts_path)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )


def stream_interval_join(left_stream: DataFrame, right_stream: DataFrame,
                         key: str, window_minutes: int = 5,
                         watermark: str = "10 minutes",
                         how: str = "inner") -> DataFrame:
    """Stream-stream interval join: pair each left event with right events of
    the same key within ±window (the streaming twin of the batch bucketed
    range join, operators/range_join.py).

    Both sides watermarked — Spark buffers right rows only until the
    watermark passes their join window, so state is bounded by (rate x
    window), not stream history. Append output: a pair emits exactly once,
    when both sides are present and the watermark closes the match window.

    `how="left_outer"`: an anchor with NO match emits once, null-padded,
    when the watermark proves no match can still arrive — the streaming
    "did anything correlate?" question (an upload attempt with no
    success-ack inside the window) that an inner join silently drops.
    """
    from pyspark.sql import functions as F

    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported stream-stream join type {how!r}")
    lt = left_stream.withWatermark("ts", watermark).alias("l")
    rt = right_stream.withWatermark("ts", watermark).alias("r")
    w = F.expr(f"r.ts BETWEEN l.ts - INTERVAL {window_minutes} MINUTES "
               f"AND l.ts + INTERVAL {window_minutes} MINUTES")
    return lt.join(
        rt, (F.col(f"l.{key}") == F.col(f"r.{key}")) & w, how
    ).select(
        F.col("l.event_id").alias("anchor_id"),
        F.col(f"l.{key}").alias(key),
        F.col("l.ts").alias("anchor_ts"),
        F.col("r.event_id").alias("other_id"),
        F.col("r.ts").alias("other_ts"),
    )
