"""Progress/rate observability (SURVEY.md §2.7, S9/A7/A8/S10).

The reference rewrites a status file after every row and runs a dedicated
monitor process sampling a shared counter every 5 s (bulkupload.py:320-338,
363-387). Spark-first replacements:

* `observed()`      — `df.observe(Observation)`: exact counters collected as
                      a side effect of the job that does the work (no second
                      pass, no shared mutable state).
* `progress_line()` — the reference's status-line format (% with 8 decimals,
                      bulkupload.py:323-331) from those counters.
* `rate_over_window()` — uploads/sec per tumbling window over the attempt
                      log (batch equivalent of the 5 s sampler).
* `stream_rate()`   — the same aggregation as a Structured Streaming query
                      over a growing attempts directory: watermark + window,
                      checkpointed, exactly-once to its sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from swiftbulkuploader_spark.plans.upload import ATTEMPTS_SCHEMA


def observed(attempts: DataFrame, name: str = "upload") -> tuple[DataFrame, Observation]:
    """Attach counters to the attempt stream; metrics materialize when the
    returned DataFrame executes (A4/A5/A6 without accumulators or locks)."""
    obs = Observation(name)
    df = attempts.observe(
        obs,
        F.count(F.lit(1)).alias("n_attempts"),
        F.sum(F.col("ok").cast("long")).alias("n_ok"),
        F.sum((~F.col("ok")).cast("long")).alias("n_failed"),
    )
    return df, obs


def progress_line(done: int, total: int) -> str:
    """The reference's progress format: 8-decimal percentage
    (bulkupload.py:323-331)."""
    pct = 100.0 * done / total if total else 100.0
    return f"{done}/{total} files uploaded. {format(pct, '.8f')}%"


def rate_over_window(attempts: DataFrame, window: str = "5 seconds") -> DataFrame:
    """A8 — uploads/sec per tumbling window (batch form)."""
    dur = F.unix_timestamp(F.col("w.end")) - F.unix_timestamp(F.col("w.start"))
    return (
        attempts.filter(F.col("ok"))
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count("*").alias("n_ok"))
        .select(
            F.col("w.start").alias("window_start"),
            "n_ok",
            F.round(F.col("n_ok") / dur.cast("double"), 4).alias("rate_per_s"),
        )
    )


def stream_rate(spark: SparkSession, attempts_dir: str,
                window: str = "5 seconds", watermark: str = "30 seconds"):
    """Structured Streaming form of A8 over a growing attempts directory.

    Returns the streaming DataFrame; callers attach a sink + checkpoint:

        q = (stream_rate(spark, d)
             .writeStream.format("memory").queryName("rates")
             .outputMode("complete")
             .option("checkpointLocation", cp)
             .trigger(availableNow=True).start())

    The watermark bounds window state for long-running append-mode sinks
    (late attempt rows beyond it are dropped); with `complete` output the
    sink re-emits the full window table each trigger. Either way this
    replaces the reference's sample-forever monitor loop polling a shared
    counter (bulkupload.py:363-387)."""
    stream = (
        spark.readStream.schema(ATTEMPTS_SCHEMA)
        .parquet(attempts_dir)
        .withWatermark("ts", watermark)
    )
    dur = F.unix_timestamp(F.col("w.end")) - F.unix_timestamp(F.col("w.start"))
    return (
        stream.filter(F.col("ok"))
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count("*").alias("n_ok"))
        .select(
            F.col("w.start").alias("window_start"),
            "n_ok",
            F.round(F.col("n_ok") / dur.cast("double"), 4).alias("rate_per_s"),
        )
    )


def stream_rate_from_rate_source(spark: SparkSession,
                                 rows_per_second: int = 100,
                                 window: str = "1 second",
                                 watermark: str = "5 seconds"):
    """A8's streaming mapping driven by Spark's built-in ``rate`` source
    instead of a file directory (round 6): each generated (timestamp,
    value) row becomes a synthetic successful attempt, flowing through
    the SAME window/rate aggregation as ``stream_rate``.

    Why it exists: the file-source tests couple to filesystem MODIFICATION
    time (files are ordered by mtime, so a late-range file written first
    poisons the watermark — CLAUDE.md round-5 note). The rate source has
    no such coupling: event time is generated monotonically by the engine,
    so trigger cadence and the progress counters
    (``lastProgress["processedRowsPerSecond"]``, ``numInputRows``) can be
    pinned deterministically. This is also the micro-benchmark harness
    shape for sink throughput — the reference's uploads/s monitor
    (bulkupload.py:363-387) without a filesystem in the loop."""
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        # the same shape the attempts log feeds the window agg: event
        # time + success flag (rate rows all "succeed")
        .select(
            F.col("timestamp").alias("ts"),
            F.lit(True).alias("ok"),
            F.col("value").alias("attempt_id"),
        )
        .withWatermark("ts", watermark)
    )
    dur = F.unix_timestamp(F.col("w.end")) - F.unix_timestamp(F.col("w.start"))
    return (
        stream.filter(F.col("ok"))
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count("*").alias("n_ok"))
        .select(
            F.col("w.start").alias("window_start"),
            "n_ok",
            F.round(F.col("n_ok") / dur.cast("double"), 4).alias("rate_per_s"),
        )
    )
