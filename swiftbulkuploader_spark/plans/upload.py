"""The upload stage: pending work -> object store -> attempt log
(SURVEY.md §3.2's Spark lifecycle replacement).

The reference fans out N OS processes over a shared Manager list with a lock
(bulkupload.py:407-440); here the *only* orchestration is a DataFrame plan:

    pending  = manifest LEFT ANTI JOIN successes ON id          (Q7 resume)
    attempts = pending mapInPandas upload_batch                 (S6 sink)
    report   = attempts groupBy(ok)                             (A9)

* one ObjectStore connection per partition (vs per-call, bulkupload.py:236+)
* bounded in-task retries emit one attempt ROW each (A4/A5) — the mutable
  counters and the `uploaded` point-UPDATE (U2) become append-only data
* at-least-once with idempotent keys: a task retried by Spark re-PUTs the
  same key (same guarantee as the reference's PUT->flag gap, SURVEY.md §2.7)
* Arrow-batched mapInPandas: rows stream through the Python worker in
  columnar batches; file bytes never collect on the driver
"""

from __future__ import annotations

import datetime
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from swiftbulkuploader_spark.functions.paths import object_key
from swiftbulkuploader_spark.sources.objectstore import StoreFactory, connect_with_backoff

ATTEMPTS_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("path", T.StringType()),
    T.StructField("key", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("try_no", T.IntegerType()),
    T.StructField("ok", T.BooleanType()),
    T.StructField("error", T.StringType()),
])


def pending_work(manifest: DataFrame, attempts: DataFrame | None) -> DataFrame:
    """Q7 — resume as a left-anti join against prior successes. With no
    attempt log yet, everything not flagged uploaded is pending.

    A success only counts if it happened AFTER the file's last modification
    (max ok-attempt ts >= manifest mtime; both are UTC-naive instants):
    ids are stable `xxhash64(path)`, so without the mtime comparison a
    re-crawled MODIFIED file would be skipped as already-uploaded — the
    incremental-recrawl workflow (cli recrawl -> upload) depends on stale
    successes not masking fresh bytes. Manifests without an mtime column
    (not produced by this engine's ingest) fall back to the pure anti-join."""
    pending = manifest.filter(~F.col("uploaded")) if "uploaded" in manifest.columns else manifest
    if attempts is None:
        return pending
    ok = attempts.filter(F.col("ok"))
    if "mtime" not in pending.columns:
        return pending.join(ok.select("id").distinct(), "id", "left_anti")
    last_ok = ok.groupBy("id").agg(F.max("ts").alias("_last_ok_ts"))
    return (
        pending.join(last_ok, "id", "left")
        .filter(F.col("_last_ok_ts").isNull() | (F.col("_last_ok_ts") < F.col("mtime")))
        .drop("_last_ok_ts")
    )


def _upload_batches(store_factory: StoreFactory, max_attempts: int, retry_sleep: float,
                    auth_base_sleep: float = 0.5):
    """Builds the mapInPandas function; one store per partition, reused
    across that partition's Arrow batches. The per-partition connect runs
    under `connect_with_backoff` (capped exponential), so a transient auth
    outage delays the partition instead of failing the task — the
    reference's re-auth loop (bulkupload.py:94-107) as a connection
    policy, not recursion."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        store = None
        try:
            for pdf in batches:
                out = {k: [] for k in ("id", "path", "key", "ts", "try_no", "ok", "error")}
                for row in pdf.itertuples(index=False):
                    if store is None:
                        store = connect_with_backoff(
                            store_factory.build, base_sleep=auth_base_sleep
                        )
                    for try_no in range(1, max_attempts + 1):
                        ts = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
                        ok, err = True, None
                        try:
                            with open(row.path, "rb") as fh:
                                data = fh.read()
                            store.put(row.key, data)
                        except Exception as e:  # noqa: BLE001 - each failure becomes a row
                            ok, err = False, f"{type(e).__name__}: {e}"
                        out["id"].append(row.id)
                        out["path"].append(row.path)
                        out["key"].append(row.key)
                        out["ts"].append(ts)
                        out["try_no"].append(try_no)
                        out["ok"].append(ok)
                        out["error"].append(err)
                        if ok:
                            break
                        if try_no < max_attempts and retry_sleep:
                            time.sleep(retry_sleep)
                yield pd.DataFrame(out)
        finally:
            if store is not None:
                store.close()

    return fn


def upload(manifest: DataFrame, store_factory: StoreFactory,
           prior_attempts: DataFrame | None = None, cutoff: str = "",
           max_attempts: int = 5, retry_sleep: float = 0.0,
           parallelism: int | None = None,
           auth_base_sleep: float = 0.5) -> DataFrame:
    """Run the upload stage; returns the attempt-log DataFrame (lazy — write
    it to the attempts table to execute).

    `parallelism` repartitions the pending set: upload is IO-bound per row,
    so width = cluster slots, independent of input file splits (the same
    reasoning as the reference's "increase N processes", readme.md:39-42,
    minus the manual queue).
    """
    pend = pending_work(manifest, prior_attempts).select(
        "id", "path", object_key(F.col("path"), cutoff).alias("key")
    )
    if parallelism:
        pend = pend.repartition(parallelism)
    fn = _upload_batches(store_factory, max_attempts, retry_sleep, auth_base_sleep)
    return pend.mapInPandas(fn, ATTEMPTS_SCHEMA)


def latest_status(attempts: DataFrame) -> DataFrame:
    """W1 — latest-wins per id: the immutable replacement for the mutable
    `uploaded` flag (bulkupload.py:253-261)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("id").orderBy(F.col("ts").desc(), F.col("try_no").desc())
    return (
        attempts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", "path", "key", "ts", "ok", "error")
    )


def upload_segmented(manifest: DataFrame, store_factory: StoreFactory,
                     segment_size: int | None = None, cutoff: str = "",
                     parallelism: int | None = None,
                     prior_attempts: DataFrame | None = None) -> DataFrame:
    """Multi-part upload for oversized files — the wiring the reference's
    SEGMENT_SIZE (bulkupload.py:12) never got (SURVEY.md §3.3).

    Files larger than `segment_size` become one task PER SEGMENT: the
    segment plan (explode/sequence) joins into the upload stage, each task
    ranged-reads only its slice and PUTs `key/part-NNNN`; files at or under
    the threshold upload whole under their plain key. A 10 GB file is 100
    parallel 100 MB tasks instead of one straggler — and no task ever holds
    more than one segment in memory.

    Returns an attempt log with one row per object PUT (whole file or part).
    """
    from swiftbulkuploader_spark.sources.segments import DEFAULT_SEGMENT_SIZE, segment_plan

    if segment_size is None:
        segment_size = DEFAULT_SEGMENT_SIZE

    keyed = manifest.select(
        "id", "path", "size", object_key(F.col("path"), cutoff).alias("base_key")
    )
    small = keyed.filter(F.col("size") <= segment_size).select(
        "id", "path",
        F.col("base_key").alias("key"),
        F.lit(0).alias("seg_offset").cast("long"),
        F.col("size").alias("seg_length"),
    )
    big = keyed.filter(F.col("size") > segment_size)
    big_plan = (
        segment_plan(big.select("path", "size"), segment_size)
        .join(big.select("id", "path", "base_key"), "path")
        .select(
            "id", "path",
            F.format_string("%s/part-%04d", F.col("base_key"), F.col("seg_no")).alias("key"),
            "seg_offset", "seg_length",
        )
    )
    work = small.unionByName(big_plan)
    if prior_attempts is not None:
        # per-PART resume: a file with 99 of 100 parts uploaded retries only
        # the missing part (file-level anti-join would wrongly skip it —
        # one successful part row would mark the whole id done)
        done_keys = prior_attempts.filter(F.col("ok")).select("key").distinct()
        work = work.join(done_keys, "key", "left_anti")
    if parallelism:
        work = work.repartition(parallelism)

    def fn(batches):
        store = None
        try:
            for pdf in batches:
                out = {k: [] for k in ("id", "path", "key", "ts", "try_no", "ok", "error")}
                for row in pdf.itertuples(index=False):
                    if store is None:
                        store = connect_with_backoff(store_factory.build)
                    ts = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
                    ok, err = True, None
                    try:
                        with open(row.path, "rb") as fh:
                            fh.seek(row.seg_offset)
                            data = fh.read(row.seg_length)
                        store.put(row.key, data)
                    except Exception as e:  # noqa: BLE001 - failures become rows
                        ok, err = False, f"{type(e).__name__}: {e}"
                    out["id"].append(row.id)
                    out["path"].append(row.path)
                    out["key"].append(row.key)
                    out["ts"].append(ts)
                    out["try_no"].append(1)
                    out["ok"].append(ok)
                    out["error"].append(err)
                yield pd.DataFrame(out)
        finally:
            if store is not None:
                store.close()

    return work.mapInPandas(fn, ATTEMPTS_SCHEMA)


def apply_attempts(manifest: DataFrame, attempts: DataFrame,
                   mtime_aware: bool = True,
                   trust_prior: bool = True) -> DataFrame:
    """Materialize the mutable view: manifest with `uploaded` derived from
    the attempt log (U2's `UPDATE ... SET uploaded=1` as a batch join —
    the engine's MERGE INTO; run it when compacting the manifest table).

    max(ok) per id instead of latest-wins: once any attempt succeeded the
    file is uploaded, regardless of later failed re-attempts. A manifest
    row already flagged uploaded=True STAYS uploaded even if the log was
    compacted/rotated since — the flag is the durable record, the log the
    incremental one (pending_work trusts the flag the same way).

    ``mtime_aware`` (default) applies `pending_work`'s modification rule: a
    success older than the file's current mtime does NOT mark it uploaded
    (the re-crawled file has fresh bytes the store hasn't seen), so
    `status` and the next `upload` agree on what is pending. Pass False
    when replaying the log for a PAST instant (`status_asof`): comparing a
    historical log against CURRENT mtimes would silently rewrite history
    whenever a later recrawl bumps a file's mtime.

    ``trust_prior`` (default) ORs the manifest's durable `uploaded` flag
    into the result. Pass False when the attempt log is AUTHORITATIVE for
    the requested view — `status_asof` does: a durable flag written by a
    compaction AFTER the as-of instant must not leak into a historical
    snapshot, which should derive purely from the time-filtered log."""
    prior = (
        F.coalesce(F.col("uploaded"), F.lit(False))
        if trust_prior and "uploaded" in manifest.columns else F.lit(False)
    )
    ok = attempts.filter(F.col("ok"))
    if not mtime_aware or "mtime" not in manifest.columns:
        status = ok.select("id").distinct().withColumn("_ok", F.lit(True))
        return (
            manifest.withColumn("_prior", prior)
            .drop("uploaded")
            .join(status, "id", "left")
            .withColumn(
                "uploaded", F.col("_prior") | F.coalesce(F.col("_ok"), F.lit(False))
            )
            .drop("_ok", "_prior")
        )
    last_ok = ok.groupBy("id").agg(F.max("ts").alias("_last_ok_ts"))
    return (
        manifest.withColumn("_prior", prior)
        .drop("uploaded")
        .join(last_ok, "id", "left")
        .withColumn(
            "uploaded",
            # NULL mtime (no modification info) -> any success counts,
            # mirroring pending_work's filter semantics on the same rows
            F.col("_prior")
            | F.when(F.col("_last_ok_ts").isNull(), F.lit(False)).otherwise(
                F.col("mtime").isNull()
                | (F.col("_last_ok_ts") >= F.col("mtime"))
            ),
        )
        .drop("_last_ok_ts", "_prior")
    )


def report(attempts: DataFrame) -> DataFrame:
    """A9/S10 — end-of-run reconciliation: per-outcome totals over the
    *final* status of each id (not raw attempt rows)."""
    return latest_status(attempts).groupBy("ok").agg(
        F.count("*").alias("n_files"),
    )


def run_pipeline(spark, source_dir: str, store_factory: StoreFactory,
                 attempts_path: str, cutoff: str = "", max_attempts: int = 5,
                 parallelism: int | None = None) -> dict:
    """End-to-end: ingest -> resume-filter -> upload -> append attempts ->
    report. Returns summary counters (driver-side smalls only)."""
    from swiftbulkuploader_spark.sources.ingest import ingest_listing

    # cache: the manifest feeds the upload AND the final count — without it
    # every action re-executes the distributed walk
    manifest = ingest_listing(spark, source_dir).filter(F.col("error").isNull()).cache()
    try:
        prior = spark.read.parquet(attempts_path)
    except Exception:  # noqa: BLE001 - first run: no attempt log yet
        prior = None
    attempts = upload(manifest, store_factory, prior, cutoff, max_attempts,
                      parallelism=parallelism)
    attempts.write.mode("append").parquet(attempts_path)
    full_log = spark.read.parquet(attempts_path)
    rep = {r["ok"]: r["n_files"] for r in report(full_log).collect()}
    total = manifest.count()
    manifest.unpersist()
    done = rep.get(True, 0)
    return {
        "total": total,
        "uploaded": done,
        "failed": rep.get(False, 0),
        "pct_done": round(100.0 * done / total, 8) if total else 100.0,
    }
