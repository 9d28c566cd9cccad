"""Per-batch micro-bench of the streaming twins (r13 verdict ask #8):
the 14 stream operators are pytest-pinned for semantics but were the
last perf-unmeasured surface. For each twin this drives 2 micro-batches
at a SMALL and a LARGE batch size through the real entry point
(file-source + maxFilesPerTrigger=1 + availableNow, or the rate source)
and reports the per-batch trigger wall from the query's own progress
counters — so SCALING.md gets a measured "is per-batch work
batch-proportional or overhead-bound?" row per twin.

Batch files are written SEQUENTIALLY (file sources order by modification
time — CLAUDE.md round-5 streaming note), and the second batch carries
LATER event times than the first so watermark-driven twins advance.

Usage: python tools/stream_bench.py <sf_dir> [out_json]
Prints a table + ONE final JSON line (default artifact
STREAM_BENCH_r14.json when out_json given).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from swiftbulkuploader_spark.session import get_spark  # noqa: E402
from swiftbulkuploader_spark.catalog import load_table  # noqa: E402

WORK = tempfile.mkdtemp(prefix="stream_bench_")


def _dirs(*names: str) -> list[str]:
    """Fresh UNCREATED paths: state_io.read_state_or_none gates on path
    existence, so pre-creating an empty delta dir turns the first batch's
    state read into UNABLE_TO_INFER_SCHEMA — writers create their own
    directories."""
    return [os.path.join(WORK, f"{n}_{time.time_ns()}") for n in names]


def _write_batches(frames, src_dir: str) -> None:
    """One parquet file per batch, written sequentially (mtime order)."""
    for i, df in enumerate(frames):
        df.coalesce(1).write.mode("append").parquet(src_dir)
        time.sleep(0.05)  # mtime separation


def _batch_walls(q, timeout: int = 300) -> list[float]:
    q.awaitTermination(timeout)
    walls = []
    for p in q.recentProgress:
        if p and p.get("numInputRows", 0) > 0:
            walls.append(round(
                p["durationMs"]["triggerExecution"] / 1000.0, 3))
    return walls


def _start_noop(sdf, cp: str):
    return (
        sdf.writeStream.format("noop")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )


def _events_batches(spark, sf_dir: str, n: int):
    # ts cast: the catalog loads parquet timestamps as TIMESTAMP_NTZ
    # (UTC-pinned session), but event-time watermarks/state timeouts
    # require TIMESTAMP
    ev = (
        load_table(spark, sf_dir, "events").drop("props")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .orderBy("ts")
    )
    b1 = ev.limit(n)
    b2 = ev.orderBy(F.col("ts").desc()).limit(n)  # strictly later times
    return b1, b2


def _docs_ts_batches(spark, sf_dir: str, n: int):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    d1 = docs.filter(F.col("doc_id") % 2 == 0).limit(n).withColumn(
        "ts", base + F.make_interval(secs=F.col("doc_id") % 1000)
    )
    d2 = docs.filter(F.col("doc_id") % 2 == 1).limit(n).withColumn(
        "ts",
        base + F.make_interval(hours=F.lit(2),
                               secs=F.col("doc_id") % 1000),
    )
    return d1, d2


# ---- twin runners: (spark, sf_dir, n) -> per-batch walls ----

def run_dedup_exact(spark, sf_dir, n):
    from swiftbulkuploader_spark.streaming.dedup_stream import (
        stream_dedup_exact,
    )

    src, cp = _dirs("dedup_src", "dedup_cp")
    d1, d2 = _docs_ts_batches(spark, sf_dir, n)
    _write_batches([d1, d2], src)
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    return _batch_walls(_start_noop(stream_dedup_exact(stream), cp))


def run_frontier_admission(spark, sf_dir, n):
    from swiftbulkuploader_spark.streaming.frontier_stream import (
        stream_frontier_admission,
    )

    src, cp, delta = _dirs("fr_src", "fr_cp", "fr_delta")
    docs = load_table(spark, sf_dir, "documents")
    _write_batches(
        [docs.filter(F.col("doc_id") % 2 == 0).limit(n),
         docs.filter(F.col("doc_id") % 2 == 1).limit(n)], src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    return _batch_walls(stream_frontier_admission(stream, delta, cp))


def run_incremental_screen(spark, sf_dir, n):
    from swiftbulkuploader_spark.streaming.incremental_stream import (
        stream_incremental_screen,
    )

    src, cp, out = _dirs("inc_src", "inc_cp", "inc_out")
    docs = load_table(spark, sf_dir, "documents")
    frozen = docs.filter(F.col("doc_id") % 5 != 0)
    probes = frozen.filter(F.col("doc_id") < 100)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    _write_batches(
        [batch.filter(F.col("doc_id") % 2 == 0).limit(n),
         batch.filter(F.col("doc_id") % 2 == 1).limit(n)], src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    return _batch_walls(
        stream_incremental_screen(stream, frozen, probes, out, cp))


def run_index_ingest(spark, sf_dir, n):
    from swiftbulkuploader_spark.operators.ann_index import ensure_index
    from swiftbulkuploader_spark.streaming.index_stream import (
        stream_index_ingest,
    )

    src, cp, out = _dirs("idx_src", "idx_cp", "idx_out")
    index_path = ensure_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    _write_batches(
        [emb.filter(F.col("vec_id") % 2 == 0).limit(n),
         emb.filter(F.col("vec_id") % 2 == 1).limit(n)], src)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    return _batch_walls(stream_index_ingest(stream, index_path, out, cp))


def run_integrity_ingest(spark, sf_dir, n):
    from swiftbulkuploader_spark.streaming.integrity_stream import (
        stream_integrity_ingest,
    )

    src, cp, out = _dirs("int_src", "int_cp", "int_out")
    docs = load_table(spark, sf_dir, "documents")
    _write_batches(
        [docs.filter(F.col("doc_id") % 2 == 0).limit(n),
         docs.filter(F.col("doc_id") % 2 == 1).limit(n)], src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    return _batch_walls(stream_integrity_ingest(stream, out, cp))


def run_cluster_maintenance(spark, sf_dir, n):
    from swiftbulkuploader_spark.streaming.cluster_stream import (
        prepare_frozen_labels,
        stream_cluster_maintenance,
    )

    src, cp, delta = _dirs("cl_src", "cl_cp", "cl_delta")
    # frozen: a chain forest over 4n nodes; stream: edges that attach
    # new nodes to frozen clusters (the maintenance regime)
    frozen_edges = spark.range(4 * n).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    ).filter(F.col("a") % 4 != 3)
    frozen = prepare_frozen_labels(frozen_edges)
    base = 10 * n
    b1 = spark.range(n).select(
        (F.col("id") * 4).alias("a"), (base + F.col("id")).alias("b"))
    b2 = spark.range(n).select(
        (F.col("id") * 4 + 1).alias("a"),
        (2 * base + F.col("id")).alias("b"))
    _write_batches([b1, b2], src)
    stream = (
        spark.readStream.schema("a long, b long")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    walls = _batch_walls(stream_cluster_maintenance(stream, frozen, delta, cp))
    frozen.unpersist()
    return walls


def run_experiment_monitor(spark, sf_dir, n):
    from swiftbulkuploader_spark.streaming.monitor_stream import (
        stream_experiment_monitor,
    )

    src, cp, delta = _dirs("mon_src", "mon_cp", "mon_delta")
    b1, b2 = _events_batches(spark, sf_dir, n)
    _write_batches([b1, b2], src)
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    return _batch_walls(stream_experiment_monitor(stream, delta, cp))


def run_hourly_rollup(spark, sf_dir, n):
    from swiftbulkuploader_spark.streaming.rollup_stream import (
        stream_hourly_rollup,
    )

    src, cp, delta = _dirs("ru_src", "ru_cp", "ru_delta")
    b1, b2 = _events_batches(spark, sf_dir, n)
    _write_batches([b1, b2], src)
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    return _batch_walls(stream_hourly_rollup(stream, delta, cp))


def run_sessions(spark, sf_dir, n):
    from swiftbulkuploader_spark.streaming.stateful import stream_sessions

    src, cp = _dirs("se_src", "se_cp")
    b1, b2 = _events_batches(spark, sf_dir, n)
    _write_batches([b1, b2], src)
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    return _batch_walls(_start_noop(stream_sessions(stream), cp))


def run_running_profile(spark, sf_dir, n):
    from swiftbulkuploader_spark.streaming.stateful_v2 import (
        stream_running_profile,
    )

    src, cp = _dirs("rp_src", "rp_cp")
    b1, b2 = _events_batches(spark, sf_dir, n)
    _write_batches([b1, b2], src)
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    return _batch_walls(_start_noop(stream_running_profile(stream), cp))


def run_interval_join(spark, sf_dir, n):
    from swiftbulkuploader_spark.streaming.upload_stream import (
        stream_interval_join,
    )

    lsrc, rsrc, cp = _dirs("ij_l", "ij_r", "ij_cp")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id").orderBy("ts")
    l1 = ev.filter(F.col("event_id") % 2 == 0).limit(n)
    r1 = ev.filter(F.col("event_id") % 2 == 1).limit(n)
    l2 = ev.orderBy(F.col("ts").desc()).filter(
        F.col("event_id") % 2 == 0).limit(n)
    r2 = ev.orderBy(F.col("ts").desc()).filter(
        F.col("event_id") % 2 == 1).limit(n)
    _write_batches([l1, l2], lsrc)
    _write_batches([r1, r2], rsrc)
    schema = "event_id long, ts timestamp, user_id long"
    ls = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(lsrc))
    rs = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(rsrc))
    return _batch_walls(
        _start_noop(stream_interval_join(ls, rs, "user_id"), cp))


def run_stream_rate(spark, sf_dir, n):
    from swiftbulkuploader_spark.streaming.progress import stream_rate

    src, cp = _dirs("rt_src", "rt_cp")
    ev = load_table(spark, sf_dir, "events").orderBy("ts")
    mk = lambda df, off: df.select(  # noqa: E731
        F.col("event_id").alias("id"),
        F.concat(F.lit("p"), F.col("event_id")).alias("path"),
        F.concat(F.lit("k"), F.col("event_id")).alias("key"),
        (F.col("ts") + F.make_interval(hours=F.lit(off))).alias("ts"),
        F.lit(1).alias("try_no"), F.lit(True).alias("ok"),
        F.lit(None).cast("string").alias("error"),
    )
    _write_batches([mk(ev.limit(n), 0),
                    mk(ev.orderBy(F.col("ts").desc()).limit(n), 2)], src)
    sdf = stream_rate(spark, src)
    q = (
        sdf.writeStream.format("memory").queryName(f"rates_{n}")
        .outputMode("complete")
        .option("checkpointLocation", cp)
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    return _batch_walls(q)


def run_upload(spark, sf_dir, n):
    from swiftbulkuploader_spark.sources.objectstore import StoreFactory
    from swiftbulkuploader_spark.streaming.upload_stream import stream_upload

    man, cp, att, bucket, srcfiles = _dirs(
        "up_man", "up_cp", "up_att", "up_bucket", "up_files")
    # n real small files per batch, manifests written per batch
    from swiftbulkuploader_spark.sources.ingest import ingest_listing

    for b in range(2):
        for i in range(n):
            sub = os.path.join(srcfiles, f"b{b}", f"d{i % 50}")
            os.makedirs(sub, exist_ok=True)
            with open(os.path.join(sub, f"f{i}.txt"), "wb") as fh:
                fh.write(b"x" * 64)
        ingest_listing(spark, os.path.join(srcfiles, f"b{b}")).write.mode(
            "append").parquet(man)
        time.sleep(0.05)
    factory = StoreFactory("localfs", root=bucket)
    writer = stream_upload(spark, man, factory, att, cp, cutoff=srcfiles)
    q = (writer.option("maxFilesPerTrigger", 1)
         .trigger(availableNow=True).start())
    return _batch_walls(q)


def run_rate_source(spark, sf_dir, n):
    """Engine-generated rate source: no files. Reports seconds of
    trigger wall per ~n-row batch (rowsPerSecond=n, ~1 s of generation
    per trigger)."""
    from swiftbulkuploader_spark.streaming.progress import (
        stream_rate_from_rate_source,
    )

    (cp,) = _dirs("rs_cp")
    sdf = stream_rate_from_rate_source(spark, rows_per_second=n)
    q = (
        sdf.writeStream.format("noop")
        .option("checkpointLocation", cp)
        .trigger(processingTime="1 second")
        .start()
    )
    time.sleep(8)
    q.stop()
    q.awaitTermination(60)
    walls = [
        round(p["durationMs"]["triggerExecution"] / 1000.0, 3)
        for p in q.recentProgress
        if p and p.get("numInputRows", 0) > 0
    ]
    return walls[-3:]


TWINS = {
    # name -> (runner, small_n, big_n)
    "dedup_exact": (run_dedup_exact, 1000, 5000),
    "frontier_admission": (run_frontier_admission, 1000, 5000),
    "incremental_screen": (run_incremental_screen, 200, 1000),
    "index_ingest": (run_index_ingest, 400, 2000),
    "integrity_ingest": (run_integrity_ingest, 1000, 5000),
    "cluster_maintenance": (run_cluster_maintenance, 1000, 5000),
    "experiment_monitor": (run_experiment_monitor, 4000, 40000),
    "hourly_rollup": (run_hourly_rollup, 4000, 40000),
    "sessions": (run_sessions, 4000, 40000),
    "running_profile": (run_running_profile, 4000, 40000),
    "interval_join": (run_interval_join, 4000, 40000),
    "stream_rate": (run_stream_rate, 4000, 40000),
    "upload": (run_upload, 500, 2500),
    "rate_source": (run_rate_source, 4000, 40000),
}


def main() -> None:
    sf_dir = sys.argv[1]
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("stream_bench")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    print(f"{'twin':24s} {'n_small':>8s} {'walls_s':>16s} "
          f"{'n_big':>8s} {'walls_s':>16s} {'ratio':>6s}")
    try:
        import google.protobuf  # noqa: F401
        have_protobuf = True
    except ImportError:
        have_protobuf = False
    for name, (runner, sn, bn) in TWINS.items():
        row = {}
        if name == "running_profile" and not have_protobuf:
            # same gate as tests/test_stateful_v2.py: transformWithState's
            # Python worker needs protobuf, absent in this container
            row["skipped"] = "transformWithStateInPandas needs protobuf"
            print(f"{name:24s} SKIPPED (needs python protobuf)")
            results[name] = row
            continue
        try:
            for tag, n in (("small", sn), ("big", bn)):
                walls = runner(spark, sf_dir, n)
                row[tag] = {"batch_rows": n, "batch_walls_sec": walls}
            sw = row["small"]["batch_walls_sec"]
            bw = row["big"]["batch_walls_sec"]
            # steady-state = LAST batch (first carries source listing +
            # stream-start overhead)
            ratio = (round(bw[-1] / sw[-1], 2)
                     if sw and bw and sw[-1] > 0 else None)
            row["big_over_small"] = ratio
            print(f"{name:24s} {sn:8d} {str(sw):>16s} "
                  f"{bn:8d} {str(bw):>16s} "
                  f"{ratio if ratio is not None else '-':>6}")
        except Exception as e:  # keep the sweep going; report the hole
            row["error"] = f"{e.__class__.__name__}: {e}"[:200]
            print(f"{name:24s} ERROR {row['error']}")
        results[name] = row
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)
    out = {"sf_dir": sf_dir, "twins": results}
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({"twins": {
        k: v.get("big_over_small") for k, v in results.items()
    }}, separators=(",", ":")))


if __name__ == "__main__":
    main()
