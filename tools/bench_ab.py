"""Isolated fresh-session micro-benchmark for settling bench-ratio disputes.

The repo's measured machine-state envelope is ~1.35x on same-code solo runs
(SCALING.md "Same-code bench spread"), so a round-over-round per-query ratio
inside that band is NOT evidence of a regression — and a ratio outside it
needs an ISOLATED re-measure before it can be called one. This tool is that
re-measure, automated (round-6 verdict ask #1):

  python tools/bench_ab.py [--sf-dir DIR] [--reps 5] [--label L] q1 [q2 ...]

For EACH named query it spawns a FRESH Python+JVM subprocess (no warm
caches, no shared persisted bases, no session history), runs one warmup
query to absorb JVM/codegen startup, then times `reps` noop-sink executions
(the exact bench.py semantics: full compute, no driver collect) and reports
median / min / max / all samples. Two code variants are A/B'd by running
the tool once per checkout (or once per `git stash` state) and comparing
the median columns — each invocation stamps its git rev so the table rows
are attributable.

Results go to stdout as a readable table plus ONE final JSON line; the
per-query sample JSON is handed subprocess->parent through a temp file
(never stdout — JVM shutdown warnings interleave, CLAUDE.md rule on probe
JSON).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker(query: str, sf_dir: str, reps: int, out_path: str) -> None:
    """Runs inside the fresh subprocess: time one query, write JSON."""
    import time

    sys.path.insert(0, REPO)
    from swiftbulkuploader_spark import registry
    from swiftbulkuploader_spark.session import get_spark

    spark = get_spark(f"bench_ab_{query}")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py: JVM, codegen, parquet footer caches
    registry.QUERIES["a1_total_count"](spark, sf_dir).collect()
    fn = registry.QUERIES[query]
    samples = []
    for _ in range(reps):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    spark.stop()
    srt = sorted(samples)
    with open(out_path, "w") as fh:
        json.dump({
            "query": query,
            "samples": samples,
            "median": srt[len(srt) // 2],
            "min": srt[0],
            "max": srt[-1],
        }, fh)


def _git_rev() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--label", default=None,
                    help="variant label for the table (default: git rev)")
    ap.add_argument("--_worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--_out", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._worker:
        _worker(args.queries[0], args.sf_dir, args.reps, args._out)
        return

    label = args.label or _git_rev()
    results = []
    for q in args.queries:
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            out_path = tf.name
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), q,
                 "--sf-dir", args.sf_dir, "--reps", str(args.reps),
                 "--_worker", "--_out", out_path],
                cwd=REPO, timeout=1800,
            )
            if proc.returncode != 0:
                results.append({"query": q, "error": f"rc={proc.returncode}"})
                continue
            with open(out_path) as fh:
                results.append(json.load(fh))
        finally:
            os.unlink(out_path)

    print(f"\nisolated fresh-session bench  label={label}  "
          f"sf_dir={args.sf_dir}  reps={args.reps}")
    print(f"{'query':34s} {'median':>8s} {'min':>8s} {'max':>8s}  samples")
    for r in results:
        if "error" in r:
            print(f"{r['query']:34s}  ERROR {r['error']}")
            continue
        print(f"{r['query']:34s} {r['median']:8.3f} {r['min']:8.3f} "
              f"{r['max']:8.3f}  {r['samples']}")
    print(json.dumps({"label": label, "sf_dir": args.sf_dir,
                      "reps": args.reps, "results": results},
                     separators=(",", ":")))


if __name__ == "__main__":
    main()
