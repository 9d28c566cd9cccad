"""Focused bench-shape profiler: time a subset of contract queries at a
given sf_dir with bench.py semantics (noop write, build/exec split,
round-robin reps) and print per-rep numbers — the CLAUDE.md rule-10
build-vs-exec discipline for regression hunts.

Usage: python tools/profile_subset.py <sf_dir> <query> [<query> ...]
Env: PROFILE_REPS (default 3).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftbulkuploader_spark.session import get_spark  # noqa: E402
from swiftbulkuploader_spark import registry  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    reps = int(os.environ.get("PROFILE_REPS", "3"))
    spark = get_spark("profile_subset")
    spark.sparkContext.setLogLevel("ERROR")
    registry.QUERIES["a1_total_count"](spark, sf_dir).collect()
    results: dict[str, list[tuple[float, float]]] = {n: [] for n in names}
    for r in range(reps):
        for name in names:
            fn = registry.QUERIES[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            results[name].append((t1 - t0, t2 - t1))
    for name in names:
        rows = results[name]
        tot = sorted(b + e for b, e in rows)
        med = tot[len(tot) // 2]
        print(f"{name:32s} med={med:6.2f}  reps="
              + " ".join(f"[b={b:.2f} e={e:.2f}]" for b, e in rows))
    spark.stop()


if __name__ == "__main__":
    main()
