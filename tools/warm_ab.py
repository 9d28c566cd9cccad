"""Same-session warm A/B timer: run named queries with bench.py noop-sink
semantics in ONE warm session (shared memoized substrates live, as in the
real bench), several reps each, and print per-query samples + medians.

Usage: python tools/warm_ab.py <sf_dir> <reps> <query> [<query> ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftbulkuploader_spark.session import get_spark  # noqa: E402
from swiftbulkuploader_spark import registry  # noqa: E402


def main() -> None:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    spark = get_spark("warm_ab")
    spark.sparkContext.setLogLevel("ERROR")
    registry.QUERIES["a1_total_count"](spark, sf_dir).collect()
    for name in names:
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"warm_ab:{name}")
            t0 = time.time()
            registry.QUERIES[name](spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        med = sorted(samples)[len(samples) // 2]
        print(f"{name}: med={med} samples={samples}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
