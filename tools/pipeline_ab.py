"""No-change A/B of the pipeline bench phase (r9 verdict ask #2):
run bench._bench_pipeline twice in one session on an idle box and report
the run-level envelope. Done-bar: median-sec ratio between the two
identical-code runs <= ~1.1x. Results recorded in SCALING.md.

Usage: python tools/pipeline_ab.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from bench import _bench_pipeline  # noqa: E402
from swiftbulkuploader_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("pipeline_ab")
    spark.sparkContext.setLogLevel("ERROR")
    a = _bench_pipeline(spark, reps=reps)
    # settle: run A's teardown rmtree (~140k files) flushes asynchronously;
    # without a sync + pause run B pays A's journal writes and the
    # "no-change" envelope measures the filesystem, not the pipeline
    os.sync()
    time.sleep(20)
    b = _bench_pipeline(spark, reps=reps)
    ratio = round(max(a["sec"], b["sec"]) / min(a["sec"], b["sec"]), 3)
    print(json.dumps({"run_a": a, "run_b": b,
                      "median_sec_envelope": ratio}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
