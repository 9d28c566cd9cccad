"""Capture .explain('formatted') for named contract queries into
plans/<round>/<query>_<tag>.txt — the optimization-round before/after
evidence files the judge reads (driver cannot run Spark). The round
subdirectory defaults to r14; override with $SPARK_GRAFT_PLANS_ROUND.

Usage: python tools/capture_plans.py <sf_dir> <tag> <query> [<query> ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftbulkuploader_spark.session import get_spark  # noqa: E402
from swiftbulkuploader_spark import registry  # noqa: E402


def main() -> None:
    sf_dir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
