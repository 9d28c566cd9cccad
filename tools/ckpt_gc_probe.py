"""Reliable-checkpoint disk-footprint probe (round-6 verdict ask #5).

Runs connected_components_star(reliable=True) on an n-node PATH (the
adversarial diameter case; default 4M nodes = the round-6 past-the-wall
probe) and reports the checkpoint-dir footprint the round-7 explicit GC
maintains: peak bytes (high-water across rounds, measured after each
checkpoint materializes) vs end bytes (what the last two kept generations
hold), plus wall time and round count.

Usage: python tools/ckpt_gc_probe.py [n_nodes] [out_json]
Writes ONE json file (never rely on stdout tails — JVM shutdown noise).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from swiftbulkuploader_spark.operators.components import (  # noqa: E402
    CKPT_STATS,
    connected_components_star,
)
from swiftbulkuploader_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ckpt_gc_probe.json"
    # probe-PRIVATE checkpoint dir (round-8, from the r7 advice): clearing
    # the shared default root would delete a concurrent session's reliable
    # checkpoint data mid-flight; mkdtemp is ours alone to create and rm
    import tempfile

    ckpt_dir = tempfile.mkdtemp(prefix="ckpt_gc_probe_")
    spark = get_spark("ckpt_gc_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(ckpt_dir)
    edges = spark.range(n - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    t0 = time.time()
    res = connected_components_star(edges, reliable=True)
    n_comp = res.agg(F.countDistinct("component").alias("c")).first()["c"]
    wall = round(time.time() - t0, 1)
    out = {
        "n_nodes": n,
        "n_components": n_comp,
        "wall_s": wall,
        "ckpt_rounds": CKPT_STATS.get("rounds"),
        "ckpt_peak_mb": round(CKPT_STATS.get("peak_bytes", 0) / 1e6, 1),
        "ckpt_end_mb": round(CKPT_STATS.get("end_bytes", 0) / 1e6, 1),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh)
    spark.stop()
    shutil.rmtree(ckpt_dir, ignore_errors=True)  # leave no probe residue


if __name__ == "__main__":
    main()
