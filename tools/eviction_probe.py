"""Storage-pool eviction probe (r13 verdict ask #2): decide with DATA
whether the ~15 session-lifetime persisted substrates added in round 13
evict each other under the full 265-query warm suite — the r12 failure
signature was exactly "untouched queries creep only in the full suite"
(CLAUDE.md lesson 13), and the r13 driver run showed that creep on
x6_quantiles / x3_bpe_encode / x2_ivf_probe_sweep.

Method:
1. One session with the UI enabled (REST is the only eviction counter
   source). Pass 1 over the whole bench HEADLINE builds every memoized
   substrate; pass 2 re-times every query warm (the bench's steady
   state).
2. AT THE END — maximum storage-pool pressure — the suspect queries are
   re-timed (reps per query). If eviction were degrading them, these
   end-of-suite samples would be SLOWER than their pass-2 samples and
   than the committed isolated medians.
3. REST /storage/rdd is dumped: any persisted RDD with
   numCachedPartitions < numPartitions has lost blocks (eviction or
   never-fully-materialized); memory totals quantify pool headroom.

Prints a readable table + ONE final JSON line; paste into
EVICTION_r14.json / OPTIMIZATION_r14.md.

Usage: python tools/eviction_probe.py <sf_dir> [suspect ...]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftbulkuploader_spark.session import get_spark  # noqa: E402
from swiftbulkuploader_spark import registry  # noqa: E402
import bench  # noqa: E402

DEFAULT_SUSPECTS = [
    "x6_quantiles", "x3_bpe_encode", "x2_ivf_probe_sweep",
    "x3_feature_hashing", "x1_simhash_recall_eval", "x8_pagerank",
]


def _rest(spark, path: str):
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.split(':')[-1]}"
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def _run(spark, sf_dir: str, name: str) -> float:
    fn = registry.QUERIES[name]
    spark.sparkContext.setJobDescription(f"eviction_probe:{name}")
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1]
    suspects = sys.argv[2:] or DEFAULT_SUSPECTS
    spark = get_spark("eviction_probe", extra_conf={
        "spark.ui.enabled": "true", "spark.ui.port": "4046",
    })
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in bench.HEADLINE if n in registry.QUERIES]
    pass1: dict[str, float] = {}
    pass2: dict[str, float] = {}
    for store, label in ((pass1, "pass1-build"), (pass2, "pass2-warm")):
        t0 = time.time()
        for name in names:
            store[name] = _run(spark, sf_dir, name)
        print(f"{label}: {len(names)} queries in "
              f"{time.time() - t0:.1f}s", flush=True)
    # end-of-suite suspect re-timing under max storage pressure
    tail: dict[str, list[float]] = {n: [] for n in suspects}
    for _ in range(3):
        for n in suspects:
            tail[n].append(_run(spark, sf_dir, n))
    rdds = _rest(spark, "storage/rdd")
    partial = [
        {
            "id": r["id"], "name": (r.get("name") or "")[:60],
            "parts": r["numPartitions"], "cached": r["numCachedPartitions"],
            "mem_mb": round(r["memoryUsed"] / 1e6, 1),
        }
        for r in rdds
        if r["numCachedPartitions"] < r["numPartitions"]
    ]
    mem_total_mb = round(sum(r["memoryUsed"] for r in rdds) / 1e6, 1)
    execs = _rest(spark, "executors")
    pool_mb = round(sum(e.get("maxMemory", 0) for e in execs) / 1e6, 1)
    print(f"\ncached RDDs: {len(rdds)}, storage used {mem_total_mb} MB of "
          f"{pool_mb} MB pool; PARTIAL (evicted/lazy) entries: {len(partial)}")
    for p in partial:
        print(f"  rdd {p['id']}: {p['cached']}/{p['parts']} cached, "
              f"{p['mem_mb']} MB  {p['name']}")
    print(f"\n{'query':34s} {'pass1':>7s} {'pass2':>7s} {'tail_med':>9s}")
    tail_med = {}
    for n in suspects:
        s = sorted(tail[n])
        tail_med[n] = s[len(s) // 2]
        print(f"{n:34s} {pass1[n]:7.3f} {pass2[n]:7.3f} {tail_med[n]:9.3f}")
    out = {
        "sf_dir": sf_dir,
        "n_queries": len(names),
        "n_cached_rdds": len(rdds),
        "storage_used_mb": mem_total_mb,
        "storage_pool_mb": pool_mb,
        "partial_rdds": partial,
        "suspects": {
            n: {"pass1": pass1[n], "pass2": pass2[n],
                "tail_samples": tail[n], "tail_med": tail_med[n]}
            for n in suspects
        },
    }
    spark.stop()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
