"""Second scale point for the CONTRACT queries themselves (r8 verdict
ask #7): the shape probes (tools/scaling_probe.py) cover operator
skeletons, but super-linear drift in a real contract query's full
composition can hide between them. This runs the top-10 most expensive
contract queries (by the committed bench) at sf0.1 AND at a 10x
SYNTHETIC substrate, and reports the wall ratio per query.

The substrate is generated (never written under /root/testdata): each
needed table is replicated REP=10x with keys remapped k -> k*REP + r so
joins stay consistent, and with per-replica mutations that PRESERVE the
workload's statistical shape instead of inflating it:

* documents: replica r > 0 prefixes every token with `r{r}` — replicas
  share no shingles/grams with each other, so exact/near-dup density,
  novelty structure and n-gram statistics are 10 disjoint copies of the
  original corpus (replicating text verbatim would multiply every dup
  class by 10x pairs — a different, adversarial workload);
* embeddings: replica r rotates the vector by r positions — norms and
  within-replica geometry preserved, cross-replica identity broken;
* lineitem/part/orders: key remap only — the co-purchase graph becomes
  10 disjoint copies (work x10, density constant).

Usage: python tools/scale10_bench.py [substrate_dir]
Prints one JSON line; paste the table into SCALING.md per round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from swiftbulkuploader_spark.session import get_spark
from swiftbulkuploader_spark import registry

REP = 10
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# top-10 by median in the committed per-round bench artifact
# (r10 close-out refresh against BENCH_LOCAL_r10 — x6_bootstrap_diff_ci,
# added mid-round, is now the single most expensive bench query;
# x1_incremental_dedup is measured by the ASYMMETRIC runner below, not
# as a whole-substrate query)
# refreshed per round from the committed bench ranking (CLAUDE.md 12b:
# static lists go stale silently). r11: the bootstrap pair left the
# top-10 (shared replica substrate, 9.6 s -> 5.3 s combined) and the
# new x2 entrants joined (mutual_knn post codegen-dot fix,
# index_staleness).
TOP10 = [
    # r12 refresh against the 24g BENCH_LOCAL ranking; x1_lsh_recall_eval
    # joined the top set, and the round's new/changed shapes ride along:
    # x2_index_staleness (now a 2x-union scenario pair), x2_reindex_partial
    # (flagged-member re-quantization), x8_ppr (seeded 3-round walk)
    "x2_mmd_drift",
    "x1_novelty_score",
    "x1_incremental_dedup",
    "x9_phash_dedup",
    "x7_theil_sen",
    "x1_repeated_passages",
    "x1_lsh_recall_eval",
    "x2_mutual_knn",
    "x2_kcenter_select",
    "x1_semantic_dedup",
    "x2_index_staleness",
    "x2_reindex_partial",
    "x8_ppr",
]

# tables the TOP10 actually read (generating the rest would waste the
# round's time budget; extend when the top-10 set changes)
TABLES = ["documents", "embeddings", "lineitem", "part", "orders",
          "events"]

_KEY_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "events": ["event_id", "user_id"],
}


def _replicate(spark, table: str, out_dir: str) -> None:
    df = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
    reps = spark.range(REP).select(F.col("id").cast("int").alias("_r"))
    wide = df.crossJoin(F.broadcast(reps))
    for k in _KEY_COLS.get(table, []):
        if k in df.columns:
            wide = wide.withColumn(
                k, (F.col(k) * F.lit(REP) + F.col("_r")).cast("long")
            )
    if table == "documents":
        toks = F.split(F.col("text"), " ")
        mutated = F.array_join(
            F.transform(
                toks,
                lambda t: F.concat(
                    F.lit("r"), F.col("_r").cast("string"), t
                ),
            ),
            " ",
        )
        wide = wide.withColumn(
            "text",
            F.when(F.col("_r") == 0, F.col("text")).otherwise(mutated),
        )
    if table == "embeddings":
        v = F.col("embedding")
        n = F.size(v)
        rotated = F.concat(
            F.slice(v, F.col("_r") + 1, n - F.col("_r")),
            F.slice(v, F.lit(1), F.col("_r")),
        )
        wide = wide.withColumn(
            "embedding",
            F.when(F.col("_r") == 0, v).otherwise(rotated)
            .cast("array<float>"),
        )
    wide.drop("_r").write.mode("overwrite").parquet(
        os.path.join(out_dir, f"{table}.parquet")
    )


def _time_query(spark, name: str, sf_dir: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.time() - t0)
    return best


def _incremental_asym(spark, out_dir: str) -> dict:
    """x1_incremental_dedup's production asymmetry (r9 verdict ask #4):
    grow the FROZEN side 10x, HOLD the batch. The frozen index (fp /
    band / hash-set / probe substrates) is prebuilt + materialized once
    per scale via build_frozen_substrates — the r10 streaming discipline
    — and only the per-batch screen is timed, so the ratio reads "how
    does screening the SAME recrawl batch scale with the frozen corpus"
    (build cost is reported separately; it is the amortized index).

    The 10x substrate's replicas share no tokens with the unprefixed
    batch, so cross-epoch candidate pairs stay ~constant while the
    probed index grows 10x — exactly the regime where a corpus-
    proportional per-batch term would show."""
    from swiftbulkuploader_spark.catalog import load_table
    from swiftbulkuploader_spark.operators.dedup import (
        build_frozen_substrates,
        incremental_screen,
    )

    small = load_table(spark, SF_DIR, "documents")
    big = load_table(spark, out_dir, "documents")
    batch = small.filter((F.col("doc_id") % 5) == 0).localCheckpoint(
        eager=True
    )
    out = {}
    for tag, docs in (("sf01", small), ("10x", big)):
        frozen = docs.filter((F.col("doc_id") % 5) != 0)
        probes = frozen.filter(F.col("doc_id") < 100)
        t0 = time.time()
        subs = build_frozen_substrates(frozen, probes, materialize=True)
        out[f"build_{tag}_sec"] = round(time.time() - t0, 3)
        best = float("inf")
        for _ in range(2):
            t1 = time.time()
            incremental_screen(batch, substrates=subs).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.time() - t1)
        out[f"screen_{tag}_sec"] = round(best, 3)
    out["screen_ratio"] = round(
        out["screen_10x_sec"] / out["screen_sf01_sec"], 2
    )
    out["build_ratio"] = round(
        out["build_10x_sec"] / out["build_sf01_sec"], 2
    )
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale10"
    # spark.ui on: the close-out table meters per-stage task spread at the
    # 10x point via the UI REST API (r11 verdict ask #7 — a query can hold
    # wall ratio <= 10 while hiding a growing straggler)
    spark = get_spark("scale10_bench",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    sentinel = os.path.join(out_dir, "_GENERATED")
    if not os.path.exists(sentinel):
        for t in TABLES:
            _replicate(spark, t, out_dir)
        with open(sentinel, "w") as fh:
            fh.write(f"REP={REP} from {SF_DIR}\n")

    # warm both catalogs
    registry.QUERIES["a1_total_count"](spark, SF_DIR).collect()

    from tools.scaling_probe import _max_task_spread, _stage_ids

    rows = {}
    for name in TOP10:
        s1 = _time_query(spark, name, SF_DIR)
        marker = _stage_ids(spark)
        s10 = _time_query(spark, name, out_dir)
        # 20 ms median floor: spread over jitter-dominated sub-second
        # stages is scheduler noise, not skew (see _max_task_spread)
        spread = _max_task_spread(spark, marker, min_med_ms=20)
        rows[name] = {
            "sec_sf01": round(s1, 3),
            "sec_10x": round(s10, 3),
            "ratio": round(s10 / s1, 2),
            # worst max/median task runtime over the 10x run's stages —
            # None when every stage is trivial (sub-8-task or <500 ms)
            "task_spread_10x": (round(spread, 1)
                                if spread is not None else None),
        }
    rows["x1_incremental_dedup_asym"] = _incremental_asym(spark, out_dir)
    print(json.dumps({"rep": REP, "queries": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
