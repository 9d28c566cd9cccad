"""Generate PLANS.md: physical-plan inventory for every contract query.

For each __spark_entry__.queries() entry: exchanges (shuffles), join
strategies, whether filters pushed into the scan, and codegen presence —
the at-a-glance evidence that the plans are the ones a 100 TB deployment
wants. Regenerate after operator changes:

    python tools/plan_inventory.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftbulkuploader_spark.session import get_spark  # noqa: E402
from swiftbulkuploader_spark import registry  # noqa: E402
from bench import MEMOIZED_OUTPUT as BENCH_MEMOIZED_OUTPUT  # noqa: E402


# queries whose plan deliberately broadcasts a BOUNDED build side into a
# nested-loop join (1-row global aggregates, fixed small query batches) —
# O(n * k) with k constant by construction, not a quadratic accident; the
# bound is documented in each query's docstring
BOUNDED_BNLJ_OK = {
    "x6_conformal_bounds",     # two 1-row broadcasts (fit coefficients,
                               # calibration quantile)
    "x6_equiwidth_histogram",  # 1-row min/max bounds
    "x2_knn_join",             # fixed 8-vector query batch
    "x6_drift_metrics",        # 1-row midpoint + 1-row totals
    "x7_funnel_steps",         # three 1-row stage counters cross-joined
    "x1_contamination",        # bounded broadcast probe set (8 rows); the
                               # unbounded-probe plan is x1_contamination_indexed
    "x10_training_manifest",   # same bounded probe broadcast, inside the
                               # composed decontamination stage
    "x6_hll_mergeable",        # 1-row exact-global-distinct attached to the
                               # 3-row per-flag sketch table (tolerance check)
    "x1_semantic_dedup",       # 32-row broadcast centroid table cross-joined
                               # for the cluster assignment
    "x2_reindex_partial",      # k' <= 16-row flagged replacement-centroid
                               # frame cross-joined into the flagged-member
                               # re-quantization (bounded by n_list)
    "x3_unigram_logprob",      # 1-row corpus totals (N, V) cross-joined into
                               # the per-token scorer
    "x3_bigram_logprob",       # same 1-row vocab-size broadcast, bigram scorer
    "x3_bm25_search",          # 1-row avgdl cross-joined into the scorer
    "x2_pq_codes",             # 128-row (m, k, centroid) codebook broadcast
    "x2_pq_topk",              # same codebook broadcast as x2_pq_codes
    "x2_ivf_pq_topk",          # same codebook broadcast, over the
                               # probe-pruned subset (IVFADC)
    "x2_ivf_kmeans_topk",      # k=16-row refined-centroid table broadcast
                               # into the Lloyd assignment cross join
    "x6_dsir_select",          # 1-row corpus/target totals cross-joined into
                               # the B-row log-ratio table (ScalarSubquery
                               # pattern, same class as x3_unigram_logprob)
    "x1_source_overlap",       # n_sources^2 pair matrix over the per-source
                               # SIZE AGGREGATE (a few dozen rows at any
                               # corpus scale), non-equi < join
    "x8_assortativity",        # two 1-row graph summaries (node stats x edge
                               # corr) cross-joined for the single-row report
    "x2_knn_accuracy",         # 32-row broadcast centroid table cross-joined
                               # for the cluster assignment (the
                               # x1_semantic_dedup pattern)
    "x2_mutual_knn",           # adaptive-k (>= 16)-row broadcast centroid
                               # table cross-joined for the cluster
                               # assignment (x1_semantic_dedup pattern; the
                               # node became inventory-visible when change
                               # 22 exposed the memoized base's lineage —
                               # the former eager checkpoint hid it)
    "x6_poisson_bootstrap",    # 1-row corpus mean x 1-row bootstrap stats
                               # cross-joined for the single-row CI report
    "x6_bootstrap_diff_ci",    # same shape, two-arm twin: 1-row replica
                               # stats x BOOT_B=32-row diff table
    "x1_lsh_recall_eval",      # three 1-row pair-set summaries cross-joined
                               # for the single-row recall report
    "x1_simhash_recall_eval",  # same three 1-row summaries, SimHash side

    "x6_ks_drift",             # 1-row (midpoint, lo, hi) bounds broadcast +
                               # 1-row totals joined into the 64-bin CDF
    "x3_pmi_cooccurrence",     # 1-row corpus token total cross-joined into
                               # the PMI scorer
    "x3_ccnet_bucket",         # same 1-row (corpus_n, vocab_v) totals
                               # broadcast as x3_unigram_logprob, feeding the
                               # per-language xent scorer
    "x3_stupid_backoff",       # 1-row train-token total (N) cross-joined
                               # into the trigram scorer
    "x6_kmv_distinct",         # 1-row bottom-k summary x 1-row exact count
                               # (two scalar aggregates combined)
    "x8_hits",                 # four 1-row L1 normalizers (one per HITS
                               # half-round) cross-joined into the score
                               # frames — metadata-size build sides
    "x8_triangle_count",       # three 1-row scalar frames (node/edge/triangle
                               # totals) combined into the report row
    "x2_cluster_quality",      # k=16-row centroid broadcast (assignment) +
                               # k x k centroid pair matrix — both bounded
    "x6_doremi_weights",       # 1-row (corpus_n, vocab_v) totals broadcast
                               # into the per-token scorer (ScalarSubquery
                               # pattern, same class as x3_unigram_logprob)
    "x6_jsd_sources",          # 1-row global-token-total broadcast into the
                               # vocab-bounded cell table (round-8 swap of
                               # the former all-partition window)
    "x8_modularity",           # two 1-row totals (m, sum_dsq) cross-joined
                               # into the bounded per-source report
    "x2_pq_distortion",        # 128-row codebook broadcast (_pq_best_frame)
                               # + 1-row total into the 8-row report
    "x6_chi2_keywords",        # 1-row grand-total broadcast into the
                               # vocab-bounded cell table (jsd pattern)
    "x2_mmd_drift",            # MMD_N=256-row sample cross joins (the
                               # quadratic kernel is bounded by design)
                               # + 1-row kernel-mean combinations
    "x7_kaplan_meier",         # 1-row N total cross-joined into the
                               # seconds-grid histogram (ScalarSubquery
                               # pattern; round-8 two-level rewrite)
    "x4_json_schema_profile",  # 1-row corpus-total broadcast into the
                               # bounded per-key profile
    "x3_unigram_train",        # 1-row vocab-total broadcast per EM round
                               # (ScalarSubquery pattern) into the
                               # vocab-bounded piece table
    "x3_unigram_encode",       # same 1-row totals, consumed through the
                               # memoized trained-vocab substrate
    "x3_tokenizer_compare",    # same unigram-vocab lineage totals, plus
                               # the BPE substrate (both memoized)
    "x1_incremental_dedup",    # bounded eval-probe broadcast (the
                               # x1_contamination class, <= 80 rows)
    "x10_mixture_schedule",    # MIX_EPOCHS=4-row epoch frame broadcast
                               # into the per-source aggregate
    "x2_ivf_probe_sweep",      # per sweep point: 1-row scanned x 1-row
                               # hits x 1-row total combined (the
                               # x1_lsh_recall_eval report class)
    "x6_power_analysis",       # 1-row arms x 3-row lift grid (bounded
                               # broadcast, the x6_ab_test family)
    "x1_url_robots",           # 6-row broadcast policy table, startswith
                               # non-equi match (RFC 9309 longest-prefix)
    "x10_crawl_manifest",      # the same 6-row robots policy BNLJ, now
                               # composed in front of the manifest stages
    "x8_lpa_modularity",       # 1-row edge total cross-joined into the
                               # bounded per-community report
    "x6_power_means",          # 1-row control moments x 3-row lift grid
                               # (the x6_power_analysis class)
}

# Deliberate CartesianProduct plans over BOUNDED sides (both inputs fixed
# sample/constant frames, never corpus-sized) — the r13-opt MMD kernel
# pins shuffle_replicate_nl precisely so the 64-term unrolled kernel
# aggregation plans OUTSIDE whole-stage codegen (the HotSpot
# HugeMethodLimit cliff; OPTIMIZATION_r13.md change 1).
BOUNDED_CARTESIAN_OK = {
    "x2_mmd_drift",            # 256-row persisted sample x itself (the
                               # fused symmetric kernel pair frame)
}


# queries whose plan deliberately contains EXACT percentile state (grows
# with distinct values — the plan this engine refuses at 100 TB except
# where the exactness IS the contract). Everything else gets flagged
# EXACT-PCTL!, so a composed pipeline can never silently acquire an exact
# percentile the way the BNLJ allowlist guards quadratic joins.
EXACT_PERCENTILE_OK = {
    "x6_conformal_bounds",     # exact calibration quantile at test scale;
                               # approx_percentile is the documented
                               # approximately-valid 100 TB swap
    "x6_quantiles",            # the exact-percentile contract query itself
                               # (scale default is the GK sketch twin, which
                               # is what bench.py times)
    "x6_group_quantiles",      # per-group exact quartiles, same contract
    "x6_median_disc",          # percentile_disc semantics query
    "x6_quantiles_approx",     # tolerance twin: computes exact AND sketch
                               # to bound the sketch error
    "x6_approx_profile",       # tolerance twin (HLL/GK vs exact)
    "x6_dataset_card",         # exact-p50 test-scale card; the sketch card
                               # is the registered scale/bench default
    "x6_dataset_card_approx",  # tolerance twin of the sketch card
    "x6_outlier_profile",      # Tukey fences: exact quartiles keep the
                               # DuckDB oracle bit-comparable; swap
                               # percentile_approx at 100 TB (SCALING.md)
    "w9_sliding_median",       # exact median over a ROWS-bounded 10-row
                               # frame: state is O(frame), not O(distinct)
    "x7_mad_anomaly",          # exact median/MAD over the rollup-bounded
                               # per-type hourly series (~10^4 rows per
                               # type-year; approx_percentile at 100 TB,
                               # the x6_outlier_profile contract)
    "x6_winsorized_stats",     # p05/p95 clamp bounds: exact percentile
                               # keeps the DuckDB oracle bit-comparable
                               # (round-to-6dp-before-decision parity);
                               # swap approx_percentile at 100 TB — the
                               # x6_outlier_profile contract (SCALING.md)
}

# exact percentile / percentile_disc in a physical plan; must NOT match
# approx_percentile / percentile_approx
_EXACT_PCTL = re.compile(r"(?<![\w_])percentile(_disc)?\(")

# the interpreted-HOF winnowing selection signature: a window-min over
# array slices (transform(sequence(...), array_min(slice(...)))). The only
# query allowed to carry it is the DuckDB-replayable oracle twin — every
# OTHER consumer (composed pipelines, corpus prep) must use the Arrow form
# `winnowing_stats_arrow` (measured 26x faster at 10M docs, SCALING.md), so
# the shape is flagged HOF-WINNOW! anywhere else (round-7 guard, same
# pattern as EXACT-PCTL).
HOF_WINNOW_OK = {
    "x1_winnowing_fingerprints",  # the oracle twin itself
}
_HOF_WINNOW = re.compile(r"array_min\(slice\(")

# queries whose plan deliberately contains an UNPARTITIONED ordered/global
# window (WindowExec moves its whole input to ONE task). Allowed only when
# the window's input is bounded BY CONSTRUCTION (a fixed replica count, a
# top-k row limit, or a coarse-bucket partial table whose size is
# calendar/grid-bounded, independent of row count) — the bound is stated
# here and in each query's docstring. Everything else gets UNPART-WIN!
# (round-8 guard; the round-7 x7_kaplan_meier exact-microsecond histogram
# is the defect class this mechanically bans).
BOUNDED_WINDOW_OK = {
    "x6_poisson_bootstrap",   # 32 bootstrap-replica rows (fixed B)
    "x6_bootstrap_diff_ci",   # same 32 replica-diff rows (fixed B)
    "x6_hill_tail",           # top-101 order statistics (bounded top-k)
    "x2_hybrid_search",       # two HYBRID_POOL=50-row candidate pools
                              # (TakeOrderedAndProject before the ranks)
    "x2_ndcg_eval",           # top-10 ranking rows per query (bounded k)
    "x2_mips_topk",           # rank windows over the MIPS_K=10-row
                              # TakeOrderedAndProject result
    "x3_vocab_growth",        # corpus_size/50-bucket growth curve —
                              # 5 orders of magnitude below corpus rows
    "x3_zipf_fit",            # top-ZIPF_TOP_R=1000 head ranks
    "x6_class_balanced_weights",  # global share over the per-CLASS
                              # aggregate (bounded label alphabet)
    "x6_dataset_card",        # corpus-share window over the ~n_sources
                              # aggregate rows
    "x6_bh_fdr",              # BH rank/threshold/q windows over the
                              # per-METRIC aggregate (bounded event_type
                              # alphabet — the class_balanced class)
    "x2_index_staleness",     # fresh-floor window over the 2k-row
                              # (scenario x N_CENTROIDS=16) cluster frame
    "x2_reindex_partial",     # drift-flag window over the k-row
                              # (N_CENTROIDS=16) cluster frame
    "x6_doremi_weights",      # global windows over the per-DOMAIN
                              # aggregate (bounded domain count)
    "x6_hll_mergeable",       # 3-row per-flag sketch table union
    "x6_ks_drift",            # cumulative CDF over the fixed 64-bin grid
    "x6_source_mixing",       # global share over the per-SOURCE aggregate
    "x7_entropy_rate",        # <= |event_types|^2-cell transition matrix
                              # (bounded category alphabet)
    "x6_sequential_monitor",  # cumulative windows over the ~720-row
                              # hourly rollup (kaplan_meier class)
    "x6_mann_whitney",        # cumulative rank window over the DISTINCT-
                              # VALUE histogram of a small-integer metric
                              # (events/user), not the user table
    "x7_kaplan_meier",        # hour-bucket partial tables of the two-level
                              # prefix sums (one row per calendar hour of
                              # duration span; within-bucket windows ARE
                              # partitioned, <= 3600 rows each)
    "x2_label_auc",           # bucket-level window of the two-level rank
                              # prefix over the 6-dp score grid (<= 2001
                              # partial rows; within-bucket windows ARE
                              # partitioned, <= 1000 rows each)
    "x9_media_segment_plan",  # packing cumsum over the synth_media frame
                              # (200 rows by construction; the production
                              # form shards like x3_pack_sequences)
    "x10_epoch_plan",         # lang-level offset window of the two-level
                              # chunk cumsum (one row per language;
                              # within-lang windows ARE partitioned)
}

# Queries whose RESULT is a session-memoized persisted frame (the
# steady-state plan is nothing but Project/Filter over an
# InMemoryTableScan — no join/aggregate/window/generator computes
# anything per call). Allowed ONLY when bench.py reports their FIRST-rep
# (build) time instead of the warm readback median (bench.MEMOIZED_OUTPUT
# — imported below so the two lists cannot drift): a memoized-output
# query outside that set would let the r13-verdict "What's wrong #2"
# class silently grow (ask #10), so it gets the hard MEMOIZED-OUTPUT!
# flag. Substrate memos whose consumers still run per-call work
# (aggregations, joins, closures) are NOT in this class and stay
# unflagged — that is the ordinary warm-bench semantics.
_TRIVIAL_NODES = {
    "AdaptiveSparkPlan", "ResultQueryStage", "Project", "Filter",
    "InMemoryTableScan", "ColumnarToRow",
}


def _is_memoized_output(plan: str) -> bool:
    """True if the OUTER physical plan (the tree section above the first
    InMemoryRelation line — everything below it is the cached lineage,
    which legitimately contains joins/aggregates) consists solely of
    trivial nodes over >= 1 InMemoryTableScan. Truncation at the first
    InMemoryRelation is sound: any non-trivial outer node is an ancestor
    of some leaf and prints before the first leaf's cached lineage."""
    lines = plan.splitlines()
    outer_nodes: list[str] = []
    saw_imr = False
    for ln in lines:
        if "InMemoryRelation" in ln:
            saw_imr = True
            break
        # node lines carry a "(n)" id but NOT necessarily right after the
        # node name — "BroadcastHashJoin Inner BuildRight (293)" — so the
        # name is the first token and the id may follow qualifiers (the
        # first cut anchored the id to the name and silently missed every
        # qualified join, flagging 13 join-ful plans as memoized-output)
        m = re.match(
            r"^[\s+:\-]*(?:\* )?([A-Za-z][A-Za-z0-9]*)\b[^(]*\(\d+\)", ln
        )
        if m:
            outer_nodes.append(m.group(1))
    return (
        saw_imr
        and "InMemoryTableScan" in outer_nodes
        and all(n in _TRIVIAL_NODES for n in outer_nodes)
    )


# windowspecdefinition(part..., order... ASC/DESC NULLS ..., specifiedwindowframe(...))
_WINDOWSPEC = re.compile(r"windowspecdefinition\(")
_DIRECTION = ("ASC NULLS FIRST", "ASC NULLS LAST",
              "DESC NULLS FIRST", "DESC NULLS LAST")


def _has_unpartitioned_window(plan: str) -> bool:
    """True if any window spec in the plan has no partition columns (every
    pre-frame argument carries a sort direction, or there are none — the
    global-window case). Paren-aware top-level split so expression
    arguments with embedded commas don't confuse the check."""
    for m in _WINDOWSPEC.finditer(plan):
        i, depth = m.end(), 1
        args, cur = [], []
        while i < len(plan) and depth > 0:
            ch = plan[i]
            if ch == "(":
                depth += 1
                cur.append(ch)
            elif ch == ")":
                depth -= 1
                if depth > 0:
                    cur.append(ch)
            elif ch == "," and depth == 1:
                args.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
            i += 1
        if cur:
            args.append("".join(cur).strip())
        pre = [a for a in args if not a.startswith("specifiedwindowframe")]
        if not any(not a.endswith(_DIRECTION) for a in pre):
            return True
    return False


def _rest_jobs(spark) -> dict[int, tuple[int, int]]:
    """jobId -> (numCompletedStages, numSkippedStages) via the UI REST
    API (the inventory session enables the UI for exactly this). Empty
    dict if the endpoint is unavailable."""
    import json as _json
    import urllib.request

    try:
        base = spark.sparkContext.uiWebUrl
        if not base:
            return {}
        with urllib.request.urlopen(
            f"{base}/api/v1/applications", timeout=5
        ) as r:
            app_id = _json.load(r)[0]["id"]
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/jobs", timeout=5
        ) as r:
            jobs = _json.load(r)
        return {
            j["jobId"]: (
                j.get("numCompletedStages", 0),
                j.get("numSkippedStages", 0),
            )
            for j in jobs
        }
    except Exception:  # noqa: BLE001
        return {}


def _executed_skipped(spark, fn, sf_dir) -> tuple[int, int] | None:
    """Execute a substrate-consumer query end-to-end (noop sink) and
    return (executed, skipped) stage counts summed over its jobs — the
    per-round automation of the round-8 manual UI-REST audit (r8 verdict
    ask #3). Two runs: a WARM run first (unrecorded) so the measured run
    sees every memoized substrate resident, the steady state every
    consumer after the first enjoys in a session — otherwise the count
    would depend on alphabetical position. None if the REST API is
    unavailable or execution fails."""
    try:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        before = _rest_jobs(spark)
        if not before:
            # the warm run just created jobs, so {} means REST is
            # unavailable — skip the measured run
            return None
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        after = _rest_jobs(spark)
        new = [v for k, v in after.items() if k not in before]
        return (
            sum(c for c, _ in new),
            sum(s for _, s in new),
        )
    except Exception:  # noqa: BLE001
        return None


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # UI on: the jobs REST endpoint is the executed/skipped stage meter
    spark = get_spark("plan_inventory",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    print("# PLANS — physical-plan inventory (auto-generated: tools/plan_inventory.py)")
    print()
    print(f"Every contract query's plan shape at `{sf_dir}`. Exchanges = shuffle")
    print("boundaries; joins list the strategies Catalyst chose; `pushed` marks")
    print("filters that reached the parquet scan; `codegen` marks whole-stage")
    print("codegen participation. BNLJ/CartesianProduct are flagged — except the")
    print("documented bounded-broadcast cases (1-row global aggregates, fixed")
    print("small query batches), where a broadcast nested-loop against a")
    print("constant-size build side is O(n*k) and is the intended plan, and")
    print("the documented bounded-cartesian cases (BOUNDED_CARTESIAN_OK:")
    print("fixed-size sample x sample pair frames pinned shuffle_replicate_nl")
    print("so their unrolled kernel aggregation plans outside whole-stage")
    print("codegen — the r13 HugeMethodLimit lesson).")
    print("EXACT percentile state (grows with distinct values) is likewise")
    print("flagged unless the query is in EXACT_PERCENTILE_OK (the exact-form")
    print("contract queries and the exact-vs-sketch tolerance twins), so a")
    print("composed pipeline can never silently acquire one. Row-at-a-time")
    print("Python (BatchEvalPython — a non-Arrow UDF) is flagged with NO")
    print("allowlist: Python touches data only via Arrow batches here.")
    print("The interpreted-HOF winnowing selection (array_min-over-slice")
    print("window minima, 26x slower than the Arrow form at 10M docs) is")
    print("flagged HOF-WINNOW! outside its oracle twin (HOF_WINNOW_OK), so")
    print("no composed pipeline can silently pick the interpreted form.")
    print("An UNPARTITIONED window (WindowExec funnels its whole input to")
    print("one task) is flagged UNPART-WIN! unless the query is in")
    print("BOUNDED_WINDOW_OK — windows whose input is bounded by")
    print("construction (fixed replica counts, top-k rows, coarse-bucket")
    print("partial tables), the round-8 guard for the kaplan-meier class.")
    print("A query whose steady-state plan is ONLY Project/Filter over an")
    print("InMemoryTableScan (the builder returns a session-memoized frame")
    print("— its warm bench reps measure cache readback, not computation)")
    print("is flagged MEMOIZED-OUTPUT! unless bench.py reports its cold")
    print("first-rep time (bench.MEMOIZED_OUTPUT — the r14 guard keeping")
    print("the r13-verdict memoized-output class from silently growing).")
    print("`exec/skip` is populated for MEMOIZED-SUBSTRATE consumers (plans")
    print("containing an InMemoryTableScan of a persisted shared base, e.g.")
    print("the all-pairs dup graph): the query is executed twice and the")
    print("second (steady-state) run's stage counts are read from the jobs")
    print("REST API — `executed/skipped`. A large planned-exchange count")
    print("next to a small executed count is lineage, not execution: the")
    print("substrate's stages are SKIPPED because its blocks are resident")
    print("(the round-8 manual audit, now automated per round).")
    print()
    print("| query | exchanges | joins | pushed filters | codegen | exec/skip | flags |")
    print("|---|---|---|---|---|---|---|")
    hard_flags = 0  # any '!'-suffixed flag => exit 1 (round-10 lint:
    # a round must never ship a PLANS.md with a live hard flag again)
    for name in sorted(registry.QUERIES):
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            print(f"| {name} | - | - | - | - | - | ERROR: {str(e)[:40]} |")
            continue
        n_exch = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(set(re.findall(r"(\w*Join\w*)", plan)) - {"Join"})
        pushed = "yes" if re.search(r"PushedFilters: \[(?!\])", plan) else "-"
        codegen = "yes" if "WholeStageCodegen" in plan or re.search(r"^\*", plan, re.M) else "-"
        flags = []
        if "BroadcastNestedLoopJoin" in plan:
            # bounded-broadcast joins are the intended plan (see header)
            if name in BOUNDED_BNLJ_OK:
                flags.append("bnlj-bounded-ok")
            else:
                flags.append("BNLJ!")
        if "CartesianProduct" in plan:
            flags.append("cartesian-bounded-ok"
                         if name in BOUNDED_CARTESIAN_OK else "CARTESIAN!")
        if _EXACT_PCTL.search(plan):
            flags.append("pctl-exact-ok" if name in EXACT_PERCENTILE_OK
                         else "EXACT-PCTL!")
        # row-at-a-time Python (non-Arrow UDF eval) is banned outright —
        # no allowlist: Python may touch data only via Arrow batches
        # (MapInPandas / ArrowEvalPython / FlatMapGroupsInPandas)
        if "BatchEvalPython" in plan:
            flags.append("ROW-PYUDF!")
        if _HOF_WINNOW.search(plan):
            flags.append("hof-winnow-twin-ok" if name in HOF_WINNOW_OK
                         else "HOF-WINNOW!")
        if _has_unpartitioned_window(plan):
            flags.append("win-bounded-ok" if name in BOUNDED_WINDOW_OK
                         else "UNPART-WIN!")
        if _is_memoized_output(plan):
            flags.append("memoized-output-cold-benched"
                         if name in BENCH_MEMOIZED_OUTPUT
                         else "MEMOIZED-OUTPUT!")
        exec_skip = "-"
        if "InMemoryTableScan" in plan:
            es = _executed_skipped(spark, registry.QUERIES[name], sf_dir)
            if es is not None:
                exec_skip = f"{es[0]}/{es[1]}"
        join_str = ", ".join(j.replace("Join", "") for j in joins) or "-"
        hard_flags += sum(1 for f in flags if f.endswith("!"))
        print(f"| {name} | {n_exch} | {join_str} | {pushed} | {codegen} | {exec_skip} | {' '.join(flags) or '-'} |")
    spark.stop()
    if hard_flags:
        print(f"\nHARD FLAGS: {hard_flags} — this inventory MUST NOT ship; "
              "fix the plan or allowlist with a documented scale swap.",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
