"""Substrate-liveness pins for the stats/eval families (r9 verdict ask
#6, the x6_ab_test lesson): an oracle match proves both engines AGREE,
not that the statistic carries signal — a rate pinned at 0/1, a NULL
t/z, a single populated bin, or an empty truth set can stay oracle-green
for rounds while measuring nothing. These pins assert non-degenerate
statistics at sf0.01 for every family the r9 audit flagged.

They run the REAL contract queries (not replicas), so a future substrate
or operator change that re-deadens a statistic fails here, not in a
judge's audit."""

from __future__ import annotations

import math

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as entry

    return entry.queries()


def _finite(x) -> bool:
    return x is not None and math.isfinite(x)


class TestStatsLiveness:
    def test_welch_ttest_live(self, spark, queries):
        rows = queries["x6_welch_ttest"](spark, SF).collect()
        assert rows
        for r in rows:
            assert r["n_a"] > 0 and r["n_b"] > 0
            assert _finite(r["t_stat"]) and r["t_stat"] != 0.0
            assert _finite(r["welch_df"]) and r["welch_df"] > 1
            assert _finite(r["mean_diff"]) and r["mean_diff"] != 0.0

    def test_label_auc_live(self, spark, queries):
        r = queries["x2_label_auc"](spark, SF).collect()[0]
        # both classes present AND the ranking is informative (an AUC of
        # exactly 0, 0.5 or 1 at this substrate would mean a degenerate
        # score or single-class labels)
        assert r["n_pos"] > 0 and r["n_neg"] > 0
        assert _finite(r["auc"]) and 0.0 < r["auc"] < 1.0
        assert r["auc"] != 0.5

    def test_calibration_bins_live(self, spark, queries):
        rows = queries["x6_calibration_bins"](spark, SF).collect()
        # the pre-r10 substrate put EVERY doc in one all-positive bin
        # (teacher z >= 0 labeled the whole corpus positive) — the exact
        # silent-saturation class this file exists to catch
        assert len(rows) >= 3, [r["bin"] for r in rows]
        fracs = [r["frac_pos"] for r in rows]
        assert any(0.0 < f < 1.0 for f in fracs), fracs
        assert any(f == 0.0 or f < 0.5 for f in fracs), fracs
        assert any(f == 1.0 or f > 0.5 for f in fracs), fracs
        n_pos = sum(r["frac_pos"] * r["n"] for r in rows)
        n = sum(r["n"] for r in rows)
        assert 0 < round(n_pos) < n  # both teacher classes live

    def test_lsh_recall_eval_live(self, spark, queries):
        r = queries["x1_lsh_recall_eval"](spark, SF).collect()[0]
        # a zero-truth eval (0/0 recall) verifies nothing; recall = 1.0
        # itself is a legitimate measurement on the seeded-clone corpus
        assert r["n_truth"] > 0
        assert r["n_candidates"] > 0
        assert _finite(r["recall"]) and r["recall"] > 0.0
        assert _finite(r["precision_vs_truth"]) and r["precision_vs_truth"] > 0.0

    def test_mutual_information_live(self, spark, queries):
        r = queries["x6_mutual_information"](spark, SF).collect()[0]
        assert r["n"] > 0
        assert _finite(r["mi"]) and r["mi"] > 0.0
        assert _finite(r["h_row"]) and r["h_row"] > 0.0
        assert _finite(r["h_col"]) and r["h_col"] > 0.0
        # NMI strictly inside (0, 1): 0 = independent cells only, 1 =
        # deterministic mapping — both would mean a dead contingency
        assert 0.0 < r["nmi"] < 1.0

    def test_quality_train_live(self, spark, queries):
        """The retrained student must beat the base rate (the pre-r10
        teacher labeled everything positive, making accuracy trivially
        1.0 — now acc ~0.9 vs base ~0.56 is a real fit)."""
        r = queries["x3_quality_train"](spark, SF).collect()[0]
        assert 0.6 < r["acc"] < 1.0
        assert any(abs(r[f"w{j}"]) > 0.01 for j in range(4))

    def test_ab_test_live(self, spark, queries):
        """Regression pin for the original x6_ab_test catch: both arms'
        conversion rates strictly inside (0, 1) and a finite z."""
        rows = queries["x6_ab_test"](spark, SF).collect()
        assert rows
        for r in rows:
            for c in r.asDict():
                if c.endswith("rate") or c in ("p_a", "p_b"):
                    v = r[c]
                    if v is not None:
                        assert 0.0 < v < 1.0, (c, v)
        zcols = [c for c in rows[0].asDict() if "z" in c.lower()]
        assert any(_finite(r[c]) and r[c] != 0 for r in rows for c in zcols)

    def test_bootstrap_diff_ci_live(self, spark, queries):
        """Uplift CI liveness: both arms populated, a nonzero diff, a
        strictly ordered interval, and a nonzero bootstrap SE."""
        r = queries["x6_bootstrap_diff_ci"](spark, SF).collect()[0]
        assert r["n_a"] > 0 and r["n_b"] > 0
        assert _finite(r["diff"]) and r["diff"] != 0.0
        assert _finite(r["boot_se"]) and r["boot_se"] > 0.0
        assert _finite(r["ci_lo"]) and _finite(r["ci_hi"])
        assert r["ci_lo"] < r["ci_hi"]

    def test_phash_dedup_live(self, spark, queries):
        """Image near-dup pairs exist, at small Hamming, and are a
        strict subset of the corpus (not everything matches)."""
        rows = queries["x9_phash_dedup"](spark, SF).collect()
        assert len(rows) > 0
        assert all(0 <= r["hamming"] <= 3 for r in rows)
        ids = {r["a"] for r in rows} | {r["b"] for r in rows}
        assert len(ids) < 400  # far from all 500 docs pairing up

    def test_cuped_live(self, spark, queries):
        """CUPED liveness: a nonzero covariate relationship and a
        variance reduction strictly inside [0, 1)."""
        r = queries["x6_cuped_adjust"](spark, SF).collect()[0]
        assert r["n_a"] > 0 and r["n_b"] > 0
        assert _finite(r["theta"]) and r["theta"] != 0.0
        assert _finite(r["diff_raw"]) and _finite(r["diff_cuped"])
        assert r["diff_cuped"] != r["diff_raw"]  # adjustment applied
        assert 0.0 <= r["var_reduction"] < 1.0

    def test_sequential_monitor_live(self, spark, queries):
        """Sequential monitor liveness: a full hourly grid, finite z on
        the later hours, a strictly decreasing boundary, and not every
        hour crossing (the boundary must bind early)."""
        rows = sorted(queries["x6_sequential_monitor"](spark, SF).collect(),
                      key=lambda r: r["hour"])
        assert len(rows) > 100
        assert all(_finite(r["z"]) and r["z"] != 0.0 for r in rows[5:])
        bs = [r["boundary"] for r in rows]
        assert all(a > b for a, b in zip(bs, bs[1:]))
        crossed = sum(1 for r in rows if r["crossed"])
        assert crossed < len(rows)

    def test_srm_check_live(self, spark, queries):
        """SRM liveness: BOTH flag polarities must be reachable — the
        healthy split stays under the critical value with every arm
        populated, the simulated t2 logging loss crosses it."""
        rows = {r["scenario"]: r for r in
                queries["x6_srm_check"](spark, SF).collect()}
        h, b = rows["healthy"], rows["broken"]
        for r in (h, b):
            assert r["obs_control"] > 0 and r["obs_t1"] > 0 and r["obs_t2"] > 0
            assert _finite(r["chi2"]) and r["chi2"] > 0.0
        assert not h["srm"]
        assert b["srm"]
        assert b["obs_t2"] < h["obs_t2"]          # the loss is one-sided
        assert b["obs_control"] == h["obs_control"]

    def test_diff_in_diff_live(self, spark, queries):
        """DiD liveness: all four (treat x period) cells populated,
        distinct cell means (no constant-metric degeneracy), a positive
        standard error and a finite nonzero t."""
        r = queries["x6_diff_in_diff"](spark, SF).collect()[0]
        assert min(r["n00"], r["n01"], r["n10"], r["n11"]) > 0
        means = [r["m_c_pre"], r["m_c_post"], r["m_t_pre"], r["m_t_post"]]
        assert all(_finite(m) for m in means)
        assert len(set(means)) == 4
        assert _finite(r["se"]) and r["se"] > 0.0
        assert _finite(r["t_stat"]) and r["t_stat"] != 0.0
        assert _finite(r["did"]) and r["did"] != 0.0

    def test_mann_whitney_live(self, spark, queries):
        """Rank-sum liveness: both arms populated, U strictly inside its
        (0, n_a*n_b) range (all-ties or disjoint-support would pin it at
        an edge), positive tie-corrected sigma, finite nonzero z."""
        r = queries["x6_mann_whitney"](spark, SF).collect()[0]
        assert r["n_a"] > 0 and r["n_b"] > 0
        assert 0.0 < r["u_a"] < float(r["n_a"] * r["n_b"])
        assert _finite(r["sigma_u"]) and r["sigma_u"] > 0.0
        assert _finite(r["z_stat"]) and r["z_stat"] != 0.0

    def test_json_diff_live(self, spark, queries):
        """JSON diff liveness: added/removed fire exactly on the %4
        class (tag -> fmt swap), rev always changes, and n_changed
        spans more than one value (lang/n classes interleave)."""
        rows = queries["x4_json_diff"](spark, SF).collect()
        assert rows
        for r in rows:
            if r["doc_id"] % 4 == 0:
                assert r["added_keys"] == "fmt" and r["removed_keys"] == "tag"
            else:
                assert r["n_added"] == 0 and r["n_removed"] == 0
            assert "rev" in r["changed_keys"]
        assert len({r["n_changed"] for r in rows}) >= 3

    def test_winsorized_stats_live(self, spark, queries):
        """Robust-mean liveness: tails actually clamp (~5% each side),
        the winsorized and trimmed means genuinely differ from the raw
        mean, and ordering is coherent (clamping pulls the mean toward
        the core)."""
        rows = queries["x6_winsorized_stats"](spark, SF).collect()
        assert rows
        for r in rows:
            assert r["n_clamped_low"] > 0 and r["n_clamped_high"] > 0
            frac = (r["n_clamped_low"] + r["n_clamped_high"]) / r["n"]
            assert 0.05 < frac < 0.15
            assert r["mean_winsorized"] != r["mean_raw"]
            assert r["mean_trimmed"] != r["mean_raw"]
            assert r["p05"] < r["mean_trimmed"] < r["p95"]

    def test_anova_live(self, spark, queries):
        """ANOVA liveness: several groups, positive SS decomposition,
        finite nonzero F, effect size strictly inside (0, 1)."""
        r = queries["x6_anova_oneway"](spark, SF).collect()[0]
        assert r["k"] >= 2 and r["n"] > r["k"]
        assert r["ss_between"] > 0.0 and r["ss_within"] > 0.0
        assert _finite(r["f_stat"]) and r["f_stat"] > 0.0
        assert 0.0 < r["eta_sq"] < 1.0

    def test_power_means_live(self, spark, queries):
        """Continuous-power liveness: positive control mean/variance,
        finite monotone requirements (smaller lift -> more users), a
        live MDE, and NOT every lift trivially achievable."""
        rows = sorted(queries["x6_power_means"](spark, SF).collect(),
                      key=lambda r: r["lift"])
        assert len(rows) == 3
        for r in rows:
            assert r["mean_control"] > 0.0 and r["var_control"] > 0.0
            assert r["n_required"] is not None and r["n_required"] > 0
            assert _finite(r["mde_rel"]) and r["mde_rel"] > 0.0
        reqs = [r["n_required"] for r in rows]
        assert reqs[0] > reqs[1] > reqs[2]
        assert not all(r["achievable_now"] for r in rows)


class TestGraphLiveness:
    """Argmax/label outputs on the co-purchase projection (r10 verdict
    ask #8, the x6_ab_test / dominant_bin lesson): an oracle match
    can't tell a live community structure from a collapsed one — pin
    >1 distinct label, genuine coalescence, modularity strictly inside
    (0, 1), and non-degenerate hub/authority spread at BOTH small SFs,
    so a future substrate change can't silently deaden the family
    while staying oracle-green."""

    SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    @pytest.mark.parametrize("sf", SFS)
    def test_label_propagation_live(self, spark, queries, sf):
        rows = queries["x8_label_propagation"](spark, sf).collect()
        assert rows
        labels = {r["label"] for r in rows}
        # more than one community, AND labels genuinely coalesced
        # (fewer labels than nodes — LPA actually propagated)
        assert len(labels) > 1
        assert len(labels) < len(rows)

    @pytest.mark.parametrize("sf", SFS)
    def test_lpa_modularity_live(self, spark, queries, sf):
        rows = queries["x8_lpa_modularity"](spark, sf).collect()
        assert len(rows) > 1          # >1 community scored
        q_total = sum(r["q_term"] for r in rows)
        # better than random degree-matched wiring, below the
        # theoretical ceiling: strictly inside (0, 1)
        assert _finite(q_total) and 0.0 < q_total < 1.0
        for r in rows:
            assert r["n_nodes"] > 0 and r["d_tot"] > 0
            assert r["e_in"] >= 0

    @pytest.mark.parametrize("sf", SFS)
    def test_hits_live(self, spark, queries, sf):
        rows = queries["x8_hits"](spark, sf).collect()
        hub = [r["score"] for r in rows if r["role"] == "hub"]
        auth = [r["score"] for r in rows if r["role"] == "auth"]
        # both roles populated with strictly positive finite scores
        assert len(hub) > 1 and len(auth) > 1
        assert all(_finite(s) and s > 0.0 for s in hub + auth)
        # L1-normalized per role (the fixed-point scale contract)
        assert abs(sum(hub) - 1.0) < 1e-9
        assert abs(sum(auth) - 1.0) < 1e-9
        # non-degenerate spread: a flat score vector means the graph
        # carried no preference signal (the dominant_bin defect class)
        assert max(hub) > min(hub) * 1.1
        assert max(auth) > min(auth) * 1.1

    @pytest.mark.parametrize("sf", SFS)
    def test_bfs_layers_live(self, spark, queries, sf):
        """Every BFS layer 0..3 populated at both small SFs — a seed-set
        or projection change that strands the frontier in round 1 would
        stay oracle-green while measuring nothing."""
        rows = queries["x8_bfs_layers"](spark, sf).collect()
        dists = {}
        for r in rows:
            dists[r["dist"]] = dists.get(r["dist"], 0) + 1
        assert set(dists) == {0, 1, 2, 3}, dists
        assert all(v > 0 for v in dists.values())



class TestRound13Liveness:
    def test_local_bridges_both_flags_live(self, spark, queries):
        """Both bridge verdicts must occur on the natural substrate
        (embedded triangle edges AND single-evidence bridges), else the
        triage flag is decorative (the argmax/flag liveness class,
        CLAUDE.md 12b)."""
        rows = queries["x8_local_bridges"](spark, SF).collect()
        assert rows
        assert {r["is_local_bridge"] for r in rows} == {True, False}
        for r in rows:
            assert r["deg_a"] >= 1 and r["deg_b"] >= 1
            assert r["embeddedness"] >= 0
            assert 0.0 <= r["support"] <= 1.0
            assert r["is_local_bridge"] == (r["embeddedness"] == 0)

    def test_bridge_fragments_both_verdicts_live(self, spark, queries):
        """Both split verdicts must occur (2-cliques shatter, triangles
        hold) and the bookkeeping must be conservative."""
        rows = queries["x8_bridge_fragments"](spark, SF).collect()
        assert rows
        assert {r["splits"] for r in rows} == {True, False}
        for r in rows:
            assert r["size_before"] >= 2
            assert 1 <= r["n_fragments"] <= r["size_before"]
            assert 1 <= r["max_fragment"] <= r["size_before"]
            assert r["splits"] == (r["n_fragments"] > 1)
            if r["n_bridges"] == 0:
                assert not r["splits"]

    def test_conformal_bounds_live(self, spark, queries):
        """Coverage strictly inside (0, 1) near the nominal level, an
        informative interval, and a real fit."""
        r = queries["x6_conformal_bounds"](spark, SF).collect()[0]
        assert r["n_cal"] > 0 and r["n_test"] > 0
        assert _finite(r["slope"]) and r["slope"] != 0.0
        assert _finite(r["q_hat"]) and r["q_hat"] > 0.0
        assert 0.0 < r["coverage"] < 1.0
        assert 0.8 <= r["coverage"] <= 0.99   # near-nominal, not saturated

    def test_longest_span_profile_live(self, spark, queries):
        """The variable-length signal must actually vary: spans at
        >= LSS_K with real spread, run bookkeeping self-consistent."""
        from swiftbulkuploader_spark.operators.dedup import LSS_K

        rows = queries["x1_longest_shared_span"](spark, SF).collect()
        assert rows
        spans = [r["longest_span_tokens"] for r in rows]
        assert min(spans) >= LSS_K
        assert min(spans) < max(spans)          # variance, not a constant
        for r in rows:
            assert r["n_matched_grams"] >= r["n_islands"] >= 1
            assert (r["longest_span_tokens"]
                    <= r["n_matched_grams"] + LSS_K - 1)

    def test_adjusted_effect_both_flags_live(self, spark, queries):
        """Both confounding verdicts must occur on the natural substrate
        (the scenario-pair discipline): the confounded rollout's gap
        clears the threshold with an order of magnitude to spare, the
        randomized split stays an order of magnitude under it, and the
        adjusted estimate actually removes the composition bias."""
        from swiftbulkuploader_spark.operators.stats_inference import (
            CFD_GAP_THRESH,
        )

        rows = {r["scenario"]: r
                for r in queries["x6_adjusted_effect"](spark, SF).collect()}
        assert set(rows) == {"randomized", "confounded"}
        for r in rows.values():
            assert r["n_treat"] > 0 and r["n_control"] > 0
        c, r = rows["confounded"], rows["randomized"]
        assert c["confounded"] and not r["confounded"]
        assert abs(c["confound_gap"]) > 2 * CFD_GAP_THRESH
        assert abs(r["confound_gap"]) < CFD_GAP_THRESH / 2
        # adjustment works: the adjusted estimate is far closer to the
        # (true-null) zero effect than the crude one in the biased world
        assert abs(c["adjusted_effect"]) < abs(c["crude_effect"]) / 10

    def test_k_anonymity_ladder_live(self, spark, queries):
        """Both policy-flag polarities on the natural substrate: the
        finest level is never k-anonymous, the coarsest always is, risk
        falls monotonically as the ladder generalizes, and every level
        accounts for the whole table."""
        rows = {r["level"]: r
                for r in queries["x6_k_anonymity"](spark, SF).collect()}
        assert set(rows) == {0, 1, 2}
        assert not rows[0]["k_anonymous"]
        assert rows[2]["k_anonymous"] and rows[2]["l_diverse"]
        recs = {r["n_records"] for r in rows.values()}
        assert len(recs) == 1                     # partitions all rows
        assert (rows[0]["pct_below_k"] >= rows[1]["pct_below_k"]
                >= rows[2]["pct_below_k"])
        assert rows[0]["k_min"] <= rows[1]["k_min"] <= rows[2]["k_min"]
        assert rows[0]["n_classes"] > rows[1]["n_classes"] \
            > rows[2]["n_classes"]

    def test_integrity_manifest_live(self, spark, queries):
        """Every shard populated with distinct nonzero checksums, root
        = additive combine of the shards, byte totals real."""
        from swiftbulkuploader_spark.operators.training_prep import (
            INTEGRITY_SHARDS,
        )

        rows = {r["shard"]: r
                for r in queries["x10_integrity_manifest"](spark, SF)
                .collect()}
        assert set(rows) == {-1, *range(INTEGRITY_SHARDS)}
        shards = [rows[s] for s in range(INTEGRITY_SHARDS)]
        assert all(r["n_docs"] > 0 and r["n_bytes"] > 0 for r in shards)
        sums = {r["checksum"] for r in shards}
        assert len(sums) == INTEGRITY_SHARDS      # no degenerate collisions
        root = rows[-1]
        assert root["n_docs"] == sum(r["n_docs"] for r in shards)
        assert int(root["checksum"]) == sum(
            int(r["checksum"]) for r in shards
        )

    def test_mips_topk_live(self, spark, queries):
        """The reduction witness must be NON-trivial: on the
        popularity-weighted substrate the MIPS top-k differs from the
        cosine top-k (norm signal is live), yet the augmented-cosine
        rank equals the ip rank on every row (the monotone-reduction
        guarantee MIPS serving depends on)."""
        mips = queries["x2_mips_topk"](spark, SF).collect()
        assert len(mips) == 10
        for r in mips:
            assert r["rank_ip"] == r["rank_aug"]
        ips = [r["ip"] for r in mips]
        assert ips == sorted(ips, reverse=True)
        # norm signal is live: high-popularity classes (w >= 1.75)
        # dominate the ip ranking, which a cosine ranking cannot see
        high = sum(1 for r in mips if r["vec_id"] % 8 >= 5)
        assert high >= 7
        cos_ids = {r["vec_id"]
                   for r in queries["x2_cosine_topk"](spark, SF).collect()}
        mips_ids = {r["vec_id"] for r in mips}
        assert mips_ids != cos_ids         # MIPS is its own semantic

    def test_encoding_audit_live(self, spark, queries):
        """Every corruption counter fires somewhere on the injected
        substrate and both verdicts occur — no decorative detector."""
        rows = queries["x3_encoding_audit"](spark, SF).collect()
        assert rows
        assert sum(r["n_double_enc"] for r in rows) > 0
        assert sum(r["n_replacement"] for r in rows) > 0
        assert sum(r["n_ctrl"] for r in rows) > 0
        assert {r["encoding_clean"] for r in rows} == {True, False}
        for r in rows:
            assert r["encoding_clean"] == (
                r["n_double_enc"] + r["n_replacement"] + r["n_ctrl"] == 0
            )


class TestBhFdrLiveness:
    def test_bh_fdr_live(self, spark, queries):
        """BH family liveness: both verdicts present (injected metrics
        reject, at least one null metric calibrates), p/q monotone in
        rank, thresholds strictly increasing."""
        rows = sorted(queries["x6_bh_fdr"](spark, SF).collect(),
                      key=lambda r: r["rank"])
        assert len(rows) >= 3
        verdicts = {r["rejected"] for r in rows}
        assert verdicts == {True, False}
        ps = [r["p"] for r in rows]
        qs = [r["q_value"] for r in rows]
        assert ps == sorted(ps)
        assert qs == sorted(qs)          # q is the running-min envelope
        assert all(0.0 <= q <= 1.0 for q in qs)
        thr = [r["bh_thresh"] for r in rows]
        assert thr == sorted(thr) and thr[0] > 0.0
        # step-up contract: every rejected rank below every accepted one
        max_rej = max(r["rank"] for r in rows if r["rejected"])
        assert all(r["rank"] <= max_rej for r in rows if r["rejected"])
        assert all(r["rank"] > max_rej for r in rows if not r["rejected"])


class TestIndexStalenessLiveness:
    def test_staleness_scenario_pair_live(self, spark, queries):
        """r11 verdict ask #6: the flag must be provably able to fire
        both ways — the fresh scenario (the corpus the index was trained
        on) never flags against its own floor, the drifted scenario
        (sign-flipped embeddings on the same quantizer) must flag, and
        every cluster row is populated with a sane cosine."""
        rows = queries["x2_index_staleness"](spark, SF).collect()
        assert len(rows) >= 16  # both scenarios present
        scen = {r["scenario"] for r in rows}
        assert scen == {"fresh", "drifted"}
        fresh = [r for r in rows if r["scenario"] == "fresh"]
        drifted = [r for r in rows if r["scenario"] == "drifted"]
        assert fresh and drifted
        # fresh never flags (>= its own floor by construction)
        assert all(not r["reindex_flag"] for r in fresh)
        # genuine drift is detected: at least one drifted cluster flags
        assert any(r["reindex_flag"] for r in drifted)
        for r in rows:
            assert r["n_assigned"] > 0
            assert -1.0 <= r["cos_to_mean"] <= 1.0
        for r in fresh:
            assert 0.0 < r["cos_to_mean"] < 1.0

    def test_delta_serve_surfaces_both_sources(self, spark, queries):
        """The base+delta serve must return rows from BOTH sources: the
        query vector's verbatim re-ingested twin sits at cos 1.0 next
        to the original, and base rows fill the rest of the top-k."""
        rows = queries["x2_ann_delta_serve"](spark, SF).collect()
        assert len(rows) == 10
        flags = {r["is_delta"] for r in rows}
        assert flags == {True, False}
        by = {r["vec_id"]: r for r in rows}
        assert by[0]["cos_sim"] == 1.0
        assert by[100000]["cos_sim"] == 1.0  # the re-ingested twin

    def test_delta_offset_clears_corpus_ids(self, spark):
        """DELTA_ID_OFFSET must clear every base vec_id at every test SF
        (r12 ADVICE #2): `vec_id >= DELTA_ID_OFFSET` IS the is_delta
        flag, so a corpus id at or above the offset would collide delta
        with base ids and misreport base rows as deltas while the
        constant-sharing oracle stayed green."""
        from pyspark.sql import functions as F

        from swiftbulkuploader_spark.catalog import load_table
        from swiftbulkuploader_spark.operators.ann_index import (
            DELTA_ID_OFFSET,
        )

        for sf in ("/root/testdata/sf0.001", SF, "/root/testdata/sf0.1"):
            mx = load_table(spark, sf, "embeddings").agg(
                F.max("vec_id")
            ).first()[0]
            assert mx < DELTA_ID_OFFSET, (sf, mx)

    def test_reindex_partial_repairs_only_flagged(self, spark, queries):
        """The repair query's contract: unflagged clusters keep their
        population and centroid exactly (cos_old_new = 1.0); flagged
        clusters exist, moved their centroid, and total population is
        conserved across the repair."""
        rows = queries["x2_reindex_partial"](spark, SF).collect()
        assert len(rows) >= 8
        flagged = [r for r in rows if r["flagged"]]
        unflagged = [r for r in rows if not r["flagged"]]
        assert flagged and unflagged
        for r in unflagged:
            assert r["n_after"] == r["n_before"]
            assert r["cos_old_new"] == 1.0
        assert any(r["cos_old_new"] < 1.0 for r in flagged)
        assert (sum(r["n_after"] for r in rows)
                == sum(r["n_before"] for r in rows))


class TestPiiScrubLiveness:
    def test_every_class_and_both_verdicts_fire(self, spark, queries):
        """The synthetic corpus has no organic PII — the injected
        contact lines must keep every counter and BOTH pii_free values
        live, and redaction must never lengthen a doc by more than the
        mask-token overhead."""
        rows = queries["x3_pii_scrub"](spark, SF).collect()
        assert sum(r["n_emails"] for r in rows) > 0
        assert sum(r["n_phones"] for r in rows) > 0
        assert sum(r["n_ips"] for r in rows) > 0
        verdicts = {r["pii_free"] for r in rows}
        assert verdicts == {True, False}
        for r in rows:
            assert r["redacted_len"] > 0


class TestTostLiveness:
    def test_tost_scenario_pair_live(self, spark, queries):
        """Equivalence must be provable BOTH ways: the identically-
        distributed null scenario is equivalent at the contract margin
        for every metric, the 2*delta shifted scenario never is, and
        the z statistics are finite and ordered (z_lower > z_upper)."""
        rows = queries["x6_tost"](spark, SF).collect()
        assert len(rows) >= 10
        null = [r for r in rows if r["scenario"] == "null"]
        shifted = [r for r in rows if r["scenario"] == "shifted"]
        assert null and shifted
        assert all(r["equivalent"] for r in null)
        assert not any(r["equivalent"] for r in shifted)
        for r in rows:
            assert _finite(r["z_lower"]) and _finite(r["z_upper"])
            assert r["z_lower"] > r["z_upper"]
            assert r["se"] > 0


class TestPprLiveness:
    def test_ppr_concentrates_at_seed(self, spark, queries):
        """Walk-with-restart sanity: the seed holds the maximum mass,
        the walk reaches beyond the seed (>1 node with positive mass),
        unreached nodes are exactly 0, and total mass is <= 1."""
        rows = queries["x8_ppr"](spark, SF).collect()
        assert len(rows) > 10
        seed = min(r["node"] for r in rows)
        by = {r["node"]: r["pr"] for r in rows}
        assert by[seed] == max(by.values()) > 0.0
        assert sum(1 for v in by.values() if v > 0.0) > 1
        assert all(v >= 0.0 for v in by.values())
        assert sum(by.values()) <= 1.0 + 1e-9


class TestGapProfileLiveness:
    def test_outage_sim_fires_at_every_sf(self, spark, queries):
        """The raw hourly series is DENSE at sf0.1 (n_missing forever 0)
        — the scenario pair keeps the detector demonstrably live: the
        outage_sim rows must report missing hours and a positive
        longest gap, and raw must never report MORE gaps than sim."""
        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            rows = queries["x7_gap_profile"](spark, sf).collect()
            raw = {r["event_type"]: r for r in rows
                   if r["scenario"] == "raw"}
            sim = {r["event_type"]: r for r in rows
                   if r["scenario"] == "outage_sim"}
            assert set(raw) == set(sim) and raw
            for t in sim:
                assert sim[t]["n_missing"] > 0
                assert sim[t]["longest_gap_hours"] >= 1
                assert sim[t]["n_missing"] >= raw[t]["n_missing"]
                assert raw[t]["n_observed"] >= sim[t]["n_observed"]
                assert raw[t]["n_expected"] == (
                    raw[t]["n_observed"] + raw[t]["n_missing"]
                )


class TestKappaLiveness:
    def test_kappa_cells_and_signal_live(self, spark, queries):
        """All four confusion cells populated and kappa carrying real
        signal: bounded away from 0 (a yes-to-everything rater) and
        from |1| (degenerate identity). The measured band on this
        corpus is negative (the two screens systematically disagree)."""
        r = queries["x6_cohens_kappa"](spark, SF).collect()[0]
        for c in ("n11", "n10", "n01", "n00"):
            assert r[c] > 0, (c, r)
        assert r["n"] == r["n11"] + r["n10"] + r["n01"] + r["n00"]
        assert 0.0 < r["p_observed"] < 1.0
        assert 0.0 < r["p_chance"] < 1.0
        assert 0.05 < abs(r["kappa"]) < 0.9
