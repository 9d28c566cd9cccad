"""Crafted-data semantic pins for the trickiest round-8 operators: the
Holt struct-fold recursion, Mann-Whitney tie handling in x2_label_auc,
Welch's t on known two-sample data, and the log2 gap-bucket edges. Each
already has a value-hash oracle; these tests pin the SEMANTICS on inputs
small enough to verify by hand (CLAUDE.md rule 7)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp_ntz, user_id: long, "
        "event_type: string, value: double, props: string",
    ).write.parquet(str(tmp_path / "events.parquet"))


def _write_embeddings(spark, tmp_path, vecs_labels):
    rows = [(i, [float(x) for x in v], lab)
            for i, (v, lab) in enumerate(vecs_labels)]
    spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>, label: int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "o_orderkey: long, o_totalprice: double, o_orderpriority: string"
    ).write.parquet(str(tmp_path / "orders.parquet"))


class TestHoltLinear:
    def test_matches_reference_fold(self, spark, tmp_path):
        """Hourly counts [2, 4, 6, 8] (a clean ramp): the fold must equal a
        step-by-step Python replica of l_t = a x + (1-a)(l+b),
        b_t = g(l_t - l) + (1-g) b with l0 = x0, b0 = x1 - x0."""
        from swiftbulkuploader_spark.operators.timeseries import (
            HOLT_ALPHA,
            HOLT_BETA,
            x7_holt_linear,
        )

        base = datetime(2024, 1, 1)
        rows, eid = [], 0
        for h, n in enumerate([2, 4, 6, 8]):
            for i in range(n):
                eid += 1
                rows.append((eid, base + timedelta(hours=h, seconds=i),
                             1, "a", 1.0, "{}"))
        _write_events(spark, tmp_path, rows)
        got = x7_holt_linear(spark, str(tmp_path)).collect()
        assert len(got) == 1
        vals = [2.0, 4.0, 6.0, 8.0]
        l, b = vals[0], vals[1] - vals[0]
        for x in vals[2:]:
            nl = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (l + b)
            b = HOLT_BETA * (nl - l) + (1 - HOLT_BETA) * b
            l = nl
        r = got[0]
        assert r["n_hours"] == 4 and r["last_value"] == 8.0
        assert r["level"] == pytest.approx(l, abs=0)
        assert r["trend"] == pytest.approx(b, abs=0)
        assert r["forecast_next"] == pytest.approx(l + b, abs=0)

    def test_linear_ramp_forecasts_forward(self, spark, tmp_path):
        """On an exact linear ramp the trend stays positive and the
        forecast exceeds the last level."""
        from swiftbulkuploader_spark.operators.timeseries import x7_holt_linear

        base = datetime(2024, 1, 1)
        rows, eid = [], 0
        for h in range(10):
            for i in range(h + 1):
                eid += 1
                rows.append((eid, base + timedelta(hours=h, seconds=i),
                             1, "a", 1.0, "{}"))
        _write_events(spark, tmp_path, rows)
        r = x7_holt_linear(spark, str(tmp_path)).collect()[0]
        assert r["trend"] > 0
        assert r["forecast_next"] > r["level"]


class TestLabelAuc:
    def test_perfect_separation_is_auc_one(self, spark, tmp_path):
        """Query label 1 sits at [1, 0]; all label-1 vectors are closer to
        it than any label-0 vector: AUC must be exactly 1."""
        from swiftbulkuploader_spark.operators.similarity import x2_label_auc

        vecs = [([1.0, 0.0], 1)]            # query (vec_id 0)
        vecs += [([1.0, 0.1 * i], 1) for i in range(1, 4)]   # positives
        vecs += [([0.1 * i, 1.0], 0) for i in range(1, 4)]   # negatives
        _write_embeddings(spark, tmp_path, vecs)
        r = x2_label_auc(spark, str(tmp_path)).collect()[0]
        assert (r["n_pos"], r["n_neg"]) == (3, 3)
        assert r["auc"] == 1.0 and r["gini"] == 1.0

    def test_all_tied_scores_give_half(self, spark, tmp_path):
        """Every candidate identical to the query: one tie group, average
        ranks make AUC exactly 0.5 (the tie-handling pin)."""
        from swiftbulkuploader_spark.operators.similarity import x2_label_auc

        vecs = [([1.0, 0.0], 1)]
        vecs += [([1.0, 0.0], 1) for _ in range(2)]
        vecs += [([1.0, 0.0], 0) for _ in range(2)]
        _write_embeddings(spark, tmp_path, vecs)
        r = x2_label_auc(spark, str(tmp_path)).collect()[0]
        assert r["auc"] == 0.5 and r["gini"] == 0.0

    def test_inverted_ranking_is_auc_zero(self, spark, tmp_path):
        """Negatives closer than positives: AUC must be exactly 0."""
        from swiftbulkuploader_spark.operators.similarity import x2_label_auc

        vecs = [([1.0, 0.0], 1)]
        vecs += [([0.0, 1.0], 1), ([0.1, 1.0], 1)]   # positives far away
        vecs += [([1.0, 0.05], 0), ([1.0, 0.02], 0)]  # negatives on top
        _write_embeddings(spark, tmp_path, vecs)
        r = x2_label_auc(spark, str(tmp_path)).collect()[0]
        assert r["auc"] == 0.0


class TestWelchTTest:
    def test_known_two_sample(self, spark, tmp_path):
        """Even keys {10, 20, 30}, odd keys {40, 50, 60}: t and the
        Satterthwaite df must equal the hand formula (equal variances, so
        df = 4 exactly and mean_diff = -30)."""
        from swiftbulkuploader_spark.operators.stats_inference import (
            x6_welch_ttest,
        )

        rows = [
            (2, 10.0, "1-URGENT"), (4, 20.0, "1-URGENT"), (6, 30.0, "3-MEDIUM"),
            (1, 40.0, "3-MEDIUM"), (3, 50.0, "3-MEDIUM"), (5, 60.0, "5-LOW"),
        ]
        _write_orders(spark, tmp_path, rows)
        got = {r["comparison"]: r
               for r in x6_welch_ttest(spark, str(tmp_path)).collect()}
        r = got["null_split"]
        assert (r["n_a"], r["n_b"]) == (3, 3)
        assert r["mean_diff"] == pytest.approx(-30.0)
        # s1^2 = s2^2 = 100; se = sqrt(200/3); t = -30/se
        assert r["t_stat"] == pytest.approx(-30.0 / (200.0 / 3.0) ** 0.5)
        assert r["welch_df"] == pytest.approx(4.0)

    def test_priority_split_present(self, spark, tmp_path):
        from swiftbulkuploader_spark.operators.stats_inference import (
            x6_welch_ttest,
        )

        rows = [(i, float(100 + i), "1-URGENT" if i % 3 == 0 else "5-LOW")
                for i in range(1, 13)]
        _write_orders(spark, tmp_path, rows)
        got = {r["comparison"]: r
               for r in x6_welch_ttest(spark, str(tmp_path)).collect()}
        assert got["priority_split"]["n_a"] == 4
        assert got["priority_split"]["n_b"] == 8


class TestGapHistogram:
    def test_bucket_edges(self, spark, tmp_path):
        """Gaps of 1 s, 3 s and 8 s land in buckets 0 ([0,2)), 1 ([2,4))
        and 3 ([8,16)) with the exact power-of-two bounds."""
        from swiftbulkuploader_spark.operators.sessions import x7_gap_histogram

        t0 = datetime(2024, 1, 1)
        rows = [
            (1, t0, 1, "a", 0.0, "{}"),
            (2, t0 + timedelta(seconds=1), 1, "a", 0.0, "{}"),
            (3, t0 + timedelta(seconds=4), 1, "a", 0.0, "{}"),
            (4, t0 + timedelta(seconds=12), 1, "a", 0.0, "{}"),
        ]
        _write_events(spark, tmp_path, rows)
        got = {r["log2_bucket"]: r
               for r in x7_gap_histogram(spark, str(tmp_path)).collect()}
        assert set(got) == {0, 1, 3}
        assert (got[0]["gap_s_lo"], got[0]["gap_s_hi"]) == (0, 2)
        assert (got[1]["gap_s_lo"], got[1]["gap_s_hi"]) == (2, 4)
        assert (got[3]["gap_s_lo"], got[3]["gap_s_hi"]) == (8, 16)
        assert all(r["n_gaps"] == 1 for r in got.values())

    def test_subsecond_gap_pins_to_bucket_zero(self, spark, tmp_path):
        from swiftbulkuploader_spark.operators.sessions import x7_gap_histogram

        t0 = datetime(2024, 1, 1)
        rows = [
            (1, t0, 1, "a", 0.0, "{}"),
            (2, t0 + timedelta(microseconds=500), 1, "a", 0.0, "{}"),
        ]
        _write_events(spark, tmp_path, rows)
        got = x7_gap_histogram(spark, str(tmp_path)).collect()
        assert len(got) == 1 and got[0]["log2_bucket"] == 0
