"""Crafted-data semantics tests for the dense-hourly-series statistics
(ACF, seasonal decomposition, CUSUM changepoint), the Markov transition
matrix, and Cramér's V — each pinned against hand-computed references so the
DuckDB oracle is checking an implementation whose meaning is independently
fixed here."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp_ntz, user_id: long, "
        "event_type: string, value: double, props: string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))


def _hourly(n_per_hour, etype="a", start_uid=1):
    """One row list with n_per_hour[h] events inside hour h of 2024-01-01."""
    rows, eid = [], 0
    base = datetime(2024, 1, 1, 0, 0, 0)
    for h, n in enumerate(n_per_hour):
        for i in range(n):
            eid += 1
            rows.append(
                (
                    eid,
                    base + timedelta(hours=h, seconds=i),  # up to 3600/hour
                    start_uid,
                    etype,
                    1.0,
                    "{}",
                )
            )
    return rows


class TestACF:
    def test_alternating_series(self, spark, tmp_path):
        """counts [1,2,1,2,1]: mu=1.4, den=1.2, acf1=-0.8, acf2=17/30."""
        from swiftbulkuploader_spark.operators.timeseries import x7_acf

        _write_events(spark, tmp_path, _hourly([1, 2, 1, 2, 1]))
        got = {r["lag"]: r for r in x7_acf(spark, str(tmp_path)).collect()}
        assert got[1]["n_pairs"] == 4 and got[2]["n_pairs"] == 3
        assert got[1]["acf"] == pytest.approx(-0.8)
        assert got[2]["acf"] == pytest.approx(0.68 / 1.2)
        # lag > series length - 1 has zero pairs -> NULL acf (sum of nothing)
        assert got[5]["n_pairs"] == 0 and got[5]["acf"] is None

    def test_gap_hours_are_zeros(self, spark, tmp_path):
        """Events in hours 0 and 2 only: the dense series is [1,0,1]
        (NOT the gappy 2-row [1,1]): mu=2/3, acf1=-2/3."""
        from swiftbulkuploader_spark.operators.timeseries import x7_acf

        rows = [
            (1, datetime(2024, 1, 1, 0, 0, 0), 1, "a", 1.0, "{}"),
            (2, datetime(2024, 1, 1, 2, 0, 0), 1, "a", 1.0, "{}"),
        ]
        _write_events(spark, tmp_path, rows)
        got = {r["lag"]: r for r in x7_acf(spark, str(tmp_path)).collect()}
        assert got[1]["n_pairs"] == 2
        assert got[1]["acf"] == pytest.approx(-2.0 / 3.0)


class TestSeasonalDecompose:
    def test_flat_series(self, spark, tmp_path):
        """A constant 1-event/hour series over 30 hours: trend=1.0 exactly
        where the 25-hour window is full (rows 12..17), NULL at the edges;
        seasonal and residual are exactly 0.0 (the integer-space construction
        makes them bit-exact zeros, not ulps)."""
        from swiftbulkuploader_spark.operators.timeseries import (
            x7_seasonal_decompose,
        )

        _write_events(spark, tmp_path, _hourly([1] * 30))
        rows = sorted(
            x7_seasonal_decompose(spark, str(tmp_path)).collect(),
            key=lambda r: r["bucket"],
        )
        assert len(rows) == 30
        for i, r in enumerate(rows):
            assert r["x"] == 1.0
            if 12 <= i <= 17:
                assert r["trend"] == 1.0
                assert r["seasonal"] == 0.0
                assert r["residual"] == 0.0
            else:
                assert r["trend"] is None and r["residual"] is None


class TestCusumChangepoint:
    def test_level_shift(self, spark, tmp_path):
        """counts [1,1,5,5]: mu=3, cusum=[-2,-4,-2,0] -> changepoint at
        hour 1 with S=-4; score = 4/(sd*sqrt(4)), sd=sqrt(16/3)."""
        from swiftbulkuploader_spark.operators.timeseries import (
            x7_cusum_changepoint,
        )

        _write_events(spark, tmp_path, _hourly([1, 1, 5, 5]))
        r = x7_cusum_changepoint(spark, str(tmp_path)).collect()[0]
        assert r["n_hours"] == 4
        assert r["cp_bucket"] == "2024-01-01 01:00:00"
        assert r["cusum"] == -4.0
        assert r["score"] == pytest.approx(4.0 / ((16.0 / 3.0) ** 0.5 * 2.0))

    def test_tie_breaks_to_earliest_hour(self, spark, tmp_path):
        """counts [2,1,1,2]: mu=1.5, cusum=[0.5,0,-0.5,0] — single max at
        hour 2; flip to [1,2,2,1]: cusum=[-0.5,0,0.5,0] max at hour 2 too.
        Use symmetric [2,1,2]: mu=5/3, cusum=[1/3,-1/3,0] -> |S| ties at
        hours 0 and 1, tie-break picks hour 0."""
        from swiftbulkuploader_spark.operators.timeseries import (
            x7_cusum_changepoint,
        )

        _write_events(spark, tmp_path, _hourly([2, 1, 2]))
        r = x7_cusum_changepoint(spark, str(tmp_path)).collect()[0]
        assert r["cp_bucket"] == "2024-01-01 00:00:00"
        assert r["cusum"] == pytest.approx(1.0 / 3.0)


class TestMarkovTransitions:
    def test_transition_probabilities(self, spark, tmp_path):
        """user1: a->b->a, user2: b->a, user3: a->c:
        P(b|a)=P(c|a)=0.5, P(a|b)=1.0; no cross-user pairs."""
        from swiftbulkuploader_spark.operators.behavior import (
            x7_markov_transitions,
        )

        t0 = datetime(2024, 1, 1, 0, 0, 0)
        s = timedelta(seconds=1)
        rows = [
            (1, t0, 1, "a", 0.0, "{}"),
            (2, t0 + s, 1, "b", 0.0, "{}"),
            (3, t0 + 2 * s, 1, "a", 0.0, "{}"),
            (4, t0, 2, "b", 0.0, "{}"),
            (5, t0 + s, 2, "a", 0.0, "{}"),
            (6, t0, 3, "a", 0.0, "{}"),
            (7, t0 + s, 3, "c", 0.0, "{}"),
        ]
        _write_events(spark, tmp_path, rows)
        got = {
            (r["cur"], r["nxt"]): r
            for r in x7_markov_transitions(spark, str(tmp_path)).collect()
        }
        assert set(got) == {("a", "b"), ("a", "c"), ("b", "a")}
        assert got[("a", "b")]["n"] == 1 and got[("a", "b")]["prob"] == 0.5
        assert got[("a", "c")]["prob"] == 0.5
        assert got[("b", "a")]["n"] == 2 and got[("b", "a")]["prob"] == 1.0

    def test_simultaneous_ties_break_on_event_id(self, spark, tmp_path):
        """Two events at the identical timestamp order by event_id."""
        from swiftbulkuploader_spark.operators.behavior import (
            x7_markov_transitions,
        )

        t0 = datetime(2024, 1, 1, 0, 0, 0)
        rows = [(2, t0, 1, "b", 0.0, "{}"), (1, t0, 1, "a", 0.0, "{}")]
        _write_events(spark, tmp_path, rows)
        got = x7_markov_transitions(spark, str(tmp_path)).collect()
        assert len(got) == 1
        assert (got[0]["cur"], got[0]["nxt"]) == ("a", "b")


class TestCramersV:
    def test_perfect_association(self, spark, tmp_path):
        """Each type confined to its own hour: V = 1, chi2 = N."""
        from swiftbulkuploader_spark.operators.stats_inference import (
            x6_cramers_v,
        )

        rows = [
            (i, datetime(2024, 1, 1, 0, i, 0), 1, "p", 0.0, "{}") for i in range(3)
        ] + [
            (10 + i, datetime(2024, 1, 1, 1, i, 0), 1, "q", 0.0, "{}")
            for i in range(5)
        ]
        _write_events(spark, tmp_path, rows)
        r = x6_cramers_v(spark, str(tmp_path)).collect()[0]
        assert (r["n"], r["n_rows"], r["n_cols"]) == (8, 2, 2)
        assert r["chi2"] == pytest.approx(8.0)
        assert r["cramers_v"] == pytest.approx(1.0)

    def test_independence(self, spark, tmp_path):
        """Both types spread evenly over both hours: chi2 = 0, V = 0."""
        from swiftbulkuploader_spark.operators.stats_inference import (
            x6_cramers_v,
        )

        rows = []
        eid = 0
        for etype in ("p", "q"):
            for h in (0, 1):
                for i in range(2):
                    eid += 1
                    rows.append(
                        (eid, datetime(2024, 1, 1, h, i, 0), 1, etype, 0.0, "{}")
                    )
        _write_events(spark, tmp_path, rows)
        r = x6_cramers_v(spark, str(tmp_path)).collect()[0]
        assert r["chi2"] == pytest.approx(0.0, abs=1e-12)
        assert r["cramers_v"] == pytest.approx(0.0, abs=1e-9)


class TestSaxSymbols:
    def test_step_series_word(self, spark, tmp_path):
        """One type, 24 hours: 12 hours at 1 event then 12 at 3 ->
        mu=2, frames [1,1,1,3,3,3], |z| ~ 0.979 beyond the +-0.6745
        quartile breaks -> SAX word 'aaaddd'."""
        from swiftbulkuploader_spark.operators.timeseries import x7_sax_symbols

        _write_events(spark, tmp_path, _hourly([1] * 12 + [3] * 12))
        rows = x7_sax_symbols(spark, str(tmp_path)).collect()
        assert len(rows) == 1
        assert rows[0]["n_frames"] == 6
        assert rows[0]["sax_word"] == "aaaddd"

    def test_constant_series_maps_to_question_marks(self, spark, tmp_path):
        """sd = 0 (constant series) must yield explicit '?' symbols, not
        fall through the CASE to 'd'."""
        from swiftbulkuploader_spark.operators.timeseries import x7_sax_symbols

        _write_events(spark, tmp_path, _hourly([2] * 24))
        rows = x7_sax_symbols(spark, str(tmp_path)).collect()
        assert rows[0]["sax_word"] == "??????"


class TestMutualInformation:
    def test_perfect_association(self, spark, tmp_path):
        """p only in hour 0 (3 events), q only in hour 1 (5): MI equals the
        marginal entropy H(3/8, 5/8) and NMI = 1."""
        import math

        from swiftbulkuploader_spark.operators.stats_inference import (
            x6_mutual_information,
        )

        rows = [
            (i, datetime(2024, 1, 1, 0, i, 0), 1, "p", 0.0, "{}") for i in range(3)
        ] + [
            (10 + i, datetime(2024, 1, 1, 1, i, 0), 1, "q", 0.0, "{}")
            for i in range(5)
        ]
        _write_events(spark, tmp_path, rows)
        r = x6_mutual_information(spark, str(tmp_path)).collect()[0]
        h = math.log(8.0) - (3 * math.log(3.0) + 5 * math.log(5.0)) / 8.0
        assert r["n"] == 8
        assert r["mi"] == pytest.approx(h)
        assert r["h_row"] == pytest.approx(h)
        assert r["nmi"] == pytest.approx(1.0)

    def test_independence(self, spark, tmp_path):
        """Both types uniform over both hours: MI ~ 0, NMI ~ 0."""
        from swiftbulkuploader_spark.operators.stats_inference import (
            x6_mutual_information,
        )

        rows = []
        eid = 0
        for etype in ("p", "q"):
            for h in (0, 1):
                for i in range(2):
                    eid += 1
                    rows.append(
                        (eid, datetime(2024, 1, 1, h, i, 0), 1, etype, 0.0, "{}")
                    )
        _write_events(spark, tmp_path, rows)
        r = x6_mutual_information(spark, str(tmp_path)).collect()[0]
        assert r["mi"] == pytest.approx(0.0, abs=1e-12)
        assert r["nmi"] == pytest.approx(0.0, abs=1e-9)


class TestLttbDownsample:
    def test_spike_wins_middle_bucket_endpoints_kept(self, spark, tmp_path):
        """18 hours / 3 buckets: first bucket keeps its FIRST point, last
        bucket its LAST; the middle bucket keeps the spike hour (area
        |t - 2.5 - 12x| maximal at the x=9 spike)."""
        from swiftbulkuploader_spark.operators.timeseries import (
            x7_lttb_downsample,
        )

        counts = [1, 1, 1, 1, 1, 1, 1, 9, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2]
        _write_events(spark, tmp_path, _hourly(counts))
        rows = {r["bucket_id"]: r
                for r in x7_lttb_downsample(spark, str(tmp_path)).collect()}
        assert len(rows) == 3
        assert rows[0]["sel_bucket"] == "2024-01-01 00:00:00"
        assert rows[1]["sel_bucket"] == "2024-01-01 07:00:00" and rows[1]["x"] == 9.0
        assert rows[2]["sel_bucket"] == "2024-01-01 17:00:00"


class TestTheilSen:
    def test_perfect_line(self, spark, tmp_path):
        """counts [1,2,3,4,5]: every pairwise slope is exactly 1; the
        intercept is 1 - slope*t0 in absolute epoch-hours."""
        from datetime import timezone

        from swiftbulkuploader_spark.operators.timeseries import x7_theil_sen

        _write_events(spark, tmp_path, _hourly([1, 2, 3, 4, 5]))
        r = x7_theil_sen(spark, str(tmp_path)).collect()[0]
        t0 = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp()) // 3600
        assert (r["n_hours"], r["n_pairs"]) == (5, 10)
        assert r["slope"] == 1.0
        assert r["intercept"] == 1.0 - float(t0)

    def test_outlier_does_not_drag_slope(self, spark, tmp_path):
        """counts [1,2,3,100,5]: OLS slope would be ~+17; the Theil-Sen
        lower-median slope stays exactly 1."""
        from swiftbulkuploader_spark.operators.timeseries import x7_theil_sen

        _write_events(spark, tmp_path, _hourly([1, 2, 3, 100, 5]))
        r = x7_theil_sen(spark, str(tmp_path)).collect()[0]
        assert r["slope"] == 1.0


class TestBurstiness:
    def test_constant_and_gapped_series(self, spark, tmp_path):
        """Constant series: fano 0, burstiness -1, peak ratio 1. A gapped
        [1,0,1] series: mu=2/3, var=1/3 -> fano 0.5, peak ratio 1.5."""
        from swiftbulkuploader_spark.operators.timeseries import x7_burstiness

        rows = _hourly([1, 1, 1, 1], etype="flat") + [
            (100, datetime(2024, 1, 1, 0, 0, 0), 2, "gap", 1.0, "{}"),
            (101, datetime(2024, 1, 1, 2, 0, 0), 2, "gap", 1.0, "{}"),
        ]
        _write_events(spark, tmp_path, rows)
        got = {r["event_type"]: r for r in x7_burstiness(spark, str(tmp_path)).collect()}
        f = got["flat"]
        assert (f["fano"], f["burstiness"], f["peak_ratio"]) == (0.0, -1.0, 1.0)
        g = got["gap"]
        assert g["n_hours"] == 3
        assert g["fano"] == pytest.approx(0.5)
        assert g["peak_ratio"] == pytest.approx(1.5)


class TestSeasonalAnomaly:
    def test_offcycle_spike_tops_the_list(self, spark, tmp_path):
        """A 96-hour flat series with one 25x spike at day-2 15:00: the
        spike hour must rank first with |z| > 3 and anomalous=True, and
        exactly SEAS_ANOM_TOPN rows come back (top-N, not a filter).
        (At 72 h the hour-of-day seasonal has only TWO non-null samples
        per hod, so it splits the spike 50/50 and the spike row TIES its
        clean sibling — 3+ samples per hod keep the spike dominant.)"""
        from swiftbulkuploader_spark.operators.timeseries import (
            SEAS_ANOM_TOPN,
            x7_seasonal_anomaly,
        )

        counts = [1] * 96
        counts[39] = 25   # 2024-01-02 15:00
        _write_events(spark, tmp_path, _hourly(counts))
        rows = sorted(
            x7_seasonal_anomaly(spark, str(tmp_path)).collect(),
            key=lambda r: -abs(r["resid_z"]),
        )
        assert len(rows) == SEAS_ANOM_TOPN
        assert rows[0]["bucket"] == "2024-01-02 15:00:00"
        assert rows[0]["resid_z"] > 3.0
        assert rows[0]["anomalous"] is True


class TestHurst:
    def test_trend_vs_alternation(self, spark, tmp_path):
        """A monotone ramp (counts 1..128) is maximally persistent
        (H near 1); a strict alternation [1,2,1,2,...] is strongly
        anti-persistent (H well below 0.5)."""
        from swiftbulkuploader_spark.operators.timeseries import x7_hurst

        rows = _hourly(list(range(1, 129)), etype="ramp", start_uid=1)
        rows += _hourly([1, 2] * 64, etype="alt", start_uid=2)
        _write_events(spark, tmp_path, rows)
        got = {r["event_type"]: r for r in x7_hurst(spark, str(tmp_path)).collect()}
        assert got["ramp"]["n_scales"] == 4
        assert got["ramp"]["hurst"] > 0.8
        assert got["alt"]["hurst"] < 0.3


class TestPoissonBootstrap:
    def test_ci_brackets_mean_and_is_deterministic(self, spark):
        """On the smoke orders table: ci_lo < mean < ci_hi, positive
        bootstrap SE, and two runs agree exactly (hash-derived weights)."""
        from swiftbulkuploader_spark.operators.stats_inference import (
            x6_poisson_bootstrap,
        )

        sf = "/root/testdata/sf0.001"
        a = x6_poisson_bootstrap(spark, sf).collect()[0]
        b = x6_poisson_bootstrap(spark, sf).collect()[0]
        assert a == b
        assert a["boot_se"] > 0
        assert a["ci_lo"] < a["mean"] < a["ci_hi"]


class TestCcf:
    def test_known_lag_recovered(self, spark, tmp_path):
        """Type 'bb' is type 'aa' delayed by 2 hours: ccf(aa, bb, L)
        correlates aa(t) with bb(t-L), so the peak sits at L = -2."""
        counts = [1, 5, 1, 1, 9, 1, 1, 1, 2, 1, 1, 1]
        rows = _hourly(counts, etype="aa", start_uid=1)
        shifted = [0, 0] + counts
        rows += _hourly(shifted, etype="bb", start_uid=2)
        _write_events(spark, tmp_path, rows)
        from swiftbulkuploader_spark.operators.timeseries import x7_ccf

        got = {r["lag"]: r["ccf"]
               for r in x7_ccf(spark, str(tmp_path)).collect()
               if (r["ta"], r["tb"]) == ("aa", "bb") and r["ccf"] is not None}
        best = max(got, key=lambda k: got[k])
        assert best == -2
        assert got[-2] > 0.9


class TestKaplanMeier:
    def test_product_limit_with_censoring(self, spark, tmp_path):
        """u1 errors at +1h, u2 at +2h, u3 censored at +2h, u4 censored at
        +3h: S(1h) = 3/4; at 2h the at-risk set is {u2, u3, u4} (censored-
        at-t users count as at risk at t), so S(2h) = 3/4 * 2/3 = 1/2."""
        from swiftbulkuploader_spark.operators.sessions import x7_kaplan_meier

        t0 = datetime(2024, 1, 1, 0, 0, 0)
        h = timedelta(hours=1)
        rows = [
            (1, t0, 1, "view", 0.0, "{}"), (2, t0 + h, 1, "error", 0.0, "{}"),
            (3, t0, 2, "view", 0.0, "{}"), (4, t0 + 2 * h, 2, "error", 0.0, "{}"),
            (5, t0, 3, "view", 0.0, "{}"), (6, t0 + 2 * h, 3, "click", 0.0, "{}"),
            (7, t0, 4, "view", 0.0, "{}"), (8, t0 + 3 * h, 4, "click", 0.0, "{}"),
        ]
        _write_events(spark, tmp_path, rows)
        got = sorted(x7_kaplan_meier(spark, str(tmp_path)).collect(),
                     key=lambda r: r["dur_s"])
        assert len(got) == 2
        assert (got[0]["dur_hours"], got[0]["d"], got[0]["n_at_risk"]) == (1.0, 1, 4)
        assert got[0]["survival"] == pytest.approx(0.75)
        assert (got[1]["dur_hours"], got[1]["d"], got[1]["n_at_risk"]) == (2.0, 1, 3)
        assert got[1]["survival"] == pytest.approx(0.5)

    def test_full_mortality_hits_zero(self, spark, tmp_path):
        """Every user errors: the last event time empties the risk set and
        S pins to exactly 0 (the ln(0) guard)."""
        from swiftbulkuploader_spark.operators.sessions import x7_kaplan_meier

        t0 = datetime(2024, 1, 1, 0, 0, 0)
        h = timedelta(hours=1)
        rows = [
            (1, t0, 1, "view", 0.0, "{}"), (2, t0 + h, 1, "error", 0.0, "{}"),
            (3, t0, 2, "view", 0.0, "{}"), (4, t0 + 2 * h, 2, "error", 0.0, "{}"),
        ]
        _write_events(spark, tmp_path, rows)
        got = sorted(x7_kaplan_meier(spark, str(tmp_path)).collect(),
                     key=lambda r: r["dur_s"])
        assert got[0]["survival"] == pytest.approx(0.5)
        assert got[1]["survival"] == 0.0


class TestLjungBox:
    def test_strong_autocorrelation_rejected(self, spark, tmp_path):
        """A 48-hour ramp has massive joint autocorrelation -> Q far above
        the chi2(6) critical value; Q recomputes exactly from the ACF
        output (n = n_pairs + lag, n-k = n_pairs)."""
        from swiftbulkuploader_spark.operators.timeseries import (
            x7_acf,
            x7_ljung_box,
        )

        _write_events(spark, tmp_path, _hourly(list(range(1, 49))))
        r = x7_ljung_box(spark, str(tmp_path)).collect()[0]
        assert (r["n_hours"], r["n_lags"]) == (48, 6)
        assert r["white_noise_rejected"] is True
        acf = {a["lag"]: a for a in x7_acf(spark, str(tmp_path)).collect()}
        q = 48.0 * 50.0 * sum(
            acf[k]["acf"] ** 2 / acf[k]["n_pairs"] for k in range(1, 7)
        )
        assert r["q_stat"] == pytest.approx(q)


class TestEntropyRate:
    def test_deterministic_vs_uniform_chains(self, spark, tmp_path):
        """A strictly alternating a->b->a->... chain has entropy rate 0
        (perplexity 1); a chain whose every state splits 50/50 has
        H = ln 2 (perplexity 2)."""
        import math

        from swiftbulkuploader_spark.operators.behavior import x7_entropy_rate

        t0 = datetime(2024, 1, 1, 0, 0, 0)
        s = timedelta(seconds=1)
        # user 1: a b a b a  -> transitions ab, ba, ab, ba: all prob 1
        rows = [(i, t0 + i * s, 1, "ab"[i % 2], 0.0, "{}") for i in range(5)]
        _write_events(spark, tmp_path, rows)
        r = x7_entropy_rate(spark, str(tmp_path)).collect()[0]
        assert r["entropy_rate"] == pytest.approx(0.0, abs=1e-12)
        assert r["perplexity"] == pytest.approx(1.0)

    def test_fifty_fifty_split(self, spark, tmp_path):
        """From 'a' the chain goes b/c equally often: H = ln 2."""
        import math

        from swiftbulkuploader_spark.operators.behavior import x7_entropy_rate

        t0 = datetime(2024, 1, 1, 0, 0, 0)
        s = timedelta(seconds=1)
        rows = [
            (1, t0, 1, "a", 0.0, "{}"), (2, t0 + s, 1, "b", 0.0, "{}"),
            (3, t0, 2, "a", 0.0, "{}"), (4, t0 + s, 2, "c", 0.0, "{}"),
        ]
        _write_events(spark, tmp_path, rows)
        r = x7_entropy_rate(spark, str(tmp_path)).collect()[0]
        assert r["n_transitions"] == 2 and r["n_cells"] == 2
        assert r["entropy_rate"] == pytest.approx(math.log(2.0))
        assert r["perplexity"] == pytest.approx(2.0)


class TestOhlcBars:
    def test_known_bar_with_tie(self, spark, tmp_path):
        """One hour of crafted events: open/close follow (ts, event_id)
        order including a same-microsecond tie broken by event_id; a
        second type isolates per-group state."""
        import datetime

        from swiftbulkuploader_spark.operators.timeseries import x7_ohlc_bars

        t = lambda m, s=0: datetime.datetime(2024, 1, 1, 10, m, s)  # noqa: E731
        rows = [
            # view: open decided by the tie at t(0): event_id 1 < 2
            (2, t(0), 1, "view", 50.0, "{}"),
            (1, t(0), 1, "view", 10.0, "{}"),
            (3, t(30), 2, "view", 99.5, "{}"),
            (4, t(59), 1, "view", 20.25, "{}"),   # close
            (5, t(5), 3, "click", 7.0, "{}"),
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.parquet(str(tmp_path / "events.parquet"))
        got = {r["event_type"]: r
               for r in x7_ohlc_bars(spark, str(tmp_path)).collect()}
        v = got["view"]
        assert (v["open"], v["close"]) == (10.0, 20.25)
        assert (v["high"], v["low"]) == (99.5, 10.0)
        assert v["n"] == 4
        assert v["volume_cents"] == 1000 + 5000 + 9950 + 2025
        c = got["click"]
        assert (c["open"], c["close"], c["n"]) == (7.0, 7.0, 1)
