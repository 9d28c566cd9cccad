"""Semantic pins for the behavioral analytics operators, including the
degenerate-input cases the oracle data never hits (one-sided categories,
constant columns)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from swiftbulkuploader_spark.operators.behavior import (
    drift_from_halves,
    x7_cohort_retention,
    x7_funnel_steps,
)

SF = "/root/testdata/sf0.001"


def test_funnel_monotone(spark):
    r = x7_funnel_steps(spark, SF).first()
    assert r["n_viewed"] >= r["n_clicked"] >= r["n_purchased"] > 0


def test_cohort_offsets_nonnegative_and_week_zero_full(spark):
    rows = x7_cohort_retention(spark, SF).collect()
    assert all(r["week_offset"] >= 0 for r in rows)
    # every user is active in their own first week: offset-0 cells must
    # cover all users of that cohort (the retention matrix's 100% column)
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r["n_users"]
    for offsets in by_cohort.values():
        assert offsets[0] == max(offsets.values())


def test_drift_one_sided_category_is_finite(spark):
    """A category present in only one half — the 'new event type appeared'
    signal — must yield a large but FINITE smoothed PSI, not null/error
    (unsmoothed PSI is ln(0)-undefined; DuckDB raises on it)."""
    halves = spark.createDataFrame(
        [("old", True)] * 50 + [("old", False)] * 40 + [("new", False)] * 10,
        "event_type: string, is_a: boolean",
    )
    r = drift_from_halves(halves).first()
    assert r["psi"] is not None and math.isfinite(r["psi"])
    assert r["psi"] > 0.1  # strong drift, strongly flagged
    assert r["chi2"] is not None and r["chi2"] > 0
    assert r["dof"] == 1


def test_drift_identical_halves_near_zero(spark):
    halves = spark.createDataFrame(
        [("x", True), ("x", False), ("y", True), ("y", False)] * 25,
        "event_type: string, is_a: boolean",
    )
    r = drift_from_halves(halves).first()
    assert abs(r["psi"]) < 1e-9
    assert abs(r["chi2"]) < 1e-9


def test_histogram_degenerate_constant_column(spark):
    """vmax == vmin (width 0) must not divide-by-zero under ANSI mode:
    everything lands in bin 0."""
    from swiftbulkuploader_spark.operators.profiling import x6_equiwidth_histogram
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, 1, "O", 42.0, None, "P") for i in range(10)],
            "o_orderkey: long, o_custkey: long, o_orderstatus: string, "
            "o_totalprice: double, o_orderdate: timestamp, o_orderpriority: string",
        ).write.parquet(os.path.join(d, "orders.parquet"))
        rows = x6_equiwidth_histogram(spark, d).collect()
    assert len(rows) == 1
    assert rows[0]["bin"] == 0 and rows[0]["cnt"] == 10


def test_ks_drift_fires_on_shifted_distribution(spark, tmp_path):
    """x6_ks_drift must flag a genuinely shifted value distribution: first
    half uniform-low values, second half uniform-high — the binned ECDF gap
    approaches 1 and far exceeds the alpha=0.05 critical value. And the
    no-drift fixture direction: identical halves stay under it."""
    import json

    from swiftbulkuploader_spark.operators.behavior import x6_ks_drift

    def write_events(path, second_half_shift):
        rows = []
        for i in range(2000):
            sec = i  # first 1000 s = half A, rest = half B
            v = (i % 100) / 100.0
            if second_half_shift and i >= 1000:
                v += 10.0
            rows.append((i, f"2024-01-01 00:{sec // 60 % 60:02d}:{sec % 60:02d}",
                         i % 7, "view", v, json.dumps({})))
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
            "event_type", "value", "props",
        ).write.parquet(str(path))

    shifted_dir = tmp_path / "shifted"
    write_events(shifted_dir / "events.parquet", True)
    r = x6_ks_drift(spark, str(shifted_dir)).first()
    assert r["drifted"] and r["ks_stat"] > 0.9

    same_dir = tmp_path / "same"
    write_events(same_dir / "events.parquet", False)
    r2 = x6_ks_drift(spark, str(same_dir)).first()
    assert not r2["drifted"] and r2["ks_stat"] < r2["ks_crit"]


def test_ks_drift_degenerate_inputs(spark, tmp_path):
    """The two degenerate classes x6_ks_drift guards (the x6_benford
    discipline), each checked against the DuckDB oracle on the same
    parquet so the guard is mirrored, not just present:

    * constant value column (hi == lo): every row short-circuits to bin 0
      instead of 0/0 = NaN (which Spark's int cast folds to 0 silently and
      DuckDB refuses to cast) -> ks_stat 0.0, not drifted;
    * one-sided time split (all timestamps equal -> half A empty): the
      ECDF gap and critical value go NULL via nullif, never Inf.
    """
    import json

    import duckdb

    from swiftbulkuploader_spark.operators.behavior import ORACLES, x6_ks_drift

    def write_events(path, constant_value):
        rows = []
        for i in range(200):
            sec = 0 if not constant_value else i  # both-degenerate vs split
            # constant_value fixture: constant VALUE, normal time split;
            # the other fixture: varying value, ALL timestamps identical
            v = 1.5 if constant_value else (i % 50) / 10.0
            rows.append((i, f"2024-01-01 00:{sec // 60 % 60:02d}:{sec % 60:02d}",
                         i % 7, "view", v, json.dumps({})))
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
            "event_type", "value", "props",
        ).write.parquet(str(path))

    def oracle_row(sf_dir):
        con = duckdb.connect()
        con.execute(
            # Spark writes a part-file directory; DuckDB needs the glob
            f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet/*.parquet'"
        )
        cur = con.execute(ORACLES["x6_ks_drift"])
        cols = [d[0] for d in cur.description]
        return dict(zip(cols, cur.fetchone()))

    const_dir = tmp_path / "const"
    write_events(const_dir / "events.parquet", constant_value=True)
    r = x6_ks_drift(spark, str(const_dir)).first()
    assert r["ks_stat"] == 0.0 and r["drifted"] is False
    o = oracle_row(const_dir)
    assert o["ks_stat"] == 0.0 and bool(o["drifted"]) is False
    assert r["n_a"] == o["n_a"] and r["n_b"] == o["n_b"]

    onesided_dir = tmp_path / "onesided"
    write_events(onesided_dir / "events.parquet", constant_value=False)
    r2 = x6_ks_drift(spark, str(onesided_dir)).first()
    assert r2["n_a"] == 0 and r2["n_b"] == 200
    assert r2["ks_stat"] is None and r2["ks_crit"] is None
    assert r2["drifted"] is None
    o2 = oracle_row(onesided_dir)
    assert o2["n_a"] == 0 and o2["ks_stat"] is None and o2["drifted"] is None


def test_ab_test_degenerate_single_arm(spark, tmp_path):
    """All users in one arm (single user id -> one md5-parity bucket):
    z and significant must be NULL via the nullif guards, never Inf/error,
    and the populated arm's counts must still be exact — checked against
    the DuckDB oracle on the same parquet."""
    import json

    import duckdb

    from swiftbulkuploader_spark.operators.stats_inference import (
        ORACLES,
        x6_ab_test,
    )

    # value 100.0: conversion is the HIGH-VALUE definition
    # (>= AB_CONV_VALUE), so the purchases must clear the bar
    rows = [(i, "2024-01-01 00:00:00", 7, "purchase" if i % 3 == 0 else "view",
             100.0, json.dumps({})) for i in range(30)]
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    ).write.parquet(str(tmp_path / "events.parquet"))

    r = x6_ab_test(spark, str(tmp_path)).first()
    assert (r["n_a"] == 0) != (r["n_b"] == 0)  # exactly one empty arm
    assert r["n_a"] + r["n_b"] == 1 and r["conv_a"] + r["conv_b"] == 1
    assert r["z_stat"] is None and r["significant"] is None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'"
    )
    cur = con.execute(ORACLES["x6_ab_test"])
    o = dict(zip([d[0] for d in cur.description], cur.fetchone()))
    assert o["z_stat"] is None and o["significant"] is None
    assert (o["n_a"], o["n_b"]) == (r["n_a"], r["n_b"])


class TestCountMinEst:
    def test_exact_regime_and_counts(self, spark, tmp_path):
        """With a vocabulary tiny next to w=1024 the sketch is collision-
        free: every estimate equals the exact count (overestimate 0), and
        the exact counts match a hand count. The CM guarantee est >= exact
        holds unconditionally."""
        from swiftbulkuploader_spark.operators.profiling import x6_countmin_est

        docs = [
            (0, "aa bb aa cc"),
            (1, "aa bb dd"),
            (2, "ee aa"),
        ]
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in docs],
            "doc_id: long, text: string, lang: string, source: string, n_chars: long",
        ).write.parquet(str(tmp_path / "documents.parquet"))
        got = {r["token"]: r for r in
               x6_countmin_est(spark, str(tmp_path)).collect()}
        assert {t: r["exact_n"] for t, r in got.items()} == {
            "aa": 4, "bb": 2, "cc": 1, "dd": 1, "ee": 1,
        }
        assert all(r["cm_est"] >= r["exact_n"] for r in got.values())
        assert all(r["overestimate"] == 0 for r in got.values())


class TestKMVDistinct:
    def test_small_universe_is_exact(self, spark, tmp_path):
        """With fewer distinct trigrams than k the sketch holds the whole
        set, so the estimate must equal the exact count (rel_error 0)."""
        rows = [
            (0, "a b c d e f", "en", "s", 1),   # trigrams: abc bcd cde def
            (1, "a b c d", "en", "s", 1),       # abc bcd (dups)
        ]
        from swiftbulkuploader_spark.operators.profiling import x6_kmv_distinct

        df = spark.createDataFrame(
            rows,
            "doc_id: long, text: string, lang: string, source: string, n_chars: long",
        )
        df.write.parquet(str(tmp_path / "documents.parquet"))
        r = x6_kmv_distinct(spark, str(tmp_path)).collect()[0]
        assert r["exact_distinct"] == 4
        assert r["k_used"] == 4
        assert r["kmv_estimate"] == 4.0
        assert r["rel_error"] == 0.0

    def test_estimate_within_sketch_error(self, spark):
        """On the smoke corpus (>> k distinct trigrams) the (k-1)/u_k
        estimate must land within a few standard errors (1/sqrt(k-2) ~
        6%) of the true cardinality."""
        from swiftbulkuploader_spark.operators.profiling import KMV_K, x6_kmv_distinct

        r = x6_kmv_distinct(spark, "/root/testdata/sf0.001").collect()[0]
        assert r["exact_distinct"] > KMV_K
        assert r["k_used"] == KMV_K
        assert abs(r["rel_error"]) < 0.25


class TestLorenzGini:
    def test_uniform_source_has_zero_gini(self, spark, tmp_path):
        """Equal-sized docs -> perfectly equal Lorenz curve -> gini 0."""
        import pytest

        from swiftbulkuploader_spark.operators.profiling import x6_lorenz_gini

        rows = [(i, "w x y z", "en", "flat", 1) for i in range(5)]
        # skewed source: one 16-token doc dominating nine 1-token docs
        rows += [(10, " ".join(["big"] * 16), "en", "skew", 1)]
        rows += [(11 + i, "tiny", "en", "skew", 1) for i in range(9)]
        df = spark.createDataFrame(
            rows,
            "doc_id: long, text: string, lang: string, source: string, n_chars: long",
        )
        df.write.parquet(str(tmp_path / "documents.parquet"))
        got = {r["source"]: r for r in x6_lorenz_gini(spark, str(tmp_path)).collect()}
        flat, skew = got["flat"], got["skew"]
        assert (flat["n_docs"], flat["total_tokens"]) == (5, 20)
        assert flat["gini"] == pytest.approx(0.0)
        # skew: n=10, sorted x = [1]*9 + [16]; sum=25; sum(i*x)=45+160=205
        # gini = 2*205/(10*25) - 11/10 = 1.64 - 1.1 = 0.54
        assert skew["gini"] == pytest.approx(0.54)
        # top decile (k=1) = the 16-token doc -> 64% of mass
        assert skew["top_decile_share"] == pytest.approx(16 / 25)
