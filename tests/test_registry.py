"""Driver-contract surface: every registered query runs at sf0.001 with a
stable schema; oracles reference only existing queries; entry() smokes.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from swiftbulkuploader_spark import registry

SF = "/root/testdata/sf0.001"


def test_every_query_runs_and_has_rows_or_schema(spark):
    for name, fn in registry.QUERIES.items():
        df = fn(spark, SF)
        assert df.columns, name
        n = df.count()
        assert n >= 0, name


def test_oracles_subset_of_queries():
    assert set(registry.ORACLES) <= set(registry.QUERIES)


def test_entry_smoke(spark):
    rows = entrymod.entry(spark).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["total"] > 0
    assert 0 <= r["pct_done"] <= 100


def test_contract_shapes():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) >= 40
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_approx_profile_within_tolerance(spark):
    """The HLL++/GK sketches self-check: every (metric, exact_value,
    within_tol) row must report within_tol=True, and the exact values must
    agree with the standalone exact queries."""
    rows = {r["metric"]: r for r in registry.QUERIES["x6_approx_profile"](spark, SF).collect()}
    assert set(rows) == {"n_orders", "n_parts", "price_p50", "qty_p95"}
    assert all(r["within_tol"] for r in rows.values()), rows
    exact = registry.QUERIES["x6_distinct_profile"](spark, SF).first()
    assert rows["n_orders"]["exact_value"] == float(exact["n_orders"])
    assert rows["n_parts"]["exact_value"] == float(exact["n_parts"])


def test_hll_mergeable_union_matches_exact(spark):
    """DataSketches HLL: per-group estimates near exact, and the union of
    per-group sketches lands near the exact GLOBAL distinct count — the
    re-aggregation property that makes stored sketches useful."""
    from pyspark.sql import functions as F

    from swiftbulkuploader_spark.catalog import load_table

    rows = registry.QUERIES["x6_hll_mergeable"](spark, SF).collect()
    li = load_table(spark, SF, "lineitem")
    exact_per_flag = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n")).collect()
    }
    assert len(rows) == 3
    for r in rows:
        assert r["exact_orders"] == exact_per_flag[r["l_returnflag"]]
        assert r["est_ok"], r      # per-group estimate within 5% of exact
        assert r["global_ok"], r   # unioned sketch within 5% of exact global


def test_quantiles_approx_matches_exact_schema_and_values(spark):
    """approx_quantiles_sketch is the scale-path twin of x6_quantiles:
    identical column names (so a caller can swap plans without schema
    churn) and GK values within 2% of the exact interpolated percentiles.
    The registered x6_quantiles_approx re-checks the same bound inline and
    must report within_tol=True on every metric row."""
    from swiftbulkuploader_spark.operators.profiling import approx_quantiles_sketch

    exact = registry.QUERIES["x6_quantiles"](spark, SF)
    sketch = approx_quantiles_sketch(spark, SF)
    assert sketch.columns == exact.columns
    e, a = exact.first(), sketch.first()
    for col in exact.columns:
        assert abs(a[col] - e[col]) / abs(e[col]) < 0.02, col

    checked = registry.QUERIES["x6_quantiles_approx"](spark, SF).collect()
    assert len(checked) == 5
    assert all(r["within_tol"] for r in checked), checked
    by_metric = {r["metric"]: r["exact_value"] for r in checked}
    assert by_metric["qty_p50"] == e["qty_p50"]


def test_queries_survive_hostile_session_conf(spark):
    """The driver builds its own session; the engine must not depend on our
    tuned conf. Flip timezone + ANSI mode to hostile values, run the most
    conf-sensitive queries (timestamp windows, as-of join, formatting,
    division), and pin results identical to the clean-session run —
    catalog._ensure_session_defaults is the mechanism under test."""
    sensitive = ["a8_rate_window", "w2_running_total", "x7_asof_join",
                 "f6_f8_report_formatting", "a7_progress_pct"]
    baseline = {n: registry.QUERIES[n](spark, SF).collect() for n in sensitive}
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    old_ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        for n in sensitive:
            hostile = registry.QUERIES[n](spark, SF).collect()
            assert sorted(map(tuple, hostile)) == sorted(map(tuple, baseline[n])), n
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
        spark.conf.set("spark.sql.ansi.enabled", old_ansi)


def test_total_operators_survive_empty_tables(spark, tmp_path):
    """Operators that are total functions of their input must return
    EMPTY (or well-defined aggregate) results on empty tables — not crash.
    Empty corpora are what a filter cascade can legitimately produce."""
    import pyspark.sql.types as T

    schemas = {
        "documents": "doc_id long, text string, lang string, source string, n_chars long",
        "events": ("event_id long, ts timestamp, user_id long, event_type string, "
                   "value double, props string"),
        "orders": ("o_orderkey long, o_custkey long, o_orderstatus string, "
                   "o_totalprice double, o_orderdate timestamp, o_orderpriority string"),
        "customer": "c_custkey long, c_name string, c_nationkey long, c_acctbal double",
        "lineitem": ("l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
                     "l_extendedprice double, l_discount double, l_tax double, "
                     "l_returnflag string, l_linestatus string, l_shipdate timestamp"),
    }
    for name, schema in schemas.items():
        spark.createDataFrame([], schema).write.parquet(str(tmp_path / f"{name}.parquet"))

    total_fns = [
        "x1_exact_dedup", "x1_repeated_passages", "x1_contamination",
        "x1_contamination_indexed", "x3_token_stats", "x3_quality_model",
        "x3_vocab_growth", "x8_pagerank", "u2_merge_upsert",
        "x6_incremental_agg",
    ]
    from swiftbulkuploader_spark import registry

    for name in total_fns:
        rows = registry.QUERIES[name](spark, str(tmp_path)).collect()
        assert isinstance(rows, list), name  # ran to completion


def test_dq_audit_detects_crafted_violations(spark, tmp_path):
    """The driver tables are clean (every check passes), so prove the audit
    FIRES: duplicate key, null FK, non-positive price, orphan lineitem,
    orphan order — each check must count its planted violation."""
    from swiftbulkuploader_spark.operators.profiling import x6_dq_audit

    orders = [
        (1, 10, "O", 5.0, None, "1-URGENT"),
        (1, 10, "O", 6.0, None, "1-URGENT"),     # duplicate o_orderkey
        (2, None, "F", 7.0, None, "2-HIGH"),      # null o_custkey
        (3, 99, "F", -1.0, None, "3-MEDIUM"),     # non-positive price; 99 has no customer
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, 1.0), (777, 2.0)], "l_orderkey long, l_quantity double"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))  # 777 is an orphan
    spark.createDataFrame(
        [(10, "a")], "c_custkey long, c_name string"
    ).write.parquet(str(tmp_path / "customer.parquet"))

    got = {r["check"]: r for r in x6_dq_audit(spark, str(tmp_path)).collect()}
    assert got["orders.o_orderkey.unique"]["violations"] == 1
    assert got["orders.o_custkey.not_null"]["violations"] == 1
    assert got["orders.o_totalprice.positive"]["violations"] == 1
    assert got["lineitem.l_orderkey.referential"]["violations"] == 1
    # null FK never matches a parent; 99 has no customer row -> 2 orphans
    assert got["orders.o_custkey.referential"]["violations"] == 2
    assert all(not r["passed"] for r in got.values())
