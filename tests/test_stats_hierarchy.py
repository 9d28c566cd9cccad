"""Semantic pins for the inference aggregates and the recursive hierarchy
(the oracle proves engine parity; these prove the *numbers mean what the
docstrings claim*)."""

from __future__ import annotations

from swiftbulkuploader_spark.operators.hierarchy import x8_recursive_hierarchy
from swiftbulkuploader_spark.operators.stats_inference import (
    x6_regression_stats,
    x6_top_frequent,
)

SF = "/root/testdata/sf0.001"


def test_regression_stats_sane(spark):
    rows = {r["l_returnflag"]: r for r in x6_regression_stats(spark, SF).collect()}
    assert set(rows) == {"A", "N", "R"}
    for r in rows.values():
        # driver data draws price independent of quantity: near-zero fit,
        # but the algebraic identities must hold regardless of the data
        assert 0.0 <= r["r2"] <= 1.0
        assert abs(r["corr_yx"]) < 0.2
        # r2 == corr^2 for simple OLS (both rounded to 6 dp)
        assert abs(r["r2"] - r["corr_yx"] ** 2) < 1e-5
        # slope == covar / var(x) (reconstruct from the reported pieces)
        assert abs(r["slope"] - r["covar_yx"] / r["sd_qty"] ** 2) < 1e-3
        assert r["n"] > 0


def test_top_frequent_is_exact_in_small_domain(spark):
    import duckdb

    got = {(r["brand"], r["cnt"]) for r in x6_top_frequent(spark, SF).collect()}
    exact = set(
        duckdb.sql(
            f"SELECT p_brand, count(*) FROM '{SF}/part.parquet' GROUP BY 1"
        ).fetchall()
    )
    assert got == exact


def test_hierarchy_invariants(spark):
    rows = x8_recursive_hierarchy(spark, SF).collect()
    n_customers = spark.read.parquet(f"{SF}/customer.parquet").count()
    # every customer appears exactly once (the trie covers all keys >= 1)
    assert len(rows) == n_customers
    assert len({r["custkey"] for r in rows}) == n_customers
    for r in rows:
        parts = r["path"].split("/")
        assert r["depth"] == len(parts) - 1
        assert int(parts[0]) == r["root"]
        assert int(parts[-1]) == r["custkey"]
        # each path step is the decimal-trie parent of the next
        for parent, child in zip(parts, parts[1:]):
            assert int(child) // 10 == int(parent)


def test_pagerank_star_graph(spark, tmp_path):
    """On a star interaction graph (every user touches item 0, one user also
    touches item 1), the hub item must outrank the leaf item, ranks must be
    positive, and the vector must (approximately) conserve mass:
    sum(pr) ≈ teleport_total + damping * 1.0 (symmetrized graph, no
    dangling nodes)."""
    import json

    from swiftbulkuploader_spark.operators.hierarchy import x8_pagerank

    rows = [
        (i, "2024-01-01 00:00:00", i % 5, "view", 1.0, json.dumps({"k": 0}))
        for i in range(10)
    ]
    rows.append((10, "2024-01-01 00:00:01", 0, "view", 1.0, json.dumps({"k": 1})))
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    ).write.parquet(str(tmp_path / "events.parquet"))

    pr = {r["node"]: r["pr"] for r in x8_pagerank(spark, str(tmp_path)).collect()}
    # nodes: users 0-4, items -1 (hub, k=0) and -2 (leaf, k=1)
    assert set(pr) == {0, 1, 2, 3, 4, -1, -2}
    assert pr[-1] > pr[-2]                # hub collects more rank
    assert pr[0] > pr[1]                  # user 0 has an extra in-edge
    assert all(v > 0 for v in pr.values())
    total = sum(pr.values())
    assert abs(total - 1.0) < 0.2          # 3 rounds haven't fully mixed, but
    # mass stays near 1 on a dangling-free graph


def test_hits_star_graph(spark, tmp_path):
    """HITS on the pagerank star fixture (users 0-4 -> item 0, user 0 also
    -> item 1): the shared item must out-score the niche item as an
    authority, the two-item user must out-score single-item users as a
    hub, every score is positive, and each role's L1 norm is 1 (the
    normalization contract)."""
    import json

    from swiftbulkuploader_spark.operators.hierarchy import x8_hits

    rows = [
        (i, "2024-01-01 00:00:00", i % 5, "view", 1.0, json.dumps({"k": 0}))
        for i in range(10)
    ]
    rows.append((10, "2024-01-01 00:00:01", 0, "view", 1.0, json.dumps({"k": 1})))
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = {(r["role"], r["node"]): r["score"]
           for r in x8_hits(spark, str(tmp_path)).collect()}
    hubs = {n: s for (role, n), s in got.items() if role == "hub"}
    auths = {n: s for (role, n), s in got.items() if role == "auth"}
    assert set(hubs) == {0, 1, 2, 3, 4} and set(auths) == {0, 1}
    assert auths[0] > auths[1]            # item 0 has 5 in-edges vs 1
    assert hubs[0] > hubs[1]              # user 0 points at both items
    assert all(v > 0 for v in list(hubs.values()) + list(auths.values()))
    assert abs(sum(hubs.values()) - 1.0) < 1e-9
    assert abs(sum(auths.values()) - 1.0) < 1e-9


def test_pagerank_converges_to_known_fixed_point(spark):
    """Until-convergence PageRank on a 5-node symmetric star: the fixed
    point is analytically solvable (p_c = 0.132/0.2775, p_leaf =
    0.03 + 0.2125*p_c) — converged ranks must hit it to 1e-3 and one
    extra round must not move any node (the certificate
    x8_pagerank_converged emits)."""
    from pyspark.sql import functions as F

    from swiftbulkuploader_spark.operators.hierarchy import (
        _pr_round,
        pagerank_until_converged,
    )

    star = [(0, leaf) for leaf in (1, 2, 3, 4)]
    edges = spark.createDataFrame(
        star + [(b, a) for a, b in star], "src long, dst long"
    ).localCheckpoint(eager=True)
    ranks, (deg, nodes, n), delta = pagerank_until_converged(edges, rel_tol=1e-4)
    got = {r["node"]: r["pr"] for r in ranks.collect()}
    p_c = 0.132 / 0.2775
    p_leaf = 0.03 + 0.2125 * p_c
    assert abs(got[0] - p_c) < 1e-3
    for leaf in (1, 2, 3, 4):
        assert abs(got[leaf] - p_leaf) < 1e-3
    # fixed point: one more propagation round moves nothing materially
    nxt = {r["node"]: r["pr"]
           for r in _pr_round(edges, deg, nodes, n, ranks).collect()}
    assert all(abs(nxt[k] - got[k]) <= 1e-2 / n for k in got)


class TestHillTail:
    def test_pareto_alpha_recovered(self, spark, tmp_path):
        """Exact Pareto(alpha=1) order statistics x_i = N/i: the Hill sum
        is sum ln((N/i)/(N/(k+1))) = sum ln((k+1)/i), so alpha_hat =
        k / sum ln((k+1)/i) — computable in closed form and ~1.07 for
        k=100 (the estimator's small-sample bias, deterministic here)."""
        import math

        import pytest

        from swiftbulkuploader_spark.operators.profiling import (
            HILL_K,
            x6_hill_tail,
        )

        n = 300
        rows = [
            (i, "t", "en", "s", int(round(3_000_000 / i))) for i in range(1, n + 1)
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id: long, text: string, lang: string, source: string, n_chars: long",
        )
        df.write.parquet(str(tmp_path / "documents.parquet"))
        r = x6_hill_tail(spark, str(tmp_path)).collect()[0]
        assert r["k"] == HILL_K
        expected = HILL_K / sum(
            math.log(round(3_000_000 / i) / round(3_000_000 / (HILL_K + 1)))
            for i in range(1, HILL_K + 1)
        )
        assert r["alpha"] == pytest.approx(expected, rel=1e-9)
        assert r["infinite_variance"] is True
