"""Crafted-data semantic pins for the round-9 report operators that are
pure formulas over aggregates (CLAUDE.md rule 7): the power-analysis
sample-size arithmetic recomputed in plain Python, and the resume plan's
partition accounting. The value-hash oracles cover engine parity; these
pin the FORMULAS against an independent implementation."""

from __future__ import annotations

import math

import pytest


class TestPowerAnalysis:
    def test_formula_matches_python_replica(self, spark):
        from swiftbulkuploader_spark.operators.stats_inference import (
            POWER_LIFTS,
            POWER_Z_ALPHA,
            POWER_Z_BETA,
            x6_power_analysis,
        )

        rows = {round(r["lift"], 4): r for r in
                x6_power_analysis(spark, "/root/testdata/sf0.001").collect()}
        assert set(rows) == {round(x, 4) for x in POWER_LIFTS}
        zsum = POWER_Z_ALPHA + POWER_Z_BETA
        for lift, r in rows.items():
            p1 = r["p_base"]
            assert 0.0 < p1 < 1.0          # live substrate, not degenerate
            p2 = min(p1 * (1.0 + r["lift"]), 1.0)
            assert r["p_target"] == pytest.approx(p2, abs=1e-12)
            n_req = math.ceil(
                zsum * zsum * (p1 * (1 - p1) + p2 * (1 - p2))
                / ((p2 - p1) * (p2 - p1))
            )
            assert r["n_required_per_arm"] == n_req
            assert r["achievable_now"] == (r["n_a"] >= n_req)
            assert r["mde_at_current_n"] == pytest.approx(
                zsum * math.sqrt(2 * p1 * (1 - p1) / r["n_a"]), rel=1e-12
            )
        # larger lifts need fewer users — the curve must be monotone
        lifts = sorted(rows)
        reqs = [rows[x]["n_required_per_arm"] for x in lifts]
        assert reqs == sorted(reqs, reverse=True)


class TestResumePlan:
    def test_partition_accounting(self, spark):
        from swiftbulkuploader_spark.operators.training_prep import (
            N_SHARDS,
            RESUME_DONE_MOD,
            x10_resume_plan,
        )

        rows = x10_resume_plan(spark, "/root/testdata/sf0.001").collect()
        by_shard = {r["shard_id"]: r for r in rows}
        assert set(by_shard) == set(range(N_SHARDS))
        pending = sorted(
            (r for r in rows if r["status"] == "pending"),
            key=lambda r: r["shard_id"],
        )
        done = [r for r in rows if r["status"] == "done"]
        assert {r["shard_id"] % RESUME_DONE_MOD for r in done} == {0}
        assert all(r["shard_id"] % RESUME_DONE_MOD != 0 for r in pending)
        # done rows carry sentinels
        for r in done:
            assert r["resume_order"] == -1 and r["tokens_before"] == -1
        # resume order is 1..k by shard_id, and tokens_before is the
        # exclusive prefix sum of pending token masses in that order
        assert [r["resume_order"] for r in pending] == list(
            range(1, len(pending) + 1)
        )
        cum = 0
        for r in pending:
            assert r["tokens_before"] == cum
            cum += r["n_tokens"]
        assert all(r["n_docs"] > 0 for r in rows)
