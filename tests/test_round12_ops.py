"""Crafted-data semantics pins for the round-12 operators: each new
oracled query also gets a hand-computable fixture (the house rule —
oracle agreement proves both engines MATCH; these pin that the values
are the RIGHT ones)."""

from __future__ import annotations

import hashlib
import math

import pytest

DOC_SCHEMA = ("doc_id: long, text: string, lang: string, source: string, "
              "n_chars: long")


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


class TestPiiScrub:
    def test_counts_and_redaction_on_crafted_text(self, spark, tmp_path):
        from swiftbulkuploader_spark.operators.textops import x3_pii_scrub

        # doc 1/2: no injected contact line (1,2 avoid % 3/4/7 == 0);
        # doc 12: injected email (12%3=0) + phone (12%4=0), clean text
        d = _write_docs(spark, tmp_path, [
            (1, "mail a@b.co and c@d.io call 555-123-4567 at 1.2.3.4 end",
             "en", "s", 1),
            (2, "nothing sensitive here at all", "en", "s", 1),
            (12, "clean body", "en", "s", 1),
        ])
        out = {r["doc_id"]: r for r in x3_pii_scrub(spark, d).collect()}

        r1 = out[1]
        assert (r1["n_emails"], r1["n_phones"], r1["n_ips"]) == (2, 1, 1)
        assert not r1["pii_free"]
        expected1 = "mail <EMAIL> and <EMAIL> call <PHONE> at <IP> end"
        assert r1["redacted_len"] == len(expected1)

        r2 = out[2]
        assert (r2["n_emails"], r2["n_phones"], r2["n_ips"]) == (0, 0, 0)
        assert r2["pii_free"]
        assert r2["redacted_len"] == len("nothing sensitive here at all")

        r12 = out[12]
        assert (r12["n_emails"], r12["n_phones"], r12["n_ips"]) == (1, 1, 0)
        expected12 = "clean body contact <EMAIL> call <PHONE>"
        assert r12["redacted_len"] == len(expected12)


class TestFeatureHashing:
    def test_hand_computed_buckets(self, spark, tmp_path):
        from swiftbulkuploader_spark.operators.textops import (
            FH_DIM,
            x3_feature_hashing,
        )

        d = _write_docs(spark, tmp_path, [(7, "a b a", "en", "s", 1)])
        row = x3_feature_hashing(spark, d).collect()[0]

        def bucket(g: str) -> int:
            return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % FH_DIM

        grams = ["a", "b", "a", "a b", "b a"]
        counts: dict[int, int] = {}
        for g in grams:
            counts[bucket(g)] = counts.get(bucket(g), 0) + 1
        assert row["n_grams"] == 5
        assert row["nnz"] == len(counts)
        assert row["n_collisions"] == 5 - len(counts)
        assert row["l2_norm"] == pytest.approx(
            round(math.sqrt(sum(c * c for c in counts.values())), 6)
        )


class TestDatasetDiff:
    def test_all_four_statuses(self, spark, tmp_path):
        from swiftbulkuploader_spark.operators.training_prep import (
            x10_dataset_diff,
        )

        d = _write_docs(spark, tmp_path, [
            (1, "stable text", "en", "s", 1),    # in both, unchanged
            (5, "only epoch b", "en", "s", 1),   # %5 -> added
            (7, "only epoch a", "en", "s", 1),   # %7 -> removed
            (11, "edited text", "en", "s", 1),   # %11 -> changed
            (35, "in neither", "en", "s", 1),    # %5 and %7 -> no row
        ])
        got = {r["doc_id"]: r["status"]
               for r in x10_dataset_diff(spark, d).collect()}
        assert got == {1: "unchanged", 5: "added", 7: "removed",
                       11: "changed"}


class TestPpr:
    def test_analytic_path_graph(self, spark, tmp_path):
        """PPR on the path 1-2-3 seeded at node 1 (alpha 0.15, 3
        rounds) has a closed-form unrolling — p3 = (0.2041875,
        0.741625, 0.0541875), mass exactly 1."""
        from swiftbulkuploader_spark.operators.components import x8_ppr

        rows = []
        ok = 0
        for pair in ((1, 2), (2, 3)):   # two orders per pair: shared = 2
            for _ in range(2):
                ok += 1
                rows += [(ok, p) for p in pair]
        spark.createDataFrame(
            rows, "l_orderkey long, l_partkey long"
        ).write.parquet(str(tmp_path / "lineitem.parquet"))

        got = {r["node"]: r["pr"]
               for r in x8_ppr(spark, str(tmp_path)).collect()}
        assert got[1] == pytest.approx(0.2041875)
        assert got[2] == pytest.approx(0.741625)
        assert got[3] == pytest.approx(0.0541875)
        assert sum(got.values()) == pytest.approx(1.0)


class TestSilenceDetect:
    def test_gate_arithmetic(self, spark, tmp_path):
        """Per-clip silence runs follow the gate formula: lead =
        (id % 4) * 8, trail = (id % 3) * 4, and tone-interior zeros
        (cos quarter-periods) count in n_silent but never extend the
        leading/trailing runs past a nonzero sample."""
        from swiftbulkuploader_spark.operators.media_queries import (
            x9_silence_detect,
        )

        d = _write_docs(spark, tmp_path, [
            (i, f"doc {i}", "en", "s", 1) for i in range(8)
        ])
        out = {r["media_id"]: r for r in
               x9_silence_detect(spark, d).collect()}
        for i, r in out.items():
            n = 40 + i % 160
            lead, trail = (i % 4) * 8, (i % 3) * 4
            assert r["n_samples"] == n
            # the first in-gate sample is tone[(k*lead) % 32]; for every
            # fixture residue it is nonzero except when the tone phase
            # lands on a quarter period — assert run bounds instead of
            # exact equality where the phase can extend the run
            assert r["lead_silence"] >= lead
            assert r["trail_silence"] >= trail
            assert r["n_silent"] >= lead + trail
            assert r["n_silent"] < n  # never all-silent
            assert 0.0 <= r["n_silent"] / n < 1.0
