"""Semantic pins for sequence packing and int8 quantization — the oracle
proves cross-engine parity; these prove the operators do what a training
pipeline needs them to do."""

from __future__ import annotations

import pytest

from swiftbulkuploader_spark.functions.text import token_count
from swiftbulkuploader_spark.operators.training_prep import (
    TOKEN_BUDGET,
    x2_quantized_codes,
    x3_pack_sequences,
)
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_packing_reconciles_and_orders(spark):
    chunks = x3_pack_sequences(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    totals = {
        r["lang"]: (r["n"], r["toks"])
        for r in docs.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum(token_count(F.col("text")).cast("long")).alias("toks"),
        )
        .collect()
    }
    by_lang: dict[str, list] = {}
    for c in chunks:
        by_lang.setdefault(c["lang"], []).append(c)
    assert set(by_lang) == set(totals)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r["chunk_id"])
        # every document lands in exactly one chunk; token mass conserved
        assert sum(r["n_docs"] for r in rows) == totals[lang][0]
        assert sum(r["chunk_tokens"] for r in rows) == totals[lang][1]
        # chunks start at 0 and doc spans never overlap across chunks
        assert rows[0]["chunk_id"] == 0
        for a, b in zip(rows, rows[1:]):
            assert a["last_doc"] < b["first_doc"]
        # non-final chunks hold at least a full budget minus the straddle
        # slack (a doc is attributed to the chunk its FIRST token lands in),
        # i.e. cumulative tokens reach the next chunk boundary
        cum = 0
        for r in rows[:-1]:
            cum += r["chunk_tokens"]
            assert cum >= (r["chunk_id"] + 1) * TOKEN_BUDGET


def test_quantized_codes_hit_full_scale(spark):
    rows = x2_quantized_codes(spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert len(rows) == emb.count()
    dims = {r["n_dims"] for r in rows}
    assert len(dims) == 1  # uniform dimensionality
    for r in rows:
        # symmetric scaling maps the max-|x| coordinate to exactly +/-127
        assert r["max_q"] == 127 or r["min_q"] == -127
        assert -127 <= r["min_q"] <= r["max_q"] <= 127
        assert r["l1_q"] >= abs(r["sum_q"])


def test_quantization_reconstruction_error_bounded(spark):
    """|x - code*scale| <= scale/2 per coordinate — the defining property of
    round-to-nearest quantization, checked in plain Python on a sample."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(20).collect()
    for row in emb:
        v = [float(x) for x in row["embedding"]]
        scale = max(abs(x) for x in v) / 127.0
        if scale == 0:
            pytest.skip("degenerate zero vector in fixture")
        for x in v:
            code = round(x / scale)
            assert abs(x - code * scale) <= scale / 2 + 1e-12


class TestSourceMixing:
    def test_alpha_flattens_mix(self, spark):
        """alpha=0.5 tempering must flatten the source distribution: every
        low-resource source's mix weight >= its raw share, the largest
        source's <=, and weights sum to 1."""
        from swiftbulkuploader_spark.operators.training_prep import x6_source_mixing

        rows = x6_source_mixing(spark, "/root/testdata/sf0.001").collect()
        assert abs(sum(r["mix_weight"] for r in rows) - 1.0) < 1e-4
        mean_share = 1.0 / len(rows)
        for r in rows:
            if r["raw_share"] < mean_share:
                assert r["mix_weight"] >= r["raw_share"], r["source"]
            if r["raw_share"] > mean_share:
                assert r["mix_weight"] <= r["raw_share"], r["source"]

    def test_budget_conserved(self, spark):
        from swiftbulkuploader_spark.operators.training_prep import (
            MIX_TOKEN_BUDGET,
            x6_source_mixing,
        )

        rows = x6_source_mixing(spark, "/root/testdata/sf0.001").collect()
        total_target = sum(r["target_tokens"] for r in rows)
        # rounding each source independently: off by at most n_sources/2
        assert abs(total_target - MIX_TOKEN_BUDGET) <= len(rows)


class TestGlobalShuffle:
    def test_deterministic_permutation(self, spark):
        """Every doc appears exactly once; positions within each shard are
        1..shard_size with no gaps; two runs agree exactly."""
        from swiftbulkuploader_spark.operators.training_prep import x6_global_shuffle

        sf = "/root/testdata/sf0.001"
        a = {r["doc_id"]: (r["shard_id"], r["pos"]) for r in x6_global_shuffle(spark, sf).collect()}
        b = {r["doc_id"]: (r["shard_id"], r["pos"]) for r in x6_global_shuffle(spark, sf).collect()}
        assert a == b and len(a) == 500
        by_shard: dict[int, list[int]] = {}
        for shard, pos in a.values():
            by_shard.setdefault(shard, []).append(pos)
        for shard, ps in by_shard.items():
            assert sorted(ps) == list(range(1, len(ps) + 1)), shard

    def test_shards_balanced(self, spark):
        """Hash-mod sharding: no shard more than 2x the ideal size."""
        from swiftbulkuploader_spark.operators.training_prep import (
            N_SHARDS,
            x6_global_shuffle,
        )

        rows = x6_global_shuffle(spark, "/root/testdata/sf0.001").collect()
        counts: dict[int, int] = {}
        for r in rows:
            counts[r["shard_id"]] = counts.get(r["shard_id"], 0) + 1
        assert len(counts) == N_SHARDS
        assert max(counts.values()) < 2 * (len(rows) / N_SHARDS)


class TestTrainingManifest:
    def test_stages_compose(self, spark, tmp_path):
        """Crafted corpus: a low-quality doc, an exact dup, and a
        contaminated doc must all be excluded; survivors packed."""
        from pyspark.sql import functions as F

        from swiftbulkuploader_spark.operators.training_prep import x10_training_manifest

        probe = "the quick brown fox jumps over the lazy dog tonight again"
        good = ("a perfectly reasonable training document with plenty of "
                "clean alphabetic text that easily clears the quality floor "
                "and has no overlap with any evaluation probe at all")
        dup = good  # exact duplicate: only the lower doc_id survives
        contaminated = ("prologue filler words " * 3) + probe + (" trailing text" * 3)
        junk = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"  # punct-heavy: low quality
        rows = [(i, probe) for i in range(8)]
        rows += [(8, good), (9, dup), (10, contaminated), (11, junk)]
        df = spark.createDataFrame(rows, "doc_id: long, text: string").withColumns(
            {"lang": F.lit("en"), "source": F.lit("s"), "n_chars": F.length("text")}
        )
        df.write.parquet(str(tmp_path / "documents.parquet"))
        chunks = x10_training_manifest(spark, str(tmp_path)).collect()
        # survivors: doc 8 only (9 dup of 8, 10 contaminated, 11 low quality)
        assert sum(r["n_docs"] for r in chunks) == 1
        assert len(chunks) == 1 and chunks[0]["chunk_id"] == 0


class TestDsirSelect:
    def test_target_like_docs_score_higher(self, spark, tmp_path):
        """Crafted corpus: docs made of the target domain's vocabulary must
        OUTSCORE docs from a disjoint vocabulary — the selection ordering on
        a corpus where the right answer is unambiguous. (The absolute zero
        crossing is NOT asserted: at toy scale the +1/B additive smoothing
        mass dominates both distributions and shifts every weight; the
        threshold rule only separates target-like from corpus-like once
        token counts are large against B, which sf-scale corpora are.)"""
        from swiftbulkuploader_spark.operators.training_prep import (
            DSIR_TARGET,
            x6_dsir_select,
        )

        tgt_vocab = "alpha beta gamma delta epsilon"
        other_vocab = "zork quux fnord blarg wibble"
        rows = []
        # 4 target-domain exemplars (the reference distribution)
        for i in range(4):
            rows.append((i, tgt_vocab + " " + tgt_vocab, DSIR_TARGET))
        # 3 raw docs sharing the target vocabulary -> target-like
        for i in range(4, 7):
            rows.append((i, tgt_vocab, "raw_a"))
        # 3 raw docs from a disjoint vocabulary -> corpus-like only
        for i in range(7, 10):
            rows.append((i, other_vocab, "raw_b"))
        df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
        df = df.withColumns({"lang": F.lit("en"), "n_chars": F.length("text")})
        df.write.parquet(str(tmp_path / "documents.parquet"))

        out = {r["doc_id"]: r for r in x6_dsir_select(spark, str(tmp_path)).collect()}
        assert len(out) == 10
        # same token count (5) on both sides -> direct comparability: every
        # target-vocab doc outscores every disjoint-vocab doc
        for i in range(4, 7):
            for j in range(7, 10):
                assert out[i]["log_w"] > out[j]["log_w"], (out[i], out[j])
        # identical docs score identically; keep mirrors the sign exactly
        assert out[4]["log_w"] == out[5]["log_w"] == out[6]["log_w"]
        for r in out.values():
            assert r["keep"] == (r["log_w"] > 0)
        # weights are per-token sums: the doubled-text exemplars score
        # exactly twice the single-copy raw docs (same bucket multiset x2)
        assert abs(out[0]["log_w"] - 2 * out[4]["log_w"]) < 1e-9


class TestWeightedSample:
    def test_weight_proportional_and_deterministic(self, spark, tmp_path):
        """Efraimidis-Spirakis keys: with a 100:1 weight ratio the heavy
        half of a 2x-oversampled corpus dominates the sample; the draw is
        bit-stable across invocations and never repeats a doc."""
        from swiftbulkuploader_spark.operators.training_prep import (
            WSAMPLE_N,
            x6_weighted_sample,
        )

        rows = [(i, "t", "en", "heavy" if i < 200 else "light",
                 1000 if i < 200 else 10) for i in range(400)]
        spark.createDataFrame(
            rows,
            "doc_id: long, text: string, lang: string, source: string, n_chars: long",
        ).write.parquet(str(tmp_path / "documents.parquet"))
        a = x6_weighted_sample(spark, str(tmp_path)).collect()
        b = x6_weighted_sample(spark, str(tmp_path)).collect()
        assert a == b                                # deterministic
        assert len(a) == WSAMPLE_N
        ids = [r["doc_id"] for r in a]
        assert len(set(ids)) == WSAMPLE_N            # without replacement
        heavy = sum(1 for r in a if r["source"] == "heavy")
        assert heavy > 150                           # weight-proportional
        keys = [r["es_key"] for r in a]
        assert keys == sorted(keys)                  # smallest keys win


class TestDoremiWeights:
    def test_hard_domain_upweighted(self, spark, tmp_path):
        """A domain of rare tokens (high LM cross-entropy) must get its
        mixture share multiplied UP relative to a domain of common tokens;
        the best (lowest-xent) domain has excess exactly 0; weights
        renormalize to 1."""
        import pytest

        from swiftbulkuploader_spark.operators.training_prep import x6_doremi_weights

        easy = "the the the cat cat sat sat mat mat hat"
        rows = [(i, easy, "en", "easy", 1) for i in range(4)]
        hard_words = [f"rare{i}{j}" for i in range(4) for j in range(10)]
        rows += [
            (10 + i, " ".join(hard_words[i * 10:(i + 1) * 10]), "en", "hard", 1)
            for i in range(4)
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id: long, text: string, lang: string, source: string, n_chars: long",
        )
        df.write.parquet(str(tmp_path / "documents.parquet"))
        got = {r["source"]: r for r in x6_doremi_weights(spark, str(tmp_path)).collect()}
        easy_r, hard_r = got["easy"], got["hard"]
        assert easy_r["xent"] < hard_r["xent"]
        assert easy_r["excess"] == pytest.approx(0.0)
        assert hard_r["excess"] == pytest.approx(hard_r["xent"] - easy_r["xent"])
        assert easy_r["domain_weight"] + hard_r["domain_weight"] == pytest.approx(1.0)
        # upweighting: hard's weight/share ratio strictly exceeds easy's
        assert (hard_r["domain_weight"] / hard_r["base_share"]
                > easy_r["domain_weight"] / easy_r["base_share"])


class TestCurriculumOrder:
    def test_band_monotone_and_positions_dense(self, spark):
        """Phases partition docs by rounded keep_prob bands (every phase-p
        doc scores >= every phase-(p+1) doc at 6 dp), and pos is a dense
        1..n sequence within each (phase, shard)."""
        from swiftbulkuploader_spark.operators.training_prep import (
            x10_curriculum_order,
        )

        rows = x10_curriculum_order(spark, "/root/testdata/sf0.001").collect()
        assert rows, "smoke corpus produced no curriculum rows"
        assert {r["phase"] for r in rows} <= {1, 2, 3, 4}
        lo = {}
        hi = {}
        for r in rows:
            p, rp = r["phase"], round(r["keep_prob"], 6)
            lo[p] = min(lo.get(p, 1.0), rp)
            hi[p] = max(hi.get(p, 0.0), rp)
        phases = sorted(lo)
        for a, b in zip(phases, phases[1:]):
            assert lo[a] >= hi[b], f"band overlap between phase {a} and {b}"
        seqs = {}
        for r in rows:
            seqs.setdefault((r["phase"], r["shard_id"]), []).append(r["pos"])
        for key, ps in seqs.items():
            assert sorted(ps) == list(range(1, len(ps) + 1)), key


class TestClassBalancedWeights:
    def test_effective_number_saturation(self, spark, tmp_path):
        """Single-doc source: E_n = 1 exactly; a 3-doc source:
        E_n = 1 + b + b^2; weights renormalize the inverses."""
        import pytest

        from swiftbulkuploader_spark.operators.training_prep import (
            CB_BETA,
            x6_class_balanced_weights,
        )

        rows = [(0, "a b c", "en", "small", 1)] + [
            (i, "x y z", "en", "big", 1) for i in (1, 2, 3)
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id: long, text: string, lang: string, source: string, n_chars: long",
        )
        df.write.parquet(str(tmp_path / "documents.parquet"))
        got = {r["source"]: r
               for r in x6_class_balanced_weights(spark, str(tmp_path)).collect()}
        assert got["small"]["effective_num"] == pytest.approx(1.0)
        e3 = 1.0 + CB_BETA + CB_BETA ** 2
        assert got["big"]["effective_num"] == pytest.approx(e3)
        tot = 1.0 + 1.0 / e3
        assert got["small"]["weight"] == pytest.approx(1.0 / tot)
        assert got["big"]["weight"] == pytest.approx((1.0 / e3) / tot)
