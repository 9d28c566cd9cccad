"""Textbook-sequence pins for the unigram-LM tokenizer (r8 verdict ask
#5): the Viterbi DP on hand-checkable vocabularies, the hard-EM training
loop on a corpus whose optimal pieces are known in advance, and the
encode fertility accounting — all on crafted data small enough to verify
by hand (CLAUDE.md rule 7). The value-hash oracle covers engine parity;
these cover SEMANTICS."""

from __future__ import annotations

import math

import pytest


def _write_documents(spark, tmp_path, texts):
    rows = [(i, t, "en", f"src{i % 2}", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, "
              "n_chars: long"
    ).write.parquet(str(tmp_path / "documents.parquet"))


def _segment(spark, word_counts, vocab_lp):
    from swiftbulkuploader_spark.operators.textops import _viterbi_segment

    words = spark.createDataFrame(
        [(w, c) for w, c in word_counts.items()], "w: string, cnt: long"
    )
    vocab = spark.createDataFrame(
        [(p, lp) for p, lp in vocab_lp.items()], "piece: string, lp: double"
    )
    return {
        r["w"]: list(r["pieces"])
        for r in _viterbi_segment(words, vocab).collect()
    }


class TestViterbiSegment:
    def test_textbook_sequence(self, spark):
        """The Kudo-paper shape: with p(ab) > p(a)p(b), 'abab' must
        segment as [ab, ab], never four singles; 'aab' has no 'aa'
        piece so the best path is a + ab. Backtrace emits pieces
        END-FIRST (documented order)."""
        vocab = {
            "a": math.log(0.2),
            "b": math.log(0.2),
            "c": math.log(0.1),
            "ab": math.log(0.4),
        }
        seg = _segment(spark, {"abab": 1, "aab": 1, "cc": 1}, vocab)
        assert seg["abab"] == ["ab", "ab"]            # 2 ln .4 > 4 ln .2
        assert seg["aab"] == ["ab", "a"]              # backward order
        assert seg["cc"] == ["c", "c"]                # singles fallback

    def test_prefers_singles_when_pair_is_rare(self, spark):
        """Flip the probabilities: with p(ab) < p(a)p(b) the singles
        path must win — the DP genuinely compares path scores."""
        vocab = {
            "a": math.log(0.45),
            "b": math.log(0.45),
            "ab": math.log(0.1),
        }
        seg = _segment(spark, {"abab": 1}, vocab)
        assert seg["abab"] == ["b", "a", "b", "a"]

    def test_smallest_j_tie_break(self, spark):
        """Exact tie between [a,a] and [aa]: ptr takes the SMALLEST j
        (singles path), the same CASE order the oracle replays."""
        vocab = {"a": math.log(0.25), "aa": math.log(0.0625)}
        seg = _segment(spark, {"aa": 1}, vocab)
        assert seg["aa"] == ["a", "a"]

    def test_long_piece_beats_chain(self, spark):
        """A 4-char piece with high probability swallows the word."""
        vocab = {
            "d": math.log(0.1), "e": math.log(0.1), "a": math.log(0.1),
            "dead": math.log(0.5),
        }
        seg = _segment(spark, {"dead": 1}, vocab)
        assert seg["dead"] == ["dead"]


class TestUnigramTrain:
    @pytest.fixture()
    def corpus_dir(self, spark, tmp_path):
        # hand-checked fixed point: seed total T = 69 > 24, so
        # ln(6/T) > 2 ln(12/T) and 'abab' swallows itself in round 1;
        # round 2 re-confirms at the re-estimated probabilities
        _write_documents(
            spark, tmp_path,
            ["abab abab abab", "abab cd cd", "abab abab cd"],
        )
        # fresh session-state per fixture use: the trainer memoizes per
        # (applicationId, sf_dir) so distinct tmp_path keys never collide
        return str(tmp_path)

    def test_learns_dominant_piece(self, spark, corpus_dir):
        from swiftbulkuploader_spark.operators.textops import (
            x3_unigram_train,
        )

        rows = {r["piece"]: r for r in
                x3_unigram_train(spark, corpus_dir).collect()}
        # chars always survive with the +1 floor (Viterbi never picks
        # them here, so each sits at exactly 0 + 1)
        for ch in ["a", "b", "c", "d"]:
            assert ch in rows
            assert rows[ch]["cnt"] == 1
        # with UNIGRAM_MAXP = 4 the whole word 'abab' is a piece and
        # swallows itself (1 piece beats 2x 'ab' at any probabilities
        # from these counts): 6 occurrences -> usage 6; 'cd' x3
        assert rows["abab"]["cnt"] == 6
        assert rows["cd"]["cnt"] == 3
        # unused multi-char seed pieces (ab, ba, bab, ...) are pruned
        assert "ab" not in rows
        assert "ba" not in rows
        # log-probs are exact ln(c/total) over the final counts
        total = sum(r["cnt"] for r in rows.values())
        for r in rows.values():
            assert r["logprob"] == pytest.approx(
                math.log(r["cnt"] / total), abs=1e-12
            )

    def test_encode_fertility_accounting(self, spark, corpus_dir):
        from swiftbulkuploader_spark.operators.textops import (
            x3_unigram_encode,
        )

        out = {r["source"]: r for r in
               x3_unigram_encode(spark, corpus_dir).collect()}
        n_words = sum(r["n_words"] for r in out.values())
        n_pieces = sum(r["n_pieces"] for r in out.values())
        assert n_words == 9            # 9 whitespace tokens
        # every word is one learned piece: 6x 'abab' + 3x 'cd'
        assert n_pieces == 9
        for r in out.values():
            assert r["n_long_words"] == 0
            assert r["fertility"] == pytest.approx(
                r["n_pieces"] / r["n_words"], abs=1e-12
            )
            # no single-char fallbacks in this clean corpus
            assert r["n_single_pieces"] == 0


class TestWordpieceEncode:
    def test_crafted_corpus_greedy_and_unk(self, spark, tmp_path):
        """Hand-computed WordPiece on a crafted corpus:
        words abcd x3, xy x2, abcdxy x2, q x1 (single source).
        Greedy: 'abcd' -> 1 piece (start-class 4-gram), 'xy' -> 1,
        'abcdxy' -> 'abcd' + '##xy' = 2, 'q' -> UNK (hapax single char
        falls under WP_MIN_CHAR; np_eff 1, unk true).
        n_words 8, n_pieces 3+2+4+1 = 10, unk 1, fertility 1.25."""
        from swiftbulkuploader_spark.operators.textops import (
            x3_wordpiece_encode,
        )

        rows = [
            (0, "abcd abcd abcd xy xy", "en", "s", 20),
            (1, "abcdxy abcdxy q", "en", "s", 15),
        ]
        spark.createDataFrame(
            rows,
            "doc_id: long, text: string, lang: string, source: string, "
            "n_chars: long",
        ).write.parquet(str(tmp_path / "documents.parquet"))
        r = x3_wordpiece_encode(spark, str(tmp_path)).collect()
        assert len(r) == 1
        r = r[0]
        assert r["n_words"] == 8
        assert r["n_pieces"] == 10
        assert r["n_unk_words"] == 1
        assert r["n_long_words"] == 0
        assert abs(r["fertility"] - 1.25) < 1e-12
        assert abs(r["unk_rate"] - 0.125) < 1e-12

    def test_fixture_liveness(self, spark):
        """Real-substrate liveness: every source present, fertility
        strictly between 1 (no word fully in vocab at every length) and
        4 (max piece length bounds it), and — documented substrate
        honesty — unk/long are exactly 0 on this clean generator."""
        from swiftbulkuploader_spark.operators.textops import (
            x3_wordpiece_encode,
        )

        rows = x3_wordpiece_encode(spark, "/root/testdata/sf0.01").collect()
        assert len(rows) == 20
        for r in rows:
            assert r["n_words"] > 0
            assert 1.0 < r["fertility"] < 4.0
            assert r["n_unk_words"] == 0 and r["n_long_words"] == 0
