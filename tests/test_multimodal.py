"""Multimodal plumbing: the Spark path (schema, batches, partitioning) is
real; codecs are stubbed (deterministic FAKEIMG + NotImplementedError rows
for real formats).
"""

from __future__ import annotations

import pytest

from swiftbulkuploader_spark.multimodal.media import (
    MEDIA_SCHEMA,
    decode_image_meta,
    extract_image_features,
    frame_sample_plan,
    media_stats,
    resize_image,
)


def _fakeimg(w: int, h: int, fill: int = 7) -> bytes:
    return b"FAKEIMG:" + f"{w}x{h}".encode() + b":" + bytes([fill]) * (w * h)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "fakeimg", _fakeimg(4, 3), {}),
        (2, "image", "fakeimg", _fakeimg(2, 2, fill=10), {}),
        (3, "image", "png", b"\x89PNG\r\n...", {}),          # real codec: stub
        (4, "image", "fakeimg", b"FAKEIMG:9x9:short", {}),    # truncated
        (5, "video", "fakevid", b"", {"n_frames": "25"}),
        (6, "video", "fakevid", b"", {"n_frames": "3"}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


class TestDecode:
    def test_fake_images_decode(self, spark, media):
        out = {r["media_id"]: r for r in decode_image_meta(media).collect()}
        assert (out[1]["width"], out[1]["height"]) == (4, 3)
        assert out[1]["mean_pixel"] == pytest.approx(7.0)
        assert out[2]["mean_pixel"] == pytest.approx(10.0)
        assert out[1]["decode_error"] is None

    def test_real_codec_is_stubbed_not_fatal(self, spark, media):
        out = {r["media_id"]: r for r in decode_image_meta(media).collect()}
        assert "NotImplementedError" in out[3]["decode_error"]
        assert "ValueError" in out[4]["decode_error"]
        # errors are rows; the job still returned every input
        assert len(out) == 6

    def test_binary_passthrough_lengths(self, spark, media):
        out = {r["media_id"]: r["n_bytes"] for r in decode_image_meta(media).collect()}
        assert out[1] == len(_fakeimg(4, 3))


class TestResizeAndFeatures:
    def test_resize_bounds_and_roundtrip(self, spark, media):
        out = {r["media_id"]: r for r in resize_image(media, max_side=2).collect()}
        # 4x3 -> scale 2 -> 2x2; already-small 2x2 unchanged
        assert (out[1]["width"], out[1]["height"]) == (2, 2)
        assert (out[2]["width"], out[2]["height"]) == (2, 2)
        # output is valid FAKEIMG: re-decoding it works and fill survives
        redecoded = {
            r["media_id"]: r
            for r in decode_image_meta(
                spark.createDataFrame(
                    [(1, "image", "fakeimg", out[1]["data"], {})], MEDIA_SCHEMA
                )
            ).collect()
        }
        assert redecoded[1]["mean_pixel"] == pytest.approx(7.0)
        assert "NotImplementedError" in out[3]["decode_error"]

    def test_resize_handles_colon_pixels(self, spark):
        # pixel value 0x3a == b":" — parsing must not split on pixel bytes
        img = b"FAKEIMG:2x2:" + bytes([0x3A] * 4)
        df = spark.createDataFrame([(9, "image", "fakeimg", img, {})], MEDIA_SCHEMA)
        (row,) = resize_image(df, max_side=2).collect()
        assert row["decode_error"] is None
        assert (row["width"], row["height"]) == (2, 2)

    def test_histogram_non_power_of_two_bins(self, spark):
        # bucket-by-division must cover the full 0-255 range for any n_bins:
        # pixel 255 lands in the LAST of 3 bins, and mass still sums to 1
        img = b"FAKEIMG:2x2:" + bytes([0, 100, 200, 255])
        df = spark.createDataFrame([(1, "image", "fakeimg", img, {})], MEDIA_SCHEMA)
        (row,) = extract_image_features(df, n_bins=3).collect()
        hist = row["histogram"]
        assert len(hist) == 3
        assert sum(hist) == pytest.approx(1.0)
        assert hist[2] > 0  # 200 and 255 both land in the top bin

    def test_histogram_features(self, spark, media):
        out = {r["media_id"]: r for r in extract_image_features(media).collect()}
        # fill=7 -> bin 0 (7 >> 5 == 0); normalized mass all in one bin
        assert out[1]["histogram"][0] == pytest.approx(1.0)
        assert sum(out[1]["histogram"]) == pytest.approx(1.0)
        assert len(out[1]["histogram"]) == 8
        assert out[3]["histogram"] is None and out[3]["decode_error"]


class TestStatsAndFrames:
    def test_media_stats_jvm_only(self, spark, media):
        rows = {(r["kind"], r["format"]): r for r in media_stats(media).collect()}
        assert rows[("image", "fakeimg")]["n"] == 3
        assert rows[("video", "fakevid")]["total_bytes"] == 0

    def test_frame_sample_plan(self, spark, media):
        rows = [(r["media_id"], r["frame_index"]) for r in
                frame_sample_plan(media, every_n=10).collect()]
        # 25 frames, every 10th -> 0,10,20; 3 frames -> 0
        assert sorted(rows) == [(5, 0), (5, 10), (5, 20), (6, 0)]


class TestAudio:
    def test_fake_audio_decodes(self, spark):
        from swiftbulkuploader_spark.multimodal.media import decode_audio_meta

        rows = [
            (10, "audio", "fakeaud", b"FAKEAUD:16000:" + bytes([128] * 32000), {}),  # 2s silence
            (11, "audio", "fakeaud", b"FAKEAUD:8000:" + bytes([128 + 10] * 8000), {}),  # 1s, rms 10
            (12, "audio", "mp3", b"\xff\xfbreal-mp3-bytes", {}),
            (13, "audio", "fakeaud", b"FAKEAUD:0:", {}),  # bad rate
        ]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        out = {r["media_id"]: r for r in decode_audio_meta(media).collect()}
        assert out[10]["duration_s"] == pytest.approx(2.0)
        assert out[10]["rms"] == pytest.approx(0.0)
        assert out[11]["duration_s"] == pytest.approx(1.0)
        assert out[11]["rms"] == pytest.approx(10.0)
        assert "NotImplementedError" in out[12]["decode_error"]
        assert "ValueError" in out[13]["decode_error"]


class TestMediaContractQuery:
    def test_x9_media_pipeline_end_to_end(self, spark):
        """The contract query drives REAL-PGM decode -> resize ->
        features over the synthesized corpus: stable count, valid dims,
        per-bin masses forming a unit histogram with EVERY bin live
        (the pixel formula sweeps all residues mod 256, so a binning
        bug that deadens a bin fails here, not just the oracle)."""
        from swiftbulkuploader_spark.operators.media_queries import x9_media_pipeline

        rows = x9_media_pipeline(spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == 200
        for r in rows:
            assert 4 <= r["width"] <= 8 and 3 <= r["height"] <= 6
            assert max(r["r_width"], r["r_height"]) <= 4  # resized bound
            assert 0.0 <= r["mean_pixel"] <= 255.0
            assert r["n_bins"] == 4
            masses = [r["h0"], r["h1"], r["h2"], r["h3"]]
            assert abs(sum(masses) - 1.0) < 1e-5
            # a 12-pixel image spans a 144-value arc — at least 2 bins
            assert sum(1 for m in masses if m > 0.0) >= 2
        # corpus-wide, every bin carries mass somewhere (liveness: a
        # binning bug that deadens one bin everywhere fails here)
        for k in ("h0", "h1", "h2", "h3"):
            assert any(r[k] > 0.0 for r in rows), k

    def test_pgm_codec_is_format_grade(self):
        """The stdlib P5 parser handles the real format, not just the
        fixture's happy path: comments anywhere in the header, multi-
        digit dims, truncation errors, 2-byte-sample and wrong-magic
        gates."""
        import pytest

        from swiftbulkuploader_spark.multimodal.media import (
            _decode_pgm,
            _encode_pgm,
        )

        px = bytes(range(12))
        # round-trip through the encoder
        assert _decode_pgm(_encode_pgm(4, 3, px)) == (4, 3, px)
        # comments between any header tokens + extra whitespace
        blob = b"P5\n# c1\n  4 # c2\n 3\n# c3\n255\n" + px
        assert _decode_pgm(blob) == (4, 3, px)
        # multi-digit dims
        wide = _encode_pgm(12, 1, px)
        assert _decode_pgm(wide) == (12, 1, px)
        with pytest.raises(ValueError):
            _decode_pgm(b"P5\n4 3\n255\n" + px[:-1])  # truncated
        with pytest.raises(NotImplementedError):
            _decode_pgm(b"P5\n4 3\n65535\n" + px)  # 2-byte samples
        with pytest.raises(NotImplementedError):
            _decode_pgm(b"P6\n4 3\n255\n" + px)  # P6 is the COLOR decoder

    def test_ppm_codec_is_format_grade(self):
        """The P6 color decoder (round 12): same header grammar as P5,
        3-byte interleaved samples, the same truncation/magic gates."""
        import pytest

        from swiftbulkuploader_spark.multimodal.media import _decode_ppm

        rgb = bytes(range(36))  # 4x3 RGB
        assert _decode_ppm(b"P6\n4 3\n255\n" + rgb) == (4, 3, rgb)
        # comments + extra whitespace anywhere in the header
        blob = b"P6\n# c1\n  4 # c2\n 3\n# c3\n255\n" + rgb
        assert _decode_ppm(blob) == (4, 3, rgb)
        with pytest.raises(ValueError):
            _decode_ppm(b"P6\n4 3\n255\n" + rgb[:-1])  # truncated
        with pytest.raises(NotImplementedError):
            _decode_ppm(b"P6\n4 3\n65535\n" + rgb)  # 2-byte samples
        with pytest.raises(NotImplementedError):
            _decode_ppm(b"P5\n4 3\n255\n" + rgb)  # grayscale magic

    def test_rgb_stats_exact_sums(self, spark):
        """decode_rgb_stats returns EXACT integer channel sums and the
        4-bin red histogram for a hand-computable blob; decode failures
        become rows, not task failures."""
        from swiftbulkuploader_spark.multimodal.media import (
            MEDIA_SCHEMA,
            decode_rgb_stats,
        )

        rgb = bytes([10, 20, 30, 200, 21, 31, 64, 22, 32, 129, 23, 33,
                     11, 24, 34, 255, 25, 35])  # 3x2
        good = (1, "image", "ppm", b"P6\n3 2\n255\n" + rgb, {})
        bad = (2, "image", "ppm", b"P6\n3 2\n255\n" + rgb[:-1], {})
        df = spark.createDataFrame([good, bad], MEDIA_SCHEMA)
        rows = {r["media_id"]: r for r in decode_rgb_stats(df).collect()}
        g = rows[1]
        assert (g["sum_r"], g["sum_g"], g["sum_b"]) == (
            10 + 200 + 64 + 129 + 11 + 255, 20 + 21 + 22 + 23 + 24 + 25,
            30 + 31 + 32 + 33 + 34 + 35)
        # red bins: 10,11 -> b0; 64 -> b1; 129 -> b2; 200,255 -> b3
        assert (g["r0"], g["r1"], g["r2"], g["r3"]) == (2, 1, 1, 2)
        assert g["decode_error"] is None
        assert rows[2]["decode_error"] and rows[2]["sum_r"] is None


class TestFrameSamplePlan:
    def test_uniform_stride_and_bounds(self, spark):
        """Per video: exactly 8 samples, frame_idx strictly increasing,
        first at 0, all inside [0, total_frames), ts = idx/24 exactly."""
        from swiftbulkuploader_spark.operators.media_queries import (
            FRAME_FPS,
            FRAME_SAMPLES,
            x9_frame_sample_plan,
        )

        rows = x9_frame_sample_plan(spark, "/root/testdata/sf0.001").collect()
        per = {}
        for r in rows:
            per.setdefault(r["media_id"], []).append(r)
        for mid, rs in per.items():
            rs.sort(key=lambda r: r["sample_no"])
            assert len(rs) == FRAME_SAMPLES
            total = rs[0]["duration_s"] * FRAME_FPS
            idxs = [r["frame_idx"] for r in rs]
            assert idxs[0] == 0
            assert all(a < b for a, b in zip(idxs, idxs[1:]))
            assert all(0 <= i < total for i in idxs)
            assert all(r["ts_s"] == r["frame_idx"] / FRAME_FPS for r in rs)


class TestAudioFramePlan:
    def test_stride_and_boundary_invariants(self, spark):
        """Per clip: frame count matches the closed-form
        (total - win) div hop + 1; consecutive byte_starts advance by
        exactly hop*bytes_per_sample; the FIRST frame starts at the WAV
        header boundary; the LAST frame ends inside the payload
        (start + win <= total_samples — incomplete tails dropped); ts_ms
        is the exact rate-aware division."""
        from swiftbulkuploader_spark.operators.media_queries import (
            AUDIO_BYTES_PER_SAMPLE,
            AUDIO_HOP_SAMPLES,
            AUDIO_WAV_HEADER_BYTES,
            AUDIO_WIN_SAMPLES,
            x9_audio_frame_plan,
        )

        rows = x9_audio_frame_plan(spark, "/root/testdata/sf0.001").collect()
        assert rows
        per = {}
        for r in rows:
            per.setdefault(r["media_id"], []).append(r)
        for mid, rs in per.items():
            rs.sort(key=lambda r: r["frame_no"])
            total = rs[0]["total_samples"]
            expect_n = (total - AUDIO_WIN_SAMPLES) // AUDIO_HOP_SAMPLES + 1
            assert len(rs) == expect_n
            assert rs[0]["frame_no"] == 0
            assert rs[0]["byte_start"] == AUDIO_WAV_HEADER_BYTES
            starts = [r["byte_start"] for r in rs]
            stride = AUDIO_HOP_SAMPLES * AUDIO_BYTES_PER_SAMPLE
            assert all(b - a == stride for a, b in zip(starts, starts[1:]))
            last = rs[-1]
            assert last["start_sample"] + AUDIO_WIN_SAMPLES <= total
            # one more frame would overrun the payload
            assert (last["start_sample"] + AUDIO_HOP_SAMPLES
                    + AUDIO_WIN_SAMPLES > total)
            for r in rs:
                assert r["ts_ms"] == (r["start_sample"] * 1000.0
                                      / r["sample_rate"])
                assert r["byte_len"] == (AUDIO_WIN_SAMPLES
                                         * AUDIO_BYTES_PER_SAMPLE)

    def test_rate_awareness(self, spark):
        """8 kHz clips of the same duration produce ~half the frames of
        16 kHz clips and 2x the ts_ms stride — the plan is genuinely
        sample-rate-aware, not wall-clock-gridded."""
        from swiftbulkuploader_spark.operators.media_queries import (
            x9_audio_frame_plan,
        )

        rows = x9_audio_frame_plan(spark, "/root/testdata/sf0.001").collect()
        by_rate = {8000: [], 16000: []}
        for r in rows:
            if r["frame_no"] == 1:
                by_rate[r["sample_rate"]].append(r["ts_ms"])
        assert by_rate[8000] and by_rate[16000]
        assert all(t == 20.0 for t in by_rate[8000])   # 160/8000 s
        assert all(t == 10.0 for t in by_rate[16000])  # 160/16000 s


class TestWavDecode:
    """Real stdlib-wave decode (r9 verdict ask #7): the SQL-built blob is
    a byte-exact valid WAV (pinned against the wave WRITER), and the
    decoded stats match an independent struct-level replica on a
    fixture-written file."""

    @staticmethod
    def _ref_wav(media_id: int, rate: int, n: int) -> bytes:
        import io
        import struct
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            vals = []
            for i in range(n):
                x = (media_id * 7 + i * 13) % 65536
                vals.append(x - 65536 if x >= 32768 else x)
            w.writeframes(struct.pack(f"<{n}h", *vals))
        return buf.getvalue()

    def test_sql_blob_byte_equals_wave_writer(self, spark, tmp_path):
        from swiftbulkuploader_spark.operators.media_queries import synth_wav

        rows = [
            (0, "t", "en", "s", 1),
            (3, "t", "en", "s", 1),
            (158, "t", "en", "s", 1),
        ]
        docs = spark.createDataFrame(
            rows,
            "doc_id: long, text: string, lang: string, source: string, "
            "n_chars: long",
        )
        got = {r["media_id"]: r for r in synth_wav(docs).collect()}
        for mid in (0, 3, 158):
            r = got[mid]
            want = self._ref_wav(mid, r["sample_rate"], r["n_samples"])
            assert bytes(r["data"]) == want, f"media {mid} blob differs"

    def test_decode_matches_struct_replica_on_fixture_file(self, spark,
                                                           tmp_path):
        """A WAV written to DISK by the fixture (stereo, to exercise the
        interleaved-channel path) round-trips through decode_wav_stats
        with stats equal to an independent struct-level computation."""
        import math
        import struct
        import wave

        from swiftbulkuploader_spark.multimodal.media import decode_wav_stats

        path = tmp_path / "fixture.wav"
        vals = [(-(i * 31) % 65536) - 32768 for i in range(400)]
        with wave.open(str(path), "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(44100)
            w.writeframes(struct.pack(f"<{len(vals)}h", *vals))
        media = spark.createDataFrame(
            [(1, path.read_bytes())], "media_id: long, data: binary"
        )
        r = decode_wav_stats(media).collect()[0]
        assert (r["n_channels"], r["sample_width"], r["frame_rate"]) == \
            (2, 2, 44100)
        assert r["n_samples"] == 400
        assert r["sample_min"] == min(vals) and r["sample_max"] == max(vals)
        assert r["sample_mean"] == sum(vals) / 400
        assert r["sample_rms"] == math.sqrt(
            sum(v * v for v in vals) / 400
        )

    def test_non_pcm16_raises(self, spark):
        import io
        import wave

        from swiftbulkuploader_spark.multimodal.media import decode_wav_stats

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)  # PCM8: decode contract is PCM16-only
            w.setframerate(8000)
            w.writeframes(bytes(range(64)))
        media = spark.createDataFrame(
            [(1, buf.getvalue())], "media_id: long, data: binary"
        )
        import pytest as _pytest
        with _pytest.raises(Exception, match="PCM16"):
            decode_wav_stats(media).collect()


class TestWavSpectral:
    def test_pure_tone_concentrates_in_own_bin(self, spark, tmp_path):
        """Clips carrying a pure tone at bin SPEC_BINS[id % 4] must put
        essentially all spectral energy in that bin: dominant_bin equals
        the tone bin and the peak power dwarfs every other bin (the
        quantized-table leakage is ~1e-8 of the peak)."""
        from swiftbulkuploader_spark.multimodal.media import SPEC_BINS
        from swiftbulkuploader_spark.operators.media_queries import (
            x9_wav_spectral,
        )

        rows = [(i, "t", "en", "s", 1) for i in range(8)]
        spark.createDataFrame(
            rows,
            "doc_id: long, text: string, lang: string, source: string, "
            "n_chars: long",
        ).write.parquet(str(tmp_path / "documents.parquet"))
        got = x9_wav_spectral(spark, str(tmp_path)).collect()
        assert len(got) == 8
        for r in got:
            k = SPEC_BINS[r["media_id"] % 4]
            assert r["dominant_bin"] == k
            peak = r[f"power_{k}"]
            others = [r[f"power_{j}"] for j in SPEC_BINS if j != k]
            assert peak > 1e6
            assert all(o < peak * 1e-6 for o in others)

    def test_fixture_liveness_all_bins(self, spark):
        """Real-substrate liveness: all four dominant bins occur, and
        each equals its clip's tone bin (the self-checking invariant)."""
        from swiftbulkuploader_spark.multimodal.media import SPEC_BINS
        from swiftbulkuploader_spark.operators.media_queries import (
            x9_wav_spectral,
        )

        rows = x9_wav_spectral(spark, "/root/testdata/sf0.01").collect()
        assert len(rows) == 200
        seen = {r["dominant_bin"] for r in rows}
        assert seen == set(SPEC_BINS)
        assert all(
            r["dominant_bin"] == SPEC_BINS[r["media_id"] % 4] for r in rows
        )


class TestMultimodalManifestComposition:
    def test_every_stage_drops_and_manifest_live(self, spark):
        """x10_multimodal_manifest liveness (r12 verdict ask #4, the
        x10_crawl_manifest discipline): the composition is only
        meaningful if each gate actually drops rows at the contract SF —
        the image contrast floor, the silence cap, AND the pHash dedup
        each shrink the example set, and the packed manifest carries
        multiple chunks whose totals conserve the survivor count."""
        from pyspark.sql import functions as F

        from swiftbulkuploader_spark.multimodal.media import (
            decode_image_stats,
            decode_wav_silence,
        )
        from swiftbulkuploader_spark.operators.media_queries import (
            MM_BYTE_BUDGET,
            MM_IMG_VAR_MIN,
            MM_SIL_MAX,
            phash_corpus_pairs,
            synth_pgm,
            synth_wav_gated,
            x10_multimodal_manifest,
        )
        from swiftbulkuploader_spark.catalog import load_table

        sf = "/root/testdata/sf0.01"
        docs = load_table(spark, sf, "documents")
        img = decode_image_stats(synth_pgm(docs)).select(
            "media_id", "var_pixel")
        aud = decode_wav_silence(synth_wav_gated(docs)).select(
            "media_id",
            (F.col("n_silent").cast("double")
             / F.col("n_samples").cast("double")).alias("r"))
        n_domain = img.join(aud, "media_id").count()
        g1 = img.filter(F.col("var_pixel") >= MM_IMG_VAR_MIN)
        n_img = g1.join(aud, "media_id").count()
        g2 = g1.join(aud.filter(F.col("r") <= MM_SIL_MAX), "media_id")
        n_aud = g2.count()
        dropped = phash_corpus_pairs(spark, sf).select(
            F.col("b").alias("media_id")).distinct()
        n_final = g2.join(dropped, "media_id", "left_anti").count()
        # every gate drops: 200 -> 189 -> 131 -> 129 at sf0.01
        assert n_domain > n_img > n_aud > n_final > 0
        # the dedup drop is live INSIDE the gated domain, not only
        # corpus-wide
        assert g2.join(dropped, "media_id").count() > 0

        rows = x10_multimodal_manifest(spark, sf).collect()
        assert len(rows) > 1                        # multiple chunks live
        assert sum(r["n_examples"] for r in rows) == n_final
        assert len({r["shard_id"] for r in rows}) > 1
        for r in rows:
            assert r["n_examples"] > 0
            assert r["chunk_bytes"] > 0
            # a chunk overruns the budget by at most one example's bytes
            # (the exclusive-cumsum placement rule)
        # per (shard, chunk) ids are dense from 0 within each shard
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r["shard_id"], []).append(r["chunk_id"])
        for cids in by_shard.values():
            assert sorted(cids) == list(range(len(cids)))
