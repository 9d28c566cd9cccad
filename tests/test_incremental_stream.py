"""Stream == batch for the incremental-crawl dedup screen: the same new
docs screened (a) in one batch call and (b) as two file-source
micro-batches through foreachBatch must produce identical verdict rows,
and a replayed batch must not duplicate the manifest (dynamic partition
overwrite). Files are written SEQUENTIALLY (CLAUDE.md rule 9: the file
source orders by modification time)."""

from __future__ import annotations

from pyspark.sql import functions as F

DOC_SCHEMA = ("doc_id: long, text: string, lang: string, source: string, "
              "n_chars: long")

FROZEN = [
    (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "srcA", 1),
    (2, "one two three four five six seven eight nine ten", "en", "srcA", 1),
    (3, "red orange yellow green blue indigo violet amber coral teal",
     "en", "srcB", 1),
]

# batch 1: an exact dup of frozen 2 + a keeper; batch 2: a near dup of
# frozen 3 + a probe-contaminated doc
NEW_B1 = [
    (100, "one two three four five six seven eight nine ten", "en",
     "srcC", 1),
    (101, "totally fresh material nothing shared anywhere at all here",
     "en", "srcC", 1),
]
NEW_B2 = [
    (102, "red orange yellow green blue indigo violet amber coral jade",
     "en", "srcC", 1),
    (103, "alpha beta gamma delta epsilon zeta eta theta plus extra "
          "words padding the tail out considerably more and more",
     "en", "srcC", 1),
]


def _rows(df):
    return {
        r["doc_id"]: (r["verdict"], r["exact_dup_of"], r["near_dup_of"],
                      r["n_flagged_probes"])
        for r in df.collect()
    }


class TestIncrementalStreamTwin:
    def test_stream_equals_batch_and_replay_idempotent(self, spark,
                                                       tmp_path,
                                                       monkeypatch):
        from swiftbulkuploader_spark.operators import dedup
        from swiftbulkuploader_spark.operators.dedup import (
            build_frozen_substrates,
            incremental_screen,
        )
        from swiftbulkuploader_spark.streaming.incremental_stream import (
            _screen_batch,
            read_verdicts,
            stream_incremental_screen,
        )

        # derivation-count audit (r9 verdict ask #1): the frozen/probe
        # substrate builders must run ONCE at stream wiring, never per
        # micro-batch — count every call to the substrate derivations
        calls = {"base": 0, "bands": 0, "shingle": 0}
        real_base, real_bands = dedup._mh_exact_base, dedup._mh_exact_bands
        real_shingle = dedup.shingle_base

        def count(key, real):
            def wrapped(*a, **kw):
                calls[key] += 1
                return real(*a, **kw)
            return wrapped

        monkeypatch.setattr(dedup, "_mh_exact_base",
                            count("base", real_base))
        monkeypatch.setattr(dedup, "_mh_exact_bands",
                            count("bands", real_bands))
        monkeypatch.setattr(dedup, "shingle_base",
                            count("shingle", real_shingle))

        frozen = spark.createDataFrame(FROZEN, DOC_SCHEMA)
        # only frozen doc 1 is the "eval suite": docs 100/102 must hit
        # the exact/near branches, not the compliance-first one
        probes = frozen.filter(F.col("doc_id") == 1)

        src = str(tmp_path / "new_docs")
        # sequential writes: a late file read first would not hurt this
        # stateless screen, but the house streaming rule stands
        spark.createDataFrame(NEW_B1, DOC_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
        spark.createDataFrame(NEW_B2, DOC_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(DOC_SCHEMA.replace(":", ""))
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = str(tmp_path / "verdicts")
        q = stream_incremental_screen(
            stream, frozen, probes, out, str(tmp_path / "cp")
        )
        finished = q.awaitTermination(120)
        if not finished:  # hung stream: fail HERE, not on a partial manifest
            q.stop()
            raise AssertionError("availableNow stream hung past 120 s")

        streamed = read_verdicts(spark, out)
        assert streamed.select("batch_id").distinct().count() == 2

        # substrate build-once pin: 1 frozen-side call at wiring + 1
        # new-side call per micro-batch (2 batches). The pre-fix code
        # re-derived the frozen index per batch (base=4, shingle=4).
        assert calls == {"base": 3, "bands": 3, "shingle": 3}, calls

        batch = incremental_screen(
            spark.createDataFrame(NEW_B1 + NEW_B2, DOC_SCHEMA),
            frozen, probes,
        )
        assert _rows(streamed) == _rows(batch)

        got = _rows(streamed)
        assert got[100][0] == "drop_exact" and got[100][1] == 2
        assert got[101][0] == "keep"
        assert got[102][0] == "drop_near_dup" and got[102][2] == 3
        assert got[103][0] == "drop_contaminated" and got[103][3] >= 1

        # replay idempotence: re-running batch 0's foreachBatch body
        # overwrites its own partition; the manifest is unchanged
        before = sorted(_rows(streamed).items())
        subs = build_frozen_substrates(frozen, probes)
        _screen_batch(subs, out)(
            spark.createDataFrame(NEW_B1, DOC_SCHEMA), 0
        )
        after = sorted(_rows(read_verdicts(spark, out)).items())
        assert after == before
