"""Python UDTF surface (Spark 4): one input row -> K output rows as a
user-defined *table* function, consumed via LATERAL join.

The reference's de-facto UDTF is `split_file` (filesegmenter.py:4-42, one
file -> K chunk files; SURVEY.md §2.8). Its data shape (segment planning)
already ships as pure `explode(sequence(...))` — the performance path. This
module covers the *extension API* itself with a sentence splitter: genuinely
row-expanding text logic a user would plug in, Arrow-batched
(`useArrow=True`).

Perf stance, stated: a UDTF is Python in the row loop — use it for logic
Column expressions can't express; anything regex/sequence-expressible
belongs in explode/split (compare x3_* queries, zero Python). The oracle
proves the semantics; the plan shows the BatchEvalPythonUDTF boundary that
built-in forms avoid.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from swiftbulkuploader_spark.catalog import load_table

_SENT_RE = re.compile(r"[.!?]+\s+")


@udtf(returnType="sent_no: int, sentence: string, n_chars: int", useArrow=True)
class SplitSentences:
    """text -> (sent_no, sentence, n_chars) rows; empty/blank pieces are
    dropped; sent_no is 1-based in document order."""

    def eval(self, text: str):
        if text is None:
            return
        no = 0
        for piece in _SENT_RE.split(text):
            piece = piece.strip()
            if piece:
                no += 1
                yield no, piece, len(piece)


def x3_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document sentence expansion via LATERAL UDTF, then per-doc
    sentence stats (keeps the result small and order-insensitive)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("split_sentences", SplitSentences)
    return spark.sql("""
        SELECT d.doc_id,
               count(*) AS n_sentences,
               CAST(max(s.n_chars) AS BIGINT) AS longest,
               CAST(min(s.sent_no) AS BIGINT) AS first_no,
               CAST(max(s.sent_no) AS BIGINT) AS last_no
        FROM _udtf_docs d, LATERAL split_sentences(d.text) s
        GROUP BY d.doc_id
    """)


QUERIES = {
    "x3_udtf_sentences": x3_udtf_sentences,
}

ORACLES = {
    # same semantics in set form: regex-split, strip (space/tab/cr/lf, like
    # Python str.strip), drop blanks, ordinals
    "x3_udtf_sentences": r"""
        WITH exploded AS (
            SELECT doc_id,
                   string_split_regex(text, '[.!?]+\s+') AS ps,
                   unnest(generate_series(1, len(string_split_regex(text, '[.!?]+\s+')))) AS ord
            FROM documents
        ), pieces AS (
            SELECT doc_id,
                   trim(ps[ord], ' ' || chr(9) || chr(10) || chr(13)) AS sentence,
                   ord
            FROM exploded
            WHERE trim(ps[ord], ' ' || chr(9) || chr(10) || chr(13)) <> ''
        ), numbered AS (
            SELECT doc_id, sentence,
                   row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS sent_no,
                   length(sentence) AS n_chars
            FROM pieces
        )
        SELECT doc_id,
               count(*) AS n_sentences,
               CAST(max(n_chars) AS BIGINT) AS longest,
               CAST(min(sent_no) AS BIGINT) AS first_no,
               CAST(max(sent_no) AS BIGINT) AS last_no
        FROM numbered GROUP BY doc_id
    """,
}
