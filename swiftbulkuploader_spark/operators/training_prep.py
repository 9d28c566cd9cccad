"""Training-data preparation operators: sequence packing and embedding
quantization (north-star extensions, SURVEY.md §2.9).

Both are the set-oriented formulation of steps an LLM pretraining pipeline
runs over the whole corpus, designed so the expensive part is a single
window or map pass:

* **Sequence packing** (concat-and-chunk): documents are concatenated per
  shard (here: per language) in a deterministic order and cut into
  fixed-token-budget chunks; a document belongs to the chunk its first token
  lands in. One window cumulative sum + integer division — no iterative
  bin-packing loop, which is what makes it viable at 10^10 documents (the
  window is a single shuffle on the shard key; within-shard order is the
  sort the shuffle already does).
* **Int8 scalar quantization**: per-vector symmetric quantization
  (scale = max|x|/127), the standard 4x memory/IO shrink applied before
  similarity search over billions of embeddings. One `zip_with` pass per
  row; the scale is bound OUTSIDE the lambda (as an `array_repeat` argument,
  evaluated once per row) — an interpreted-HOF lambda re-evaluates captured
  subexpressions per element, which would make this O(d^2) per row.

Quantized outputs are integers, so the DuckDB oracle is hash-exact: both
engines perform the identical IEEE double ops (cast FLOAT[] -> DOUBLE[]
first; DuckDB list math is float32 otherwise) and the identical
round-half-away-from-zero convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swiftbulkuploader_spark.catalog import load_table
from swiftbulkuploader_spark.functions.text import token_count
from swiftbulkuploader_spark.operators.oracle_fragments import TOKENS_DUCK

TOKEN_BUDGET = 2048


def x3_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing plan: per language (the shard key), documents
    ordered by doc_id are packed into 2048-token chunks; returns one row per
    chunk with its document span and token load. Chunks can exceed the
    budget by at most one document's tail — the concat-and-chunk semantic,
    where a straddling document is attributed to its starting chunk."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = docs.select(
        "lang", "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    cum_excl = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    placed = toks.withColumn(
        "chunk_id", F.floor(cum_excl / F.lit(TOKEN_BUDGET)).cast("long")
    )
    return placed.groupBy("lang", "chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("chunk_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def x2_quantized_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of each embedding: scale = max|x|/127,
    code_i = round(x_i/scale). Emits integer summaries of the code vector
    (sum, L1, min/max, dims) — exact cross-engine, and enough to prove the
    codes are the right ones (max code = ±127 by construction)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("v"))
    scale = F.array_max(F.transform("v", F.abs)) / F.lit(127.0)
    # array_repeat binds `scale` as a per-row argument (evaluated once);
    # the zip_with lambda then touches only lambda variables.
    codes = F.zip_with(
        "v",
        F.array_repeat(scale, F.size("v")),
        lambda x, s: F.round(x / F.nullif(s, F.lit(0.0))).cast("long"),
    )
    zero = F.lit(0).cast("long")
    qdf = base.select(
        "vec_id",
        F.transform(codes, lambda c: F.coalesce(c, zero)).alias("q"),
    )
    return qdf.select(
        "vec_id",
        F.size("q").alias("n_dims"),
        F.aggregate("q", zero, lambda acc, x: acc + x).alias("sum_q"),
        F.aggregate("q", zero, lambda acc, x: acc + F.abs(x)).alias("l1_q"),
        F.array_max("q").alias("max_q"),
        F.array_min("q").alias("min_q"),
    )


QUERIES = {
    "x3_pack_sequences": x3_pack_sequences,
    "x2_quantized_codes": x2_quantized_codes,
}

ORACLES = {
    "x3_pack_sequences": f"""
        WITH t AS (
            SELECT lang, doc_id,
                   CAST({TOKENS_DUCK} AS BIGINT) AS n_tokens
            FROM documents
        ), placed AS (
            SELECT lang, doc_id, n_tokens,
                   coalesce(sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   // {TOKEN_BUDGET} AS chunk_id
            FROM t
        )
        SELECT lang, chunk_id, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM placed
        GROUP BY lang, chunk_id
    """,
    "x2_quantized_codes": """
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), s AS (
            SELECT vec_id, v,
                   list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
            FROM v
        ), q AS (
            SELECT vec_id,
                   list_transform(
                       v, x -> coalesce(
                           CAST(round(x / nullif(scale, 0.0)) AS BIGINT), 0)
                   ) AS qv
            FROM s
        )
        SELECT vec_id, CAST(len(qv) AS INT) AS n_dims,
               CAST(list_sum(qv) AS BIGINT) AS sum_q,
               CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS l1_q,
               list_max(qv) AS max_q, list_min(qv) AS min_q
        FROM q
    """,
}
