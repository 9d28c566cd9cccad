"""Scalar-function suites: BPE-ish tokenization, date arithmetic, try_* safe
evaluation.

Rounds out the engine's scalar surface beyond the reference's F1-F10
(SURVEY.md §2.6 — string/path/timestamp only): sub-word token estimation for
training-data budgeting, the date math every reporting query leans on, and
ANSI-safe error handling (`try_*`), all as codegen'd Column expressions with
DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swiftbulkuploader_spark.catalog import load_table
from swiftbulkuploader_spark.functions.text import bpe_ish_token_count, token_count


def x3_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word-ish vs whitespace token counts per document, and the
    chars-per-token ratio (the compression-rate proxy used for token-budget
    estimation over a training corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    bpe = bpe_ish_token_count(F.col("text")).cast("long")
    return docs.select(
        "doc_id",
        bpe.alias("n_bpe_tokens"),
        token_count(F.col("text")).cast("long").alias("n_ws_tokens"),
        F.round(F.length("text") / F.nullif(bpe, F.lit(0)), 6).alias("chars_per_token"),
    )


def x5_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-math suite over order dates: offsets, day diffs to an anchor,
    month-end, quarter, day-of-week."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_add(F.col("o_orderdate"), 30).alias("due_date"),
        F.add_months(F.col("o_orderdate"), 2).alias("plus_2mo"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
         .cast("long").alias("days_since_95"),
        F.last_day(F.col("o_orderdate")).alias("month_end"),
        F.quarter(F.col("o_orderdate")).cast("long").alias("qtr"),
        F.dayofweek(F.col("o_orderdate")).cast("long").alias("dow"),
    )


def x_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe evaluation: try_divide / try_cast / try_element_at return
    NULL instead of raising — the semantics that let one malformed row not
    kill a 100 TB job. (The reference's analogue is its quote-fallback
    retry, olrcdb.py:59-67 — per-row exception handling; here failure is a
    value, not control flow.)"""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.try_divide(F.col("n_chars"), F.col("doc_id") % 5).alias("chars_per_bucket"),
        F.col("lang").try_cast("int").alias("lang_as_int"),
        F.col("n_chars").cast("string").try_cast("int").alias("chars_roundtrip"),
        F.try_element_at(toks, F.lit(100000)).alias("token_100k"),
        F.try_element_at(toks, F.lit(1)).alias("token_1"),
    )


def x3_collation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware string semantics (Spark 4 collated strings): case-
    insensitive equality and containment via UTF8_LCASE collation vs binary
    comparison — collation pushes case logic into the comparison operator
    itself (sort keys, joins, group keys), instead of wrapping every
    expression in lower()."""
    cust = load_table(spark, sf_dir, "customer")
    ci = lambda c: F.collate(c, "UTF8_LCASE")  # noqa: E731
    return cust.select(
        "c_custkey",
        (ci(F.upper("c_name")) == ci(F.col("c_name"))).alias("ci_eq"),
        (F.upper("c_name") == F.col("c_name")).alias("bin_eq"),
        F.contains(ci(F.col("c_name")), F.lit("CUSTOMER")).alias("ci_contains"),
    )


def x3_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-function family beyond extract/replace: regexp_like (predicate),
    regexp_count (occurrences), regexp_substr (first match),
    regexp_instr (1-based position) — over document text."""
    docs = load_table(spark, sf_dir, "documents")
    vowel_word = r"\b[aeiou][a-z]+"
    return docs.select(
        "doc_id",
        F.regexp_like("text", F.lit(r"data")).alias("has_data"),
        F.regexp_count("text", F.lit(vowel_word)).cast("long").alias("n_vowel_words"),
        F.regexp_substr("text", F.lit(vowel_word)).alias("first_vowel_word"),
        F.regexp_instr("text", F.lit(r"spark")).cast("long").alias("spark_pos"),
    )


def x6_bit_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates per user: AND/OR/XOR over event ids plus total
    set-bit count — the flag-mask rollup shape (permission masks, feature
    flags) that runs entirely in the partial-aggregate combiner."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(
            F.bit_and("event_id").alias("mask_and"),
            F.bit_or("event_id").alias("mask_or"),
            F.bit_xor("event_id").alias("mask_xor"),
            F.sum(F.bit_count("event_id")).alias("total_bits"),
        )
    )


def x5_filtered_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER-clause aggregation: several differently-conditioned
    aggregates in ONE pass over orders (vs one scan per condition, or the
    CASE-WHEN encoding of the same thing — FILTER states intent and lets
    the combiner skip non-matching rows)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_orders_fa")
    return spark.sql("""
        SELECT o_orderpriority,
               count(*) AS n,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
               round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS open_value,
               round(avg(o_totalprice) FILTER (WHERE o_totalprice > 200000), 6) AS avg_big
        FROM _orders_fa
        GROUP BY o_orderpriority
    """)


QUERIES = {
    "x5_filtered_aggs": x5_filtered_aggs,
    "x3_regex_suite": x3_regex_suite,
    "x6_bit_aggregates": x6_bit_aggregates,
    "x3_collation_suite": x3_collation_suite,
    "x3_bpe_token_stats": x3_bpe_token_stats,
    "x5_date_arithmetic": x5_date_arithmetic,
    "x_try_functions": x_try_functions,
}

_BPE = r"len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]'))"
from swiftbulkuploader_spark.operators.oracle_fragments import (  # noqa: E402
    TOKENS_DUCK_BARE as _WS,
)

ORACLES = {
    "x5_filtered_aggs": """
        SELECT o_orderpriority,
               count(*) AS n,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
               round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS open_value,
               round(avg(o_totalprice) FILTER (WHERE o_totalprice > 200000), 6) AS avg_big
        FROM orders GROUP BY o_orderpriority
    """,
    "x3_regex_suite": r"""
        SELECT doc_id,
               regexp_matches(text, 'data') AS has_data,
               CAST(len(regexp_extract_all(text, '\b[aeiou][a-z]+')) AS BIGINT) AS n_vowel_words,
               CASE WHEN regexp_matches(text, '\b[aeiou][a-z]+')
                    THEN regexp_extract(text, '\b[aeiou][a-z]+')
                    ELSE NULL END AS first_vowel_word,
               CAST(CASE WHEN strpos(text, 'spark') > 0
                         THEN strpos(text, 'spark') ELSE 0 END AS BIGINT) AS spark_pos
        FROM documents
    """,
    "x6_bit_aggregates": """
        SELECT user_id,
               bit_and(event_id) AS mask_and,
               bit_or(event_id) AS mask_or,
               bit_xor(event_id) AS mask_xor,
               CAST(sum(bit_count(event_id)) AS BIGINT) AS total_bits
        FROM events GROUP BY user_id
    """,
    "x3_collation_suite": """
        SELECT c_custkey,
               (upper(c_name) COLLATE NOCASE = c_name COLLATE NOCASE) AS ci_eq,
               (upper(c_name) = c_name) AS bin_eq,
               (c_name ILIKE '%CUSTOMER%') AS ci_contains
        FROM customer
    """,
    "x3_bpe_token_stats": f"""
        SELECT doc_id,
               CAST({_BPE} AS BIGINT) AS n_bpe_tokens,
               CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0
                    THEN 0 ELSE CAST({_WS} AS BIGINT) END AS n_ws_tokens,
               round(length(text) / nullif({_BPE}, 0), 6) AS chars_per_token
        FROM documents
    """,
    "x5_date_arithmetic": """
        SELECT o_orderkey,
               CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
               CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus_2mo,
               date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since_95,
               last_day(o_orderdate) AS month_end,
               CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
               CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow
        FROM orders
    """,
    "x_try_functions": """
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN NULL
                    ELSE CAST(n_chars AS DOUBLE) / (doc_id % 5) END AS chars_per_bucket,
               TRY_CAST(lang AS INTEGER) AS lang_as_int,
               TRY_CAST(CAST(n_chars AS VARCHAR) AS INTEGER) AS chars_roundtrip,
               string_split(text, ' ')[100000] AS token_100k,
               string_split(text, ' ')[1] AS token_1
        FROM documents
    """,
}
