"""Remaining SURVEY.md §2 surface: the SQL gateway (S3), running counters as
queries (A4/A5/A6), UTF-8 byte semantics (F9), and set operations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swiftbulkuploader_spark.catalog import load_table


def s3_sql_gateway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 — arbitrary SQL text execution (`execute_query`, olrcdb.py:72-84).
    The engine's gateway is spark.sql over registered views — same text-in,
    DataFrame-out contract, minus the string-spliced parameters and the
    `sys.exit` on error."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("""
        SELECT o_orderpriority AS priority,
               count(*) AS n,
               round(avg(o_totalprice), 2) AS avg_price
        FROM orders_v
        GROUP BY o_orderpriority
    """)


def a4_a5_outcome_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5/A6 — the running success/failure counters (bulkupload.py:194-221,
    prepareupload.py:10-11) as one conditional aggregate over an event
    stream: error events are failures, the rest successes."""
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.sum((F.col("event_type") != "error").cast("long")).alias("n_ok"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("n_failed"),
        F.count("*").alias("n_total"),
    )


def f9_utf8_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 — UTF-8 encode semantics (`path.encode('utf-8')`, bulkupload.py:220):
    byte length vs character length per document; multi-byte scripts differ."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("n_chars_text"),
        F.octet_length("text").cast("long").alias("n_bytes_utf8"),
    )


def x5_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (none exist in the reference, SURVEY.md §2.5): customers
    with orders in BOTH priority classes (intersect) minus those with any
    low-priority order (except), unioned shape."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = orders.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    both = urgent.intersect(high)
    result = both.exceptAll(low.distinct()).select(F.col("o_custkey").alias("custkey"))
    return result


QUERIES = {
    "s3_sql_gateway": s3_sql_gateway,
    "a4_a5_outcome_counters": a4_a5_outcome_counters,
    "f9_utf8_bytes": f9_utf8_bytes,
    "x5_set_ops": x5_set_ops,
}

ORACLES = {
    "s3_sql_gateway": """
        SELECT o_orderpriority AS priority, count(*) AS n,
               round(avg(o_totalprice), 2) AS avg_price
        FROM orders GROUP BY o_orderpriority
    """,
    "a4_a5_outcome_counters": """
        SELECT CAST(sum(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
               count(*) AS n_total
        FROM events
    """,
    "f9_utf8_bytes": """
        SELECT doc_id, lang,
               length(text) AS n_chars_text,
               strlen(text) AS n_bytes_utf8
        FROM documents
    """,
    "x5_set_ops": """
        SELECT o_custkey AS custkey FROM (
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
        )
        EXCEPT ALL
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
}
