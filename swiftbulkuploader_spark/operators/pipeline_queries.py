"""Pipeline query operators (SURVEY.md §2.2-§2.6) over the driver tables.

The reference's query surface is a single-table manifest: scan/filter/sort
(S2), point lookups (Q5), resume anti-join (Q7), counting/progress aggregates
(A1-A9), the latest-attempt window (W1), and the path/format scalar functions
(F1-F8). Per FIXTURES.md, each operator is instantiated over the driver's
Group-B tables so DuckDB can oracle-check it:

* manifest            -> orders        (o_orderstatus plays ``uploaded``:
                                        'O' = pending, 'F'/'P' = done)
* attempts log        -> orders-per-customer (W1 latest-attempt)
* rate window         -> events.ts     (A8/W2 5-minute tumbling window)
* file paths          -> synthesized from documents columns (F1-F5)

Every computed column is aliased identically in the DataFrame plan and the
oracle SQL (driver hash-compare requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from swiftbulkuploader_spark.catalog import load_table
from swiftbulkuploader_spark.functions.paths import (
    object_key,
    path_basename,
    path_join,
    segment_name,
)

# ----------------------------------------------------------------------------
# Scans / projections / filters (S2, Q1-Q6)
# ----------------------------------------------------------------------------


def q1_scan_pending_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/Q1/Q3 + sort: full scan of pending work, newest-id first
    (`SELECT * FROM {t} WHERE uploaded=0 ORDER BY id DESC`, bulkupload.py:354-360).

    The DESC sort existed only to serve ascending ids to `.pop()`
    (bulkupload.py:356); under Spark it's declared but costs one stage and
    vanishes if no consumer needs order. Filter is pushed to parquet.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == "O").orderBy(F.col("o_orderkey").desc())


def q2_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection — Catalyst prunes the parquet scan to 3 columns."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_custkey", "o_totalprice")


def q5_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 — point lookup by key (`WHERE id = {k}`, bulkupload.py:255-258)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") == 7).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def q6_category_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 — the file-vs-directory style categorical predicate
    (`os.path.isfile`, prepareupload.py:35) as a filter on a discrete column."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type") != "error").select(
        "event_id", "event_type", "user_id"
    )


def q7_resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 — resume semantics as a left-anti join (readme.md:42): rows with no
    success record remain pending. Instantiated as customers with no orders.

    At scale: anti-join shuffles on the key; with a small `successes` side
    Spark broadcasts it automatically (AQE) — no manual hint needed here.
    """
    customer = load_table(spark, sf_dir, "customer")
    # "successes" = high-value orders, so the anti-join result is non-trivial
    # at every scale factor (every customer has *some* order).
    done = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        customer.join(done, customer.c_custkey == done.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


# ----------------------------------------------------------------------------
# Aggregations (A1-A9)
# ----------------------------------------------------------------------------


def a1_total_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — COUNT(*) denominator (bulkupload.py:231-239). Parquet row-group
    stats answer this without reading data (aggregate pushdown)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(F.count("*").alias("total"))


def a2_done_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — filtered count seeding cumulative progress (bulkupload.py:242-250)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == "F").agg(
        F.count("*").alias("done")
    )


def a3_min_pending_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — MIN(id) of pending work / empty-work guard (bulkupload.py:341-351).

    Divergence recorded: the reference's emptiness check is
    ``if not result_tuple[0]`` (bulkupload.py:349), which conflates a
    legitimate minimum id of 0 with NULL — a pending file with id=0 would
    abort the run with "Nothing to upload". Here the aggregate returns the
    true minimum (0 included); only a NULL result means no pending work."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == "O").agg(
        F.min("o_orderkey").alias("min_pending_id")
    )


def a7_progress_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — progress percentage `counter/total*100` (bulkupload.py:320-331),
    one conditional aggregate instead of two queries."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("done"),
        F.round(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            * 100.0
            / F.count("*"),
            8,
        ).alias("pct_done"),
    )


def a8_rate_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/W2 — throughput over a tumbling window (the reference's 5-second
    sampling loop, bulkupload.py:363-387) as `window(ts, 5 minutes)` counts.
    Map-side partial aggregation makes this one narrow shuffle at any scale.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
        )
    )


def a9_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/S10 — final report: totals per outcome (bulkupload.py:301-317) as a
    grouped count over the status column."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


# ----------------------------------------------------------------------------
# Windows (W1, W2)
# ----------------------------------------------------------------------------


def w1_latest_attempt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — `row_number() OVER (PARTITION BY key ORDER BY ts DESC)` = latest
    attempt per file (replaces the reference's mutable `uploaded` flag,
    SURVEY.md §2.5). Instantiated as each customer's most recent order.
    Tie-broken on o_orderkey so results are deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_date"),
            F.col("o_orderstatus").alias("latest_status"),
        )
    )


def w2_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — running cumulative spend per customer (ordered window aggregate;
    the engine-side generalization of the reference's running counters,
    bulkupload.py:194-197)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


# ----------------------------------------------------------------------------
# Scalar functions (F1-F8) applied over synthesized paths
# ----------------------------------------------------------------------------


def f1_f2_object_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2 — object-key derivation (cutoff truncation + leading-slash strip,
    bulkupload.py:48-56, documented-intent semantics per SURVEY.md §7.4)."""
    docs = load_table(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("/data/"), F.col("source"), F.lit("/"), F.col("lang"),
        F.lit("/doc-"), F.col("doc_id").cast("string"), F.lit(".txt"),
    )
    return docs.select(
        "doc_id",
        path.alias("path"),
        object_key(path, cutoff="data").alias("object_key"),
        object_key(path, cutoff="").alias("object_key_nocut"),
    )


def f3_f5_segment_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3-F5 — path join, basename, zero-padded segment naming
    (prepareupload.py:32, filesegmenter.py:14,31-36)."""
    docs = load_table(spark, sf_dir, "documents")
    joined = path_join(F.lit("/staging/out"), F.concat(F.lit("doc-"), F.col("doc_id").cast("string"), F.lit(".txt")))
    return docs.select(
        "doc_id",
        joined.alias("joined_path"),
        path_basename(joined).alias("basename"),
        segment_name(path_basename(joined), (F.col("doc_id") % 5000).cast("int")).alias("seg_name"),
    )


def f6_f8_report_formatting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6-F8 — timestamp formatting, '%.8f' percentage formatting, and rate
    arithmetic (bulkupload.py:70, 323-326, 381-384) as one derived report."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("n"),
        F.min("o_orderdate").alias("first_ts"),
        F.max("o_orderdate").alias("last_ts"),
    )
    total = orders.count()
    # NTZ -> instant -> epoch seconds; session TZ is pinned UTC (catalog.py)
    elapsed_s = F.col("last_ts").cast("timestamp").cast("long") - F.col(
        "first_ts"
    ).cast("timestamp").cast("long")
    return agg.select(
        "status",
        "n",
        F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss").alias("first_seen"),
        F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
        F.format_string("%.8f", F.col("n") * 100.0 / F.lit(float(total))).alias("pct_str"),
        F.round(F.col("n") / elapsed_s.cast("double"), 8).alias("rate_per_s"),
    )


# ----------------------------------------------------------------------------
# Segment planner (S11) as a query
# ----------------------------------------------------------------------------

SEGMENT_CHARS = 100  # stand-in for SEGMENT_SIZE (bulkupload.py:12) over n_chars


def s11_segment_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 — segment plan: one file row -> K size-bounded segment rows
    (`split_file`, filesegmenter.py:4-42; byte/char semantics per SURVEY §7.4
    item 3). `explode(sequence(...))` is the Spark-native UDTF shape — no
    Python, scales linearly with input."""
    docs = load_table(spark, sf_dir, "documents")
    n_segs = F.floor((F.greatest(F.col("n_chars"), F.lit(1)) - 1) / SEGMENT_CHARS) + 1
    plan = docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), (n_segs - 1).cast("int"))).alias("seg_no"),
    )
    offset = F.col("seg_no").cast("long") * SEGMENT_CHARS
    length = F.least(F.lit(SEGMENT_CHARS).cast("long"), F.col("n_chars") - offset)
    return plan.select(
        "doc_id",
        "seg_no",
        offset.alias("seg_offset"),
        length.alias("seg_length"),
        segment_name(F.concat(F.lit("doc-"), F.col("doc_id").cast("string")), F.col("seg_no")).alias("seg_name"),
    )


# ----------------------------------------------------------------------------
# Registry
# ----------------------------------------------------------------------------

QUERIES = {
    "q1_scan_pending_sorted": q1_scan_pending_sorted,
    "q2_projection": q2_projection,
    "q5_point_lookup": q5_point_lookup,
    "q6_category_predicate": q6_category_predicate,
    "q7_resume_anti_join": q7_resume_anti_join,
    "a1_total_count": a1_total_count,
    "a2_done_count": a2_done_count,
    "a3_min_pending_id": a3_min_pending_id,
    "a7_progress_pct": a7_progress_pct,
    "a8_rate_window": a8_rate_window,
    "a9_report": a9_report,
    "w1_latest_attempt": w1_latest_attempt,
    "w2_running_total": w2_running_total,
    "f1_f2_object_keys": f1_f2_object_keys,
    "f3_f5_segment_names": f3_f5_segment_names,
    "f6_f8_report_formatting": f6_f8_report_formatting,
    "s11_segment_plan": s11_segment_plan,
}

ORACLES = {
    "q1_scan_pending_sorted": """
        SELECT * FROM orders WHERE o_orderstatus = 'O' ORDER BY o_orderkey DESC
    """,
    "q2_projection": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    """,
    "q5_point_lookup": """
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey = 7
    """,
    "q6_category_predicate": """
        SELECT event_id, event_type, user_id FROM events WHERE event_type <> 'error'
    """,
    "q7_resume_anti_join": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    "a1_total_count": "SELECT count(*) AS total FROM orders",
    "a2_done_count": "SELECT count(*) AS done FROM orders WHERE o_orderstatus = 'F'",
    "a3_min_pending_id": """
        SELECT min(o_orderkey) AS min_pending_id FROM orders WHERE o_orderstatus = 'O'
    """,
    "a7_progress_pct": """
        SELECT count(*) AS total,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS done,
               round(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) * 100.0
                     / count(*), 8) AS pct_done
        FROM orders
    """,
    "a8_rate_window": """
        SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S')
                   AS window_start,
               count(*) AS n_events
        FROM events GROUP BY 1
    """,
    "a9_report": """
        SELECT o_orderstatus AS status, count(*) AS n,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders GROUP BY 1
    """,
    "w1_latest_attempt": """
        SELECT o_custkey, o_orderkey AS latest_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS latest_date,
               o_orderstatus AS latest_status
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders
        ) WHERE rn = 1
    """,
    "w2_running_total": """
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_spend
        FROM orders
    """,
    "f1_f2_object_keys": """
        SELECT doc_id,
               '/data/' || source || '/' || lang || '/doc-' || doc_id || '.txt' AS path,
               regexp_replace('/data/' || source || '/' || lang || '/doc-' || doc_id || '.txt',
                              '^.*?data/', '') AS object_key,
               regexp_replace('/data/' || source || '/' || lang || '/doc-' || doc_id || '.txt',
                              '^/', '') AS object_key_nocut
        FROM documents
    """,
    "f3_f5_segment_names": """
        SELECT doc_id,
               '/staging/out/doc-' || doc_id || '.txt' AS joined_path,
               'doc-' || doc_id || '.txt' AS basename,
               printf('%s-%04d.txt', 'doc-' || doc_id || '.txt',
                      CAST(doc_id % 5000 AS INT)) AS seg_name
        FROM documents
    """,
    "f6_f8_report_formatting": """
        WITH agg AS (
            SELECT o_orderstatus AS status, count(*) AS n,
                   min(o_orderdate) AS first_ts, max(o_orderdate) AS last_ts
            FROM orders GROUP BY 1
        ), tot AS (SELECT count(*) AS total FROM orders)
        SELECT status, n,
               strftime(first_ts, '%Y-%m-%d %H:%M:%S') AS first_seen,
               strftime(last_ts, '%Y-%m-%d %H:%M:%S') AS last_seen,
               printf('%.8f', n * 100.0 / (SELECT total FROM tot)) AS pct_str,
               round(n / (epoch(last_ts) - epoch(first_ts))::DOUBLE, 8) AS rate_per_s
        FROM agg
    """,
    "s11_segment_plan": """
        SELECT doc_id, CAST(seg_no AS INT) AS seg_no,
               CAST(seg_no * 100 AS BIGINT) AS seg_offset,
               CAST(least(100, n_chars - seg_no * 100) AS BIGINT) AS seg_length,
               printf('%s-%04d.txt', 'doc-' || doc_id, CAST(seg_no AS INT)) AS seg_name
        FROM (
            SELECT doc_id, n_chars,
                   unnest(generate_series(
                       0, CAST(floor((greatest(n_chars, 1) - 1) / 100) AS BIGINT))) AS seg_no
            FROM documents
        )
    """,
}
