"""Additional analytics surface: grouping sets, pivot, correlated-subquery
shapes, ranking windows, string/date function suites, vector column stats.

None of these exist in the reference (a single-table system, SURVEY.md §2.5);
they complete the query surface a user migrating an analytics workload would
expect, each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from swiftbulkuploader_spark.catalog import load_table


def x5_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all grouping-set combinations."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


def x5_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts: one row per priority, one column per status.
    Values pinned so the output schema is static (required at scale — a
    dynamic pivot scans twice to discover values)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


def x5_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape: orders pricier than their customer's
    average. Expressed as a window (one shuffle) rather than a re-scan —
    the scale-correct decorrelation Catalyst would have to derive."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice",
                F.round("cust_avg", 6).alias("cust_avg"))
    )


def w3_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window suite: rank / dense_rank / ntile over order value per
    customer (the reference has zero window functions; W1/W2 cover
    row_number + running sums, this covers the rest)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


def w5_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-window suite: first/last/nth order values and lag/lead deltas
    per customer — completes the window-function family (W1 row_number,
    W2 running sums, W3 ranks)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(wfull).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(wfull).alias("second_price"),
        F.round(F.col("o_totalprice") - F.lag("o_totalprice", 1).over(w), 2).alias("delta_prev"),
        F.round(F.lead("o_totalprice", 1).over(w) - F.col("o_totalprice"), 2).alias("delta_next"),
    )


def x3_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function coverage over customer names: case, substring, pad,
    replace, split, edit distance to a constant."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("upper_name"),
        F.lower("c_name").alias("lower_name"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("padded_key"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("masked"),
        F.levenshtein(F.lower("c_name"), F.lit("customer")).alias("edit_dist"),
    )


def x5_monthly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date functions: revenue by calendar month (date_trunc) — the
    time-series rollup shape."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def x2_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column profile: per-vector dimension count, min/max/mean
    component — higher-order aggregates over array<float>."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    total = F.aggregate(vec, F.lit(0.0), lambda a, v: a + v)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_min(vec), 6).alias("comp_min"),
        F.round(F.array_max(vec), 6).alias("comp_max"),
        F.round(total / F.size("embedding"), 6).alias("comp_mean"),
    )


def x5_order_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation with deterministic ordering: each customer's sorted
    order keys (collect_list is unordered by contract — sort_array pins it;
    the unsorted form is NOT reproducible and never oracle-checkable)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.sort_array(F.collect_list("o_orderkey")).alias("orderkeys"),
            F.count("*").alias("n"),
        )
    )


def x_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics suite: coalesce / nullif / least-greatest / null-safe
    comparisons, exercised over a column made sparse with nullif."""
    events = load_table(spark, sf_dir, "events")
    sparse = F.nullif(F.round("value", 0), F.lit(100.0))  # ~1% become null
    return events.select(
        "event_id",
        sparse.alias("sparse_value"),
        F.coalesce(sparse, F.lit(-1.0)).alias("filled"),
        (sparse.eqNullSafe(F.lit(42.0))).alias("is_42_nullsafe"),
        F.greatest(sparse, F.col("value")).alias("greatest_v"),
        F.isnull(sparse).cast("boolean").alias("was_nulled"),
    )


def x5_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table (Spark 4 JOIN LATERAL): per nation,
    the top-2 customers by account balance — the 'for each outer row, run
    this parameterized subquery' shape. Catalyst decorrelates it into a
    ranked window join rather than executing the subquery per row, which is
    what keeps it viable when the outer side is large; deterministic
    tie-break on (acctbal DESC, name)."""
    from swiftbulkuploader_spark.catalog import load_tables

    load_tables(spark, sf_dir)
    return spark.sql("""
        SELECT n.n_name, t.c_name,
               round(t.c_acctbal, 2) AS acctbal
        FROM nation n JOIN LATERAL (
            SELECT c_name, c_acctbal FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) t
    """)


QUERIES = {
    "x5_lateral_topn": x5_lateral_topn,
    "w5_value_windows": w5_value_windows,
    "x5_order_lists": x5_order_lists,
    "x_null_handling": x_null_handling,
    "x5_cube_status_priority": x5_cube_status_priority,
    "x5_pivot_status": x5_pivot_status,
    "x5_above_avg_orders": x5_above_avg_orders,
    "w3_rank_ntile": w3_rank_ntile,
    "x3_string_suite": x3_string_suite,
    "x5_monthly_trend": x5_monthly_trend,
    "x2_vector_stats": x2_vector_stats,
}

ORACLES = {
    "x5_lateral_topn": """
        SELECT n.n_name, t.c_name, round(t.c_acctbal, 2) AS acctbal
        FROM nation n, LATERAL (
            SELECT c_name, c_acctbal FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) t
    """,
    "w5_value_windows": """
        SELECT o_custkey, o_orderkey,
               first_value(o_totalprice) OVER wfull AS first_price,
               last_value(o_totalprice) OVER wfull AS last_price,
               nth_value(o_totalprice, 2) OVER wfull AS second_price,
               round(o_totalprice - lag(o_totalprice, 1) OVER w, 2) AS delta_prev,
               round(lead(o_totalprice, 1) OVER w - o_totalprice, 2) AS delta_next
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
               wfull AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        """,
    "x5_order_lists": """
        SELECT o_custkey, list(o_orderkey ORDER BY o_orderkey) AS orderkeys,
               count(*) AS n
        FROM orders GROUP BY o_custkey
    """,
    "x_null_handling": """
        SELECT event_id,
               nullif(round(value, 0), 100.0) AS sparse_value,
               coalesce(nullif(round(value, 0), 100.0), -1.0) AS filled,
               (nullif(round(value, 0), 100.0) IS NOT DISTINCT FROM 42.0) AS is_42_nullsafe,
               greatest(nullif(round(value, 0), 100.0), value) AS greatest_v,
               (nullif(round(value, 0), 100.0) IS NULL) AS was_nulled
        FROM events
    """,
    "x5_cube_status_priority": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "x5_pivot_status": """
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        FROM orders GROUP BY o_orderpriority
    """,
    "x5_above_avg_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice,
               round(cust_avg, 6) AS cust_avg
        FROM (
            SELECT *, avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
            FROM orders
        ) WHERE o_totalprice > cust_avg
    """,
    "w3_rank_ntile": """
        SELECT o_custkey, o_orderkey,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk,
               CAST(ntile(4) OVER w AS INT) AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    "x3_string_suite": """
        SELECT c_custkey,
               upper(c_name) AS upper_name,
               lower(c_name) AS lower_name,
               substr(c_name, 1, 8) AS prefix8,
               lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded_key,
               regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked,
               CAST(levenshtein(lower(c_name), 'customer') AS INT) AS edit_dist
        FROM customer
    """,
    "x5_monthly_trend": """
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1
    """,
    "x2_vector_stats": """
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS dim,
               round(list_min(CAST(embedding AS DOUBLE[])), 6) AS comp_min,
               round(list_max(CAST(embedding AS DOUBLE[])), 6) AS comp_max,
               round(list_sum(CAST(embedding AS DOUBLE[])) / len(embedding), 6) AS comp_mean
        FROM embeddings
    """,
}
