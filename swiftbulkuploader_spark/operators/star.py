"""Star-schema joins & aggregates (SURVEY.md §2.9 X5).

The reference is a single-table system (SURVEY.md §2.5 — its only implicit
join is resume/anti-join), so the engine's join surface is exercised over the
driver's TPC-H-ish star schema: broadcast dim joins, multi-way equi-joins,
semi joins, grouped/rollup aggregates, and top-k.

Scale notes (100 TB): dimension tables (region/nation/part/supplier) are
broadcast — `F.broadcast` is stated explicitly where the optimizer's
statistics might not be available (e.g. after transformations). Fact-fact
joins (orders-lineitem) shuffle on the join key; AQE handles skew. All
aggregates are partial+final (map-side combine) automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swiftbulkuploader_spark.catalog import load_table


def x5_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem: grouped sums/avgs with
    a pushed-down date predicate. One scan, one narrow shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def x5_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style top-k: revenue per order for a market segment, top 10.
    Broadcast the filtered customer dim into the orders join; lineitem join
    shuffles on o_orderkey. Top-k is a TakeOrderedAndProject — no full sort.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def x5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style multi-way join: revenue by nation for one region.
    region/nation/supplier broadcast; customer-orders-lineitem shuffle."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def x5_rollup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate: customer count and balance by region/nation with
    subtotals — grouping-set coverage the reference lacks entirely."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )


def x5_semi_join_high_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one high-value order
    (EXISTS semantics — the positive counterpart of Q7's anti-join)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def x5_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-hash join of the part dim into the lineitem fact, grouped by
    brand — the canonical small-dim/large-fact shape at 100 TB."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.avg("p_retailprice"), 6).alias("avg_retail"),
        )
    )


def x5_full_outer_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the reconciliation shape (both-sides-may-be-missing):
    high-value customers vs recent big orders, classifying each key as
    matched / customer-only / order-only. Completes the join-type family
    (inner/broadcast, left, semi, anti, cross elsewhere).

    At scale a full outer cannot broadcast either side (both preserve
    unmatched rows) — it is always a co-partitioned shuffle join; the
    classification column is how a 100 TB reconciliation reports drift
    without materializing three separate joins."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 9000
    ).select("c_custkey", "c_name")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 350000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("key"),
        F.when(F.col("c_custkey").isNull(), "order_only")
         .when(F.col("o_custkey").isNull(), "customer_only")
         .otherwise("matched").alias("side"),
        F.coalesce("n_big", F.lit(0)).alias("n_big"),
    )


QUERIES = {
    "x5_full_outer_recon": x5_full_outer_recon,
    "x5_pricing_summary": x5_pricing_summary,
    "x5_top_revenue_orders": x5_top_revenue_orders,
    "x5_nation_revenue": x5_nation_revenue,
    "x5_rollup_customers": x5_rollup_customers,
    "x5_semi_join_high_value": x5_semi_join_high_value,
    "x5_brand_volume": x5_brand_volume,
}

ORACLES = {
    "x5_full_outer_recon": """
        WITH c AS (
            SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000
        ), o AS (
            SELECT o_custkey, count(*) AS n_big
            FROM orders WHERE o_totalprice > 350000 GROUP BY o_custkey
        )
        SELECT coalesce(c_custkey, o_custkey) AS key,
               CASE WHEN c_custkey IS NULL THEN 'order_only'
                    WHEN o_custkey IS NULL THEN 'customer_only'
                    ELSE 'matched' END AS side,
               coalesce(n_big, 0) AS n_big
        FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
    """,
    "x5_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "x5_top_revenue_orders": """
        SELECT o_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "x5_nation_revenue": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    "x5_rollup_customers": """
        SELECT r_name, n_name, count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    "x5_semi_join_high_value": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    "x5_brand_volume": """
        SELECT p_brand, count(*) AS n_items,
               round(sum(l_quantity), 2) AS sum_qty,
               round(avg(p_retailprice), 6) AS avg_retail
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
}
