"""Temporal join/window operators the guide calls out as Spark gaps:
as-of join, native session windows, top-K per group, unpivot.

The as-of join is the canonical "Spark lacks this" operator (DuckDB and kdb
have it natively): join each left row to the LATEST right row at or before
its timestamp. The scalable Spark formulation is union-tag + carry-forward
window — one shuffle on (key), no range explosion, no BroadcastNestedLoop:

    union(left-tagged, right-tagged)
      -> window last(right_value, ignorenulls) over
           (partition by key order by ts, right-first rows unbounded-to-now)
      -> keep left rows

DuckDB's native `ASOF JOIN` is the oracle, proving the rewrite exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from swiftbulkuploader_spark.catalog import load_table


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              value_cols: list[str]) -> DataFrame:
    """Each left row joined to the latest right row with right.ts <= left.ts
    (per key). Right rows sort before left rows at equal ts, so a same-
    instant right row IS visible to the left row (<=, not <)."""
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(key, ts, *value_cols).withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    for c in value_cols:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    unioned = lt.unionByName(rt.select(lt.columns))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[c for c in left.columns],
        "_side",
        *[F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w).alias(f"asof_{c}")
          for c in value_cols],
    )
    return carried.filter(F.col("_side") == 1).drop("_side", *value_cols)


def x7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each error event: the value of the same user's most recent
    non-error event at or before it (as-of semantics)."""
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    signals = events.filter(F.col("event_type") != "error").select(
        "user_id", "ts", F.col("value").alias("sig_value"), F.col("event_id").alias("sig_id")
    )
    out = asof_join(errors, signals, key="user_id", ts="ts",
                    value_cols=["sig_value", "sig_id"])
    return out.select(
        "event_id",
        "user_id",
        F.round("asof_sig_value", 2).alias("prev_value"),
        F.col("asof_sig_id").alias("prev_event_id"),
    )


def w4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by value — the row_number<=K idiom
    (TakeOrdered per group; one shuffle, no global sort)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("long").alias("rn"))
    )


def x5_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot lineitem's four measures to (measure, value) rows via stack —
    the long-format reshape feeding generic profilers."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(4, 'quantity', l_quantity, 'price', l_extendedprice, "
            "'discount', l_discount, 'tax', l_tax) AS (measure, value)"
        ),
    )


def x7_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in session_window (gap-based, batch form): same
    semantics as the lag+cumsum sessionization, one aggregation instead of
    two window passes. session end = last event + gap by definition."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def x7_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build from a change log: per user, each *change* of
    event_type opens a validity interval [valid_from, valid_to) closed by
    the next change (null = current). The warehouse dimension-history shape:
    change-capture (lag + filter) then interval stitching (lead) — two
    window passes over ONE shuffle on the key (same partitioning, Catalyst
    reuses the exchange)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        events.select("user_id", "event_id", "ts", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
    )
    # same window spec for both passes — one definition, one exchange
    fmt = "yyyy-MM-dd HH:mm:ss"
    return changed.select(
        "user_id",
        "event_type",
        F.date_format("ts", fmt).alias("valid_from"),
        F.date_format(F.lead("ts").over(w), fmt).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
        F.row_number().over(w).cast("long").alias("version"),
    )


QUERIES = {
    "x7_scd2_history": x7_scd2_history,
    "x7_asof_join": x7_asof_join,
    "w4_topk_per_group": w4_topk_per_group,
    "x5_unpivot_measures": x5_unpivot_measures,
    "x7_session_window_native": x7_session_window_native,
}

ORACLES = {
    "x7_scd2_history": """
        WITH changed AS (
            SELECT user_id, event_id, ts, event_type,
                   lag(event_type) OVER w AS prev_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), runs AS (
            SELECT user_id, event_id, ts, event_type
            FROM changed
            WHERE prev_type IS NULL OR event_type <> prev_type
        )
        SELECT user_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
               strftime(lead(ts) OVER w2, '%Y-%m-%d %H:%M:%S') AS valid_to,
               (lead(ts) OVER w2 IS NULL) AS is_current,
               CAST(row_number() OVER w2 AS BIGINT) AS version
        FROM runs
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "x7_asof_join": """
        SELECT e.event_id, e.user_id,
               round(s.value, 2) AS prev_value,
               s.event_id AS prev_event_id
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type <> 'error') s
          ON e.user_id = s.user_id AND s.ts <= e.ts
    """,
    "w4_topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    "x5_unpivot_measures": """
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    """,
    "x7_session_window_native": f"""
        WITH sess AS (
            SELECT user_id, ts, value,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_no
            FROM (
                SELECT user_id, ts, event_id, value,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                 IS NULL THEN 1
                            WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                                 PARTITION BY user_id ORDER BY ts, event_id))
                                 >= {30 * 60 * 1_000_000} THEN 1
                            ELSE 0 END AS is_new
                FROM events
            )
        )
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM sess GROUP BY user_id, session_no
    """,
}
