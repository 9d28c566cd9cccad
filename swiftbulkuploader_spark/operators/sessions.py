"""Sessionization (gap-based) over the events stream — the engine's custom
stateful operator showcase.

Batch form (`x7_sessionize`): pure window functions — lag + cumulative sum of
gap-breaks assigns session ids in two narrow shuffles on user_id. Fully
SQL-expressible, DuckDB-oracle-checked.

Streaming form lives in streaming/stateful.py (applyInPandasWithState) with
identical semantics, so the batch oracle doubles as the streaming spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from swiftbulkuploader_spark.catalog import load_table

GAP_MINUTES = 30


def sessionize(events: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """Assign gap-based sessions per user: a new session starts when the gap
    since the previous event exceeds `gap_minutes`."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    # microsecond precision on both sides of the oracle (DuckDB epoch_us);
    # whole-second casts would disagree on fractional-second boundaries
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    is_new = (
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(ts_us - F.lag(ts_us).over(w) > gap_us, 1)
        .otherwise(0)
    )
    return events.withColumn("session_no", F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))


def x7_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollup: bounds, event count, total value. Two shuffles on
    user_id (window + groupBy share the partitioning — Catalyst reuses the
    exchange)."""
    events = load_table(spark, sf_dir, "events")
    return (
        sessionize(events)
        .groupBy("user_id", "session_no")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def x7_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-length distribution — the report a funnel analysis starts
    from."""
    events = load_table(spark, sf_dir, "events")
    per_session = sessionize(events).groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events")
    )
    return per_session.groupBy("n_events").agg(
        F.count("*").alias("n_sessions")
    )


QUERIES = {
    "x7_sessionize": x7_sessionize,
    "x7_session_stats": x7_session_stats,
}

_SESSIONIZED = f"""
    SELECT user_id, ts, event_id, value,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
    FROM (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL THEN 1
                    WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id))
                         > {GAP_MINUTES * 60 * 1_000_000} THEN 1
                    ELSE 0 END AS is_new
        FROM events
    )
"""

ORACLES = {
    "x7_sessionize": f"""
        SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM ({_SESSIONIZED})
        GROUP BY user_id, session_no
    """,
    "x7_session_stats": f"""
        SELECT n_events, count(*) AS n_sessions
        FROM (
            SELECT user_id, session_no, count(*) AS n_events
            FROM ({_SESSIONIZED})
            GROUP BY user_id, session_no
        )
        GROUP BY n_events
    """,
}


def x7_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for TIME TO FIRST ERROR per user: each
    user's duration runs from their first event to their first 'error'
    (event) or to their last observed event (right-censored — the user
    left without erroring). The product-limit estimator
    S(t) = prod_{t_i <= t} (1 - d_i/n_i) is THE standard way to answer
    'what share of users survive h hours error-free' without the bias of
    dropping censored users.

    Distributed form: durations are exact integer microseconds; the
    at-risk count n_i = N - (#durations strictly below t_i) comes from one
    cumulative window over the duration histogram (no correlated
    subquery), and the running product is exp(cumsum(ln(1 - d/n))) in
    duration order — frame-ordered, so both engines accumulate identical
    terms (ln/exp ulps inside the 9-digit normalization). d_i/n_i is an
    exact integer division.

    Shape: one per-user aggregate, one duration-histogram aggregate, two
    ordered windows over the (distinct durations)-sized table."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.max("ts").alias("t_end"),
        F.min(F.when(F.col("event_type") == "error", F.col("ts"))).alias("t_err"),
    )
    dur_us = (
        F.unix_micros(F.coalesce("t_err", "t_end").cast("timestamp"))
        - F.unix_micros(F.col("t0").cast("timestamp"))
    )
    durs = per_user.select(
        dur_us.alias("dur_us"),
        F.col("t_err").isNotNull().alias("evt"),
    )
    hist = durs.groupBy("dur_us").agg(
        F.count(F.lit(1)).alias("n_at_t"),
        F.sum(F.when(F.col("evt"), 1).otherwise(0)).alias("d"),
    )
    w_ord = Window.orderBy("dur_us").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_tot = Window.partitionBy()
    risk = hist.select(
        "dur_us",
        "d",
        (
            F.sum("n_at_t").over(w_tot)
            - F.coalesce(F.sum("n_at_t").over(w_ord), F.lit(0))
        ).alias("n_at_risk"),
    ).where(F.col("d") > 0)
    w_run = Window.orderBy("dur_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # a time where EVERY at-risk user errors (d = n) is an exact-zero
    # factor: ln() blows up, so it's flagged and S pinned to 0 from there
    frac = F.col("d").cast("double") / F.col("n_at_risk").cast("double")
    dead = F.max(F.when(F.col("d") == F.col("n_at_risk"), 1).otherwise(0)).over(w_run)
    logsum = F.sum(
        F.when(F.col("d") < F.col("n_at_risk"), F.log(F.lit(1.0) - frac))
        .otherwise(F.lit(0.0))
    ).over(w_run)
    surv = F.when(dead == 1, F.lit(0.0)).otherwise(F.exp(logsum))
    return risk.select(
        "dur_us",
        (F.col("dur_us").cast("double") / F.lit(3_600_000_000.0)).alias("dur_hours"),
        F.col("d").cast("long").alias("d"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        surv.alias("survival"),
    )


QUERIES["x7_kaplan_meier"] = x7_kaplan_meier

ORACLES["x7_kaplan_meier"] = """
    WITH per_user AS (
        SELECT user_id, min(ts) AS t0, max(ts) AS t_end,
               min(CASE WHEN event_type = 'error' THEN ts END) AS t_err
        FROM events GROUP BY user_id
    ), durs AS (
        SELECT epoch_us(coalesce(t_err, t_end)) - epoch_us(t0) AS dur_us,
               t_err IS NOT NULL AS evt
        FROM per_user
    ), hist AS (
        SELECT dur_us, count(*) AS n_at_t,
               sum(CASE WHEN evt THEN 1 ELSE 0 END) AS d
        FROM durs GROUP BY dur_us
    ), risk AS (
        SELECT dur_us, d,
               sum(n_at_t) OVER ()
                   - coalesce(sum(n_at_t) OVER (ORDER BY dur_us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_at_risk
        FROM hist
    ), ev AS (
        SELECT * FROM risk WHERE d > 0
    )
    SELECT dur_us,
           CAST(dur_us AS DOUBLE) / CAST(3600000000 AS DOUBLE) AS dur_hours,
           CAST(d AS BIGINT) AS d,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CASE WHEN max(CASE WHEN d = n_at_risk THEN 1 ELSE 0 END)
                     OVER w = 1
                THEN CAST(0 AS DOUBLE)
                ELSE exp(sum(CASE WHEN d < n_at_risk
                                  THEN ln(CAST(1 AS DOUBLE)
                                          - CAST(d AS DOUBLE)
                                            / CAST(n_at_risk AS DOUBLE))
                                  ELSE CAST(0 AS DOUBLE) END) OVER w)
           END AS survival
    FROM ev
    WINDOW w AS (ORDER BY dur_us ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
"""
