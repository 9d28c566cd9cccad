"""Time-series regularization: gap-fill (time spine + forward fill).

Event streams are irregular; downstream models want a regular grid. The
operator: per key, build the hourly spine spanning that key's activity
window (`sequence` + `explode` — no driver loop, no UDF), left-join the
bucketed observations, and forward-fill with `last(value, ignorenulls)`
over an ordered window. Everything is one narrow shuffle on the key plus
the spine explode; spine rows ∝ keys x hours, independent of event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from swiftbulkuploader_spark.catalog import load_table


def gap_fill(events: DataFrame, key: str, ts: str, value: str,
             step: str = "1 hour") -> DataFrame:
    """(key, hour, value, filled): one row per key per step in the key's
    [min, max] activity window; `value` is the step's mean observation
    (null where no events), `filled` carries the last observation forward."""
    bucketed = events.select(
        key,
        F.date_trunc("hour", F.col(ts)).alias("bucket"),
        F.col(value).alias("v"),
    ).groupBy(key, "bucket").agg(F.avg("v").alias("v"))

    spans = bucketed.groupBy(key).agg(
        F.min("bucket").alias("t0"), F.max("bucket").alias("t1")
    )
    spine = spans.select(
        key,
        F.explode(
            F.sequence("t0", "t1", F.expr(f"INTERVAL {step}"))
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(bucketed, [key, "bucket"], "left")
        .select(
            key,
            "bucket",
            F.round("v", 6).alias("value"),
            F.round(F.last("v", ignorenulls=True).over(w), 6).alias("filled"),
        )
    )


def x7_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user value grid over events, forward-filled."""
    events = load_table(spark, sf_dir, "events")
    out = gap_fill(events, key="user_id", ts="ts", value="value")
    return out.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "value",
        "filled",
    )


def hourly_rollup(events: DataFrame, ts: str = "ts", value: str = "value") -> DataFrame:
    """The base continuous aggregate: per (event_type, hour) count / sum —
    chosen so every coarser resolution derives from THIS table alone
    (sums of sums), never from the raw events again."""
    return (
        events.groupBy(
            "event_type", F.date_trunc("hour", F.col(ts)).alias("hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(value, 2)).alias("total_value"),
        )
    )


def x7_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: daily aggregates computed
    FROM the hourly rollup (not from raw events) — the re-aggregation
    pattern that makes 100 TB dashboards cheap: the raw table is touched
    once per hour-partition, every coarser view reads rollup rows
    (∝ types x hours, independent of event count). avg is derived as
    sum/count, which re-aggregates exactly; a stored avg would not."""
    events = load_table(spark, sf_dir, "events")
    hourly = hourly_rollup(events)
    return (
        hourly.groupBy(
            "event_type", F.date_trunc("day", "hour").alias("day")
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("total_value"), 2).alias("total_value"),
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            F.col("total_value"),
            F.round(F.col("total_value") / F.col("n_events"), 6).alias("avg_value"),
        )
    )


def x7_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB'14): per time bucket
    keep exactly the min, max, first and last values — the four points that
    make a line chart of the bucket pixel-identical to the full series.
    THE standard way to ship a billion-point series to a dashboard.

    Shape: one bucketed groupBy with min/max plus two row_number windows
    (ascending/descending within the bucket, event_id tie-break) resolved
    in the same partitioned pass — everything is keyed on the bucket, so
    the plan is a narrow per-bucket window + aggregate with no global sort
    at any scale."""
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    b = events.select(
        F.window("ts", "1 hour").alias("w"), "ts", "event_id", "value"
    ).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "ts", "event_id", "value",
    )
    asc = Window.partitionBy("bucket").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    desc = Window.partitionBy("bucket").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    r = b.select(
        "bucket", "value",
        F.row_number().over(asc).alias("rn_a"),
        F.row_number().over(desc).alias("rn_d"),
    )
    return r.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("v_first"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("v_last"),
    )


ZORDER_BITS = 16


def x7_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER layout audit for the events table: Morton-interleave
    (user_id, minute-bucket) into one sort key, then report per
    z-range-bucket min/max of both dimensions — the statistics a
    lakehouse writer would persist as file-level min/max after sorting by
    this key. Tight per-bucket ranges in BOTH columns are exactly what
    lets a scan skip files for either `user_id = ?` or time-range
    predicates; a single-column sort gives this for one dimension only.

    Scale shape: the key is `plans.layout.zorder_key` — the SAME Column
    expression `write_zordered` clusters files with (whose row-group
    skipping is measured by `minmax_prunable_fraction`, SCALING.md Z-order
    row) — so the audit reports exactly the locality the write path
    produces; zero shuffle to compute, one groupBy over ~2^10 buckets.
    The oracle replays the bit interleave exactly (integer shift/mask on
    both engines)."""
    from swiftbulkuploader_spark.plans.layout import zorder_key

    events = load_table(spark, sf_dir, "events")
    e = events.select(
        F.col("user_id").bitwiseAND(F.lit(65535)).alias("ka"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    ).withColumn("kb", F.expr("us div 60000000").bitwiseAND(F.lit(65535)))
    z = zorder_key(F.col("ka"), F.col("kb"), bits=ZORDER_BITS)
    return (
        e.withColumn("zb", F.shiftright(z, 22))
        .groupBy("zb")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ka").alias("ua_min"),
            F.max("ka").alias("ua_max"),
            F.min("kb").alias("tb_min"),
            F.max("kb").alias("tb_max"),
        )
    )


def _zorder_oracle_sql() -> str:
    """GENERATED Morton oracle: the same interleave terms the Column loop
    emits, as one integer expression."""
    terms = " | ".join(
        f"(((ka >> {i}) & 1) << {2 * i}) | (((kb >> {i}) & 1) << {2 * i + 1})"
        for i in range(ZORDER_BITS)
    )
    return f"""
        WITH e AS (
            SELECT user_id & 65535 AS ka,
                   (epoch_us(ts) // 60000000) & 65535 AS kb
            FROM events
        ), z AS (
            SELECT ka, kb, ({terms}) >> 22 AS zb FROM e
        )
        SELECT zb, CAST(count(*) AS BIGINT) AS n,
               min(ka) AS ua_min, max(ka) AS ua_max,
               min(kb) AS tb_min, max(kb) AS tb_max
        FROM z GROUP BY zb
    """


QUERIES = {
    "x7_m4_downsample": x7_m4_downsample,
    "x7_gap_fill": x7_gap_fill,
    "x7_multi_rollup": x7_multi_rollup,
    "x7_zorder_locality": x7_zorder_locality,
}

ORACLES = {
    "x7_m4_downsample": """
        WITH b AS (
            SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                            '%Y-%m-%d %H:%M:%S') AS bucket,
                   ts, event_id, value
            FROM events
        ), r AS (
            SELECT bucket, value,
                   row_number() OVER (PARTITION BY bucket
                                      ORDER BY ts ASC, event_id ASC) AS rn_a,
                   row_number() OVER (PARTITION BY bucket
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM b
        )
        SELECT bucket,
               CAST(count(*) AS BIGINT) AS n,
               min(value) AS v_min,
               max(value) AS v_max,
               max(CASE WHEN rn_a = 1 THEN value END) AS v_first,
               max(CASE WHEN rn_d = 1 THEN value END) AS v_last
        FROM r
        GROUP BY bucket
    """,
    "x7_gap_fill": """
        WITH bucketed AS (
            SELECT user_id, date_trunc('hour', ts) AS bucket, avg(value) AS v
            FROM events GROUP BY user_id, date_trunc('hour', ts)
        ), spans AS (
            SELECT user_id, min(bucket) AS t0, max(bucket) AS t1
            FROM bucketed GROUP BY user_id
        ), spine AS (
            SELECT user_id,
                   unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket
            FROM spans
        )
        SELECT s.user_id,
               strftime(s.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
               round(b.v, 6) AS value,
               round(last_value(b.v IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled
        FROM spine s LEFT JOIN bucketed b USING (user_id, bucket)
    """,
    "x7_multi_rollup": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS n_events, sum(round(value, 2)) AS total_value
            FROM events GROUP BY 1, 2
        )
        SELECT event_type,
               strftime(date_trunc('day', hour), '%Y-%m-%d') AS day,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               round(sum(total_value), 2) AS total_value,
               round(round(sum(total_value), 2) / sum(n_events), 6) AS avg_value
        FROM hourly GROUP BY 1, 2
    """,
}

ORACLES["x7_zorder_locality"] = _zorder_oracle_sql()


ANOM_WIN = 24        # trailing hours in the baseline window
ANOM_Z = 3.0


def x7_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on the hourly event rate — the
    monitoring query that pages someone: count events per (event_type,
    hour), compare each hour to the mean/stddev of its TRAILING 24-hour
    window (ROWS frame, excluding the current row so a spike cannot mask
    itself), flag |z| > 3.

    Shape: one bucketed aggregate (rows ∝ types x hours, independent of
    event count) + one per-type window over that aggregate — at any scale
    the window input is the ROLLUP, never raw events (the
    x7_multi_rollup argument). Degenerate guards (x6_ks_drift
    discipline): warmup rows with < 3 trailing hours or a zero/NULL
    stddev (constant baseline) yield NULL z and NULL flag on both
    engines via nullif; the flag is decided on a 6-dp-rounded |z|
    (round-before-boolean)."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-ANOM_WIN, -1)
    )
    mu = F.avg("n").over(w)
    sd = F.stddev_samp(F.col("n").cast("double")).over(w)
    nw = F.count(F.lit(1)).over(w)
    z = (F.col("n") - mu) / F.nullif(sd, F.lit(0.0))
    z = F.when(nw >= 3, z)  # need >= 3 trailing points for a usable sd
    return hourly.select(
        "event_type",
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("n").cast("long").alias("n"),
        z.alias("z_score"),
        (F.abs(F.round(z, 6)) > F.lit(ANOM_Z)).alias("anomalous"),
    )


ORACLES["x7_rate_anomaly"] = f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), win AS (
        SELECT event_type, hour, n,
               avg(n) OVER tw AS mu,
               stddev_samp(CAST(n AS DOUBLE)) OVER tw AS sd,
               count(*) OVER tw AS nw
        FROM hourly
        WINDOW tw AS (PARTITION BY event_type ORDER BY hour
                      ROWS BETWEEN {ANOM_WIN} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type,
           strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
           n,
           CASE WHEN nw >= 3 THEN (n - mu) / nullif(sd, CAST(0 AS DOUBLE)) END
               AS z_score,
           abs(round(CASE WHEN nw >= 3
                          THEN (n - mu) / nullif(sd, CAST(0 AS DOUBLE)) END, 6))
               > CAST({ANOM_Z} AS DOUBLE) AS anomalous
    FROM win
"""

QUERIES["x7_rate_anomaly"] = x7_rate_anomaly


def x7_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-WEIGHTED average per (user, hour) — the metric that is correct
    when observations arrive irregularly: a value that held for 50 minutes
    must count 50x more than one superseded after a minute, which the
    plain AVG the hourly rollup computes gets wrong. Standard in finance
    (TWAP) and ops telemetry (gauge averaging over irregular scrapes).

    Each event's value is weighted by how long it remained current: the
    microseconds until the SAME user's next event in the SAME hour (one
    lead() over the (user, hour) window — segments never cross the bucket
    boundary, so the bucket total is exactly the intra-bucket span). The
    bucket's last event has no successor -> NULL duration -> drops out of
    both sums; single-event buckets (and zero-span all-simultaneous
    buckets, via nullif) yield twap NULL rather than a fake average.
    Durations are exact integer MICROSECONDS (unix_micros both sides —
    DuckDB epoch_us; fractional-second epoch() would diverge), so the
    weights are engine-exact and the only doubles are the final
    value x dur products (summation-order ulps absorbed by the verifier's
    9-significant-digit normalization).

    Shape: one (user_id, hour)-keyed window shuffle feeding a groupBy on
    the SAME key — the sort the window already did makes the aggregation
    partial-free; linear, no skew beyond the per-user event share."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "ts", "event_id", "value",
    )
    w = Window.partitionBy("user_id", "hour").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP — the NTZ->TZ cast
    # shifts both subtraction operands identically, so durations are exact
    dur = (
        F.unix_micros(F.lead("ts", 1).over(w).cast("timestamp"))
        - F.unix_micros(F.col("ts").cast("timestamp"))
    ).cast("double")
    seg = base.withColumn("dur", dur)
    return (
        seg.groupBy("user_id", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.col("value") * F.col("dur"))
                / F.nullif(F.sum("dur"), F.lit(0.0))
            ).alias("twap"),
        )
    )


QUERIES["x7_twap"] = x7_twap

ORACLES["x7_twap"] = """
    WITH seg AS (
        SELECT user_id,
               date_trunc('hour', ts) AS hour,
               value,
               CAST(epoch_us(lead(ts, 1) OVER
                   (PARTITION BY user_id, date_trunc('hour', ts)
                    ORDER BY ts, event_id)) - epoch_us(ts) AS DOUBLE) AS dur
        FROM events
    )
    SELECT user_id, hour,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(value * dur) / nullif(sum(dur), CAST(0 AS DOUBLE)) AS twap
    FROM seg
    GROUP BY user_id, hour
"""


# ---------------------------------------------------------------------------
# X7 — EWMA recency smoothing
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.25  # exactly representable in binary: 0.25/0.75 carry no
                   # decimal-vs-double literal drift between engines


def x7_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event values —
    the recency-weighted health metric dashboards smooth with (and the
    one window functions cannot express: the recursion s_t = 0.75*s_{t-1}
    + 0.25*x_t has no frame-based form). Emitted per user with the plain
    mean and the recency drift (ewma - mean): a user whose recent values
    run hot shows positive drift long before the global mean moves.

    The recursion runs as an ORDERED LIST FOLD with identical semantics
    on both engines — Spark `aggregate` seeded with the first element
    over the chronologically-sorted value array vs DuckDB `list_reduce`
    (which seeds the same way) — so the oracle checks the exact float,
    not a tolerance. Alpha 0.25 keeps every multiply exact-representable.

    Scale shape: one groupBy(user) shuffle builds the sorted array;
    per-user sequences are session-bounded (the same boundedness contract
    as x7_sessionize's collect paths). For UNBOUNDED keys the engine's
    streaming twin is `transformWithState` (streaming/stateful_v2.py) —
    the same recursion as incremental per-key state instead of an array."""
    ev = load_table(spark, sf_dir, "events")
    per = (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("seq"),
            F.avg("value").alias("mean_value"),
        )
        .select(
            "user_id",
            "mean_value",
            F.transform("seq", lambda s: s["value"]).alias("vals"),
        )
    )
    n = F.size("vals")
    ewma = F.aggregate(
        F.slice("vals", 2, n - 1),
        F.element_at("vals", 1),
        lambda acc, x: acc * F.lit(0.75) + x * F.lit(0.25),
    )
    return per.select(
        "user_id",
        n.cast("long").alias("n_events"),
        F.element_at("vals", -1).alias("last_value"),
        "mean_value",
        ewma.alias("ewma"),
        (ewma - F.col("mean_value")).alias("recency_drift"),
    )


# ---------------------------------------------------------------------------
# X7 — dense hourly series: ACF, seasonal decomposition, CUSUM changepoint
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 6


def _dense_hourly_counts(events: DataFrame) -> DataFrame:
    """(event_type, bucket, x): the per-type hourly event-count series made
    DENSE over each type's own [min, max] activity window (missing hours are
    true zeros, not absent rows) — lag-based statistics are wrong on gappy
    sequences because row-offset lags silently skip the gaps. Same
    spine-explode shape as `gap_fill`: rows ∝ types x hours, independent of
    event count. x is the integer count cast to double so every downstream
    arithmetic step is identical on both engines (integer sums are exact in
    double regardless of summation order).

    persist()ed (r13-opt, guide §2.4/§5 — the shingle_base discipline):
    twelve x7 queries derive from this one rollup, and several reference it
    2-3x inside one plan (theil_sen's pair self-join + residual join ran
    the events scan + rollup 12x per action). The frame is types x hours
    rows — metadata-sized at ANY corpus scale — and the cache manager keys
    on the logical plan, so every consumer building the same rollup hits
    the same InMemoryRelation instead of re-aggregating events."""
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n0"))
    spans = hourly.groupBy("event_type").agg(
        F.min("bucket").alias("t0"), F.max("bucket").alias("t1")
    )
    spine = spans.select(
        "event_type",
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 hour"))).alias("bucket"),
    )
    return spine.join(hourly, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce("n0", F.lit(0)).cast("double").alias("x"),
    ).persist()


_DENSE_SQL = """
    hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket, count(*) AS n0
        FROM events GROUP BY 1, 2
    ), spans AS (
        SELECT event_type, min(bucket) AS t0, max(bucket) AS t1
        FROM hourly GROUP BY 1
    ), spine AS (
        SELECT event_type,
               unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket
        FROM spans
    ), dense AS (
        SELECT s.event_type, s.bucket, CAST(coalesce(h.n0, 0) AS DOUBLE) AS x
        FROM spine s LEFT JOIN hourly h USING (event_type, bucket)
    )"""


def x7_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the hourly event-rate series, lags 1..6,
    per event type — the seasonality/burstiness diagnostic run before any
    forecasting or anomaly model (a daily cycle shows up as a hump at lag 24;
    white noise stays inside ±2/sqrt(n)).

    Estimator: acf_L = sum_t (x_t - mu)(x_{t-L} - mu) / sum_t (x_t - mu)^2
    with the full-series mean (the standard biased ACF — denominators shared
    across lags so the function is positive semidefinite). mu is an EXACT
    integer-sum / count division, so the centered series is bit-identical on
    both engines; the remaining cross-engine drift is summation-order ulps
    absorbed by the verifier's 9-significant-digit normalization.

    Shape: one (type, hour) aggregate (rows ∝ types x hours, never event
    count), one per-type window sort producing all 6 lag columns in a single
    pass, one per-type aggregate, then a 6-element explode. At 100 TB the
    window input is the rollup — ~10^5 rows per type-year — not raw events."""
    events = load_table(spark, sf_dir, "events")
    dense = _dense_hourly_counts(events)
    wp = Window.partitionBy("event_type")
    mu = F.sum("x").over(wp) / F.count(F.lit(1)).over(wp)
    cen = dense.select("event_type", "bucket", (F.col("x") - mu).alias("xc"))
    wo = Window.partitionBy("event_type").orderBy("bucket")
    lagged = cen.select(
        "event_type",
        "xc",
        *[F.lag("xc", L).over(wo).alias(f"l{L}") for L in range(1, ACF_MAX_LAG + 1)],
    )
    agg = lagged.groupBy("event_type").agg(
        F.sum(F.col("xc") * F.col("xc")).alias("den"),
        *[F.sum(F.col("xc") * F.col(f"l{L}")).alias(f"num{L}")
          for L in range(1, ACF_MAX_LAG + 1)],
        *[F.count(F.col(f"l{L}")).alias(f"p{L}")
          for L in range(1, ACF_MAX_LAG + 1)],
    )
    rows = agg.select(
        "event_type",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(L).cast("int").alias("lag"),
                    F.col(f"p{L}").cast("long").alias("n_pairs"),
                    (F.col(f"num{L}") / F.nullif(F.col("den"), F.lit(0.0))).alias("acf"),
                )
                for L in range(1, ACF_MAX_LAG + 1)
            ])
        ).alias("s"),
    )
    return rows.select("event_type", "s.lag", "s.n_pairs", "s.acf")


QUERIES["x7_acf"] = x7_acf

ORACLES["x7_acf"] = f"""
    WITH {_DENSE_SQL}
    , cen AS (
        SELECT event_type, bucket,
               x - (sum(x) OVER (PARTITION BY event_type)
                    / count(*) OVER (PARTITION BY event_type)) AS xc
        FROM dense
    ), lagged AS (
        SELECT event_type, xc,
               {', '.join(f'lag(xc, {L}) OVER w AS l{L}' for L in range(1, ACF_MAX_LAG + 1))}
        FROM cen
        WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
    ), agg AS (
        SELECT event_type, sum(xc * xc) AS den,
               {', '.join(f'sum(xc * l{L}) AS num{L}, count(l{L}) AS p{L}' for L in range(1, ACF_MAX_LAG + 1))}
        FROM lagged GROUP BY event_type
    )
    {' UNION ALL '.join(
        f'''SELECT event_type, CAST({L} AS INT) AS lag,
               CAST(p{L} AS BIGINT) AS n_pairs,
               num{L} / nullif(den, CAST(0 AS DOUBLE)) AS acf FROM agg'''
        for L in range(1, ACF_MAX_LAG + 1))}
"""


TREND_HALF = 12  # centered moving-average half-width (25-hour window)


def x7_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the hourly event rate per
    type: trend (centered 25-hour moving average, NULL until the window is
    full — no edge bias), detrended = x - trend, seasonal index = mean
    detrended per hour-of-day, residual = detrended - seasonal. The
    dashboard/capacity-planning primitive: residuals feed anomaly thresholds
    that neither re-alarm every rush hour nor miss a real drift.

    Exactness: x is an integer count, so the 25-term trend window sum is
    EXACT in double. All derived quantities stay in the 25-SCALED INTEGER
    space (d25 = 25*x - window_sum is integer-valued and exact; its per-hod
    sum is exact too), so trend = s25/25, seasonal = sum(d25)/(25*m) and
    residual = d25/25 - seasonal are each single identically-rounded
    divisions/subtractions of bit-identical operands — NO cross-engine ulp
    anywhere (a naive avg(detrended) fails the verify: the residual is a
    near-total cancellation and summation-order noise dominates it).

    Shape: everything is keyed on (type) or (type, hour-of-day) windows over
    the DENSE ROLLUP (rows ∝ types x hours) — raw events are touched once by
    the bucketing aggregate; no join, two narrow window passes."""
    events = load_table(spark, sf_dir, "events")
    dense = _dense_hourly_counts(events)
    wt = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-TREND_HALF, TREND_HALF)
    )
    width = 2 * TREND_HALF + 1
    full = F.count(F.lit(1)).over(wt) == width
    s25 = F.when(full, F.sum("x").over(wt))
    step1 = dense.select(
        "event_type",
        "bucket",
        F.hour("bucket").cast("long").alias("hod"),
        "x",
        s25.alias("s25"),
    ).withColumn("d25", F.lit(float(width)) * F.col("x") - F.col("s25"))
    ws = Window.partitionBy("event_type", "hod")
    seasonal = F.sum("d25").over(ws) / (
        F.lit(float(width)) * F.count("d25").over(ws)
    )
    return step1.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "hod",
        "x",
        (F.col("s25") / F.lit(float(width))).alias("trend"),
        seasonal.alias("seasonal"),
        (F.col("d25") / F.lit(float(width)) - seasonal).alias("residual"),
    )


QUERIES["x7_seasonal_decompose"] = x7_seasonal_decompose

ORACLES["x7_seasonal_decompose"] = f"""
    WITH {_DENSE_SQL}
    , t AS (
        SELECT event_type, bucket, CAST(hour(bucket) AS BIGINT) AS hod, x,
               CASE WHEN count(*) OVER w = {2 * TREND_HALF + 1}
                    THEN sum(x) OVER w
               END AS s25
        FROM dense
        WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN {TREND_HALF} PRECEDING AND {TREND_HALF} FOLLOWING)
    ), d AS (
        SELECT *, CAST({2 * TREND_HALF + 1} AS DOUBLE) * x - s25 AS d25 FROM t
    )
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           hod, x,
           s25 / CAST({2 * TREND_HALF + 1} AS DOUBLE) AS trend,
           sum(d25) OVER hw
               / (CAST({2 * TREND_HALF + 1} AS DOUBLE) * count(d25) OVER hw)
               AS seasonal,
           d25 / CAST({2 * TREND_HALF + 1} AS DOUBLE)
               - sum(d25) OVER hw
                 / (CAST({2 * TREND_HALF + 1} AS DOUBLE) * count(d25) OVER hw)
               AS residual
    FROM d
    WINDOW hw AS (PARTITION BY event_type, hod)
"""


def x7_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan per event type: S_t = sum_{i<=t} (x_i - mu)
    over the dense hourly rate series; the hour with the largest |S_t| is the
    most likely single level-shift point, and |S|_max / (sd * sqrt(n)) is the
    scale-free evidence score (≈ the Kolmogorov statistic of the sequence;
    > ~1.3 is suspicious). The batch form of the monitoring primitive behind
    'did the event rate step-change, and when?'.

    Exactness: mu is an exact integer-sum / count division, each deviation is
    bit-identical, and the running CUSUM adds them in FRAME ORDER on both
    engines — the argmax therefore ranks identical doubles; the 6-dp
    round-before-rank + bucket tie-break follows the repo's ordering rule.

    Shape: one rollup aggregate + two per-type window passes over it + a
    1-row-per-type argmax filter; rows ∝ types x hours at any event scale."""
    events = load_table(spark, sf_dir, "events")
    dense = _dense_hourly_counts(events)
    wp = Window.partitionBy("event_type")
    stats = dense.select(
        "event_type",
        "bucket",
        "x",
        (F.sum("x").over(wp) / F.count(F.lit(1)).over(wp)).alias("mu"),
        F.stddev_samp("x").over(wp).alias("sd"),
        F.count(F.lit(1)).over(wp).alias("n_hours"),
    )
    wo = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cus = stats.withColumn("cusum", F.sum(F.col("x") - F.col("mu")).over(wo))
    wr = Window.partitionBy("event_type").orderBy(
        F.round(F.abs("cusum"), 6).desc(), F.col("bucket").asc()
    )
    return (
        cus.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n_hours").cast("long").alias("n_hours"),
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("cp_bucket"),
            "cusum",
            (
                F.abs("cusum")
                / F.nullif(F.col("sd") * F.sqrt(F.col("n_hours").cast("double")), F.lit(0.0))
            ).alias("score"),
        )
    )


QUERIES["x7_cusum_changepoint"] = x7_cusum_changepoint

ORACLES["x7_cusum_changepoint"] = f"""
    WITH {_DENSE_SQL}
    , stats AS (
        SELECT event_type, bucket, x,
               sum(x) OVER p / count(*) OVER p AS mu,
               stddev_samp(x) OVER p AS sd,
               count(*) OVER p AS n_hours
        FROM dense
        WINDOW p AS (PARTITION BY event_type)
    ), cus AS (
        SELECT *,
               sum(x - mu) OVER (PARTITION BY event_type ORDER BY bucket
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cusum
        FROM stats
    ), ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY round(abs(cusum), 6) DESC,
                                           bucket ASC) AS rn
        FROM cus
    )
    SELECT event_type,
           CAST(n_hours AS BIGINT) AS n_hours,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS cp_bucket,
           cusum,
           abs(cusum) / nullif(sd * sqrt(CAST(n_hours AS DOUBLE)),
                               CAST(0 AS DOUBLE)) AS score
    FROM ranked WHERE rn = 1
"""

QUERIES["x7_ewma_smooth"] = x7_ewma_smooth

ORACLES["x7_ewma_smooth"] = """
    WITH seq AS (
        SELECT user_id,
               list(value ORDER BY ts, event_id) AS vals,
               CAST(count(*) AS BIGINT) AS n_events,
               avg(value) AS mean_value
        FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           vals[-1] AS last_value,
           mean_value,
           list_reduce(vals, (acc, x) ->
               acc * CAST(0.75 AS DOUBLE) + x * CAST(0.25 AS DOUBLE)) AS ewma,
           list_reduce(vals, (acc, x) ->
               acc * CAST(0.75 AS DOUBLE) + x * CAST(0.25 AS DOUBLE))
               - mean_value AS recency_drift
    FROM seq
"""


# ---------------------------------------------------------------------------
# X7 — SAX symbolization
# ---------------------------------------------------------------------------

SAX_FRAME_HOURS = 4
# N(0,1) quartile breakpoints for alphabet size 4 (Lin et al. DMKD'07)
SAX_BREAKS = (-0.6745, 0.0, 0.6745)


def x7_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (Lin, Keogh et al.: Symbolic Aggregate
    approXimation) of the hourly event-rate series: z-normalize per type,
    PAA-average into 4-hour frames, map each frame to one of 4 symbols at
    the N(0,1) quartile breakpoints, and emit the per-day SAX WORD — the
    representation behind motif discovery, series indexing, and cheap
    whole-day shape comparison ('abdd' = quiet morning, hot evening).

    Exactness: frame means and the per-type mean are exact integer-sum
    divisions; only the stddev carries cross-engine ulps, so the symbol
    decision is made on the 6-dp-ROUNDED z (round-before-bucket, CLAUDE.md
    rule 3). A degenerate constant series (sd = 0 -> NULL z) maps to '?'
    explicitly rather than falling through the CASE.

    Shape: one rollup aggregate, a 5-row per-type stats aggregate
    broadcast back, one (type, day, frame) aggregate and one (type, day)
    word aggregate — rows ∝ types x hours throughout."""
    events = load_table(spark, sf_dir, "events")
    dense = _dense_hourly_counts(events)
    stats = dense.groupBy("event_type").agg(
        (F.sum("x") / F.count(F.lit(1))).alias("mu"),
        F.stddev_samp("x").alias("sd"),
    )
    frames = dense.groupBy(
        "event_type",
        F.date_trunc("day", "bucket").alias("day"),
        F.floor(F.hour("bucket") / F.lit(SAX_FRAME_HOURS)).cast("int").alias("frame"),
    ).agg((F.sum("x") / F.count(F.lit(1))).alias("fm"))
    z6 = F.round(
        (F.col("fm") - F.col("mu")) / F.nullif(F.col("sd"), F.lit(0.0)), 6
    )
    lo, mid, hi = SAX_BREAKS
    sym = (
        F.when(z6.isNull(), F.lit("?"))
        .when(z6 < F.lit(lo), F.lit("a"))
        .when(z6 < F.lit(mid), F.lit("b"))
        .when(z6 < F.lit(hi), F.lit("c"))
        .otherwise(F.lit("d"))
    )
    syms = frames.join(stats, "event_type").select(
        "event_type", "day", "frame", sym.alias("sym")
    )
    return syms.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("frame", "sym"))),
                lambda s: s["sym"],
            ),
        ).alias("sax_word"),
    ).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_frames",
        "sax_word",
    )


QUERIES["x7_sax_symbols"] = x7_sax_symbols

ORACLES["x7_sax_symbols"] = f"""
    WITH {_DENSE_SQL}
    , stats AS (
        SELECT event_type, sum(x) / count(*) AS mu, stddev_samp(x) AS sd
        FROM dense GROUP BY 1
    ), frames AS (
        SELECT event_type, date_trunc('day', bucket) AS day,
               CAST(hour(bucket) // {SAX_FRAME_HOURS} AS INT) AS frame,
               sum(x) / count(*) AS fm
        FROM dense GROUP BY 1, 2, 3
    ), syms AS (
        SELECT f.event_type, f.day, f.frame,
               CASE WHEN z IS NULL THEN '?'
                    WHEN z < CAST({SAX_BREAKS[0]} AS DOUBLE) THEN 'a'
                    WHEN z < CAST({SAX_BREAKS[1]} AS DOUBLE) THEN 'b'
                    WHEN z < CAST({SAX_BREAKS[2]} AS DOUBLE) THEN 'c'
                    ELSE 'd' END AS sym
        FROM (
            SELECT f.*, round((f.fm - s.mu)
                              / nullif(s.sd, CAST(0 AS DOUBLE)), 6) AS z
            FROM frames f JOIN stats s USING (event_type)
        ) f
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_frames,
           string_agg(sym, '' ORDER BY frame) AS sax_word
    FROM syms GROUP BY event_type, day
"""


# ---------------------------------------------------------------------------
# X7 — LTTB downsampling and Theil-Sen robust trend
# ---------------------------------------------------------------------------

LTTB_BUCKET_HOURS = 6


def x7_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) of
    the hourly rate series, in its PARALLEL variant: each 6-hour bucket
    keeps the point maximizing the triangle area against the NEIGHBOR
    BUCKETS' mean points (the strictly-sequential original anchors on the
    previously-selected point — a loop-carried dependency no engine can
    parallelize; anchoring on bucket means is the standard distributed
    approximation and what chart servers actually ship). First/last
    buckets keep their first/last point (LTTB's endpoint rule).

    Exactness: timestamps enter as exact integer epoch-hours and counts as
    exact integers, so bucket means (integer-sum divisions) and the 2x
    triangle areas (products/differences of identically-rounded doubles)
    are bit-identical across engines; the argmax still ranks on the 6-dp
    round with a timestamp tie-break (house ordering rule). Endpoint
    buckets select via a sign trick on the same score column (-t / +t)
    so one window pass handles all three cases.

    Shape: one rollup, one bucket-mean aggregate with lag/lead anchors
    (rows ∝ buckets), one join back and one per-bucket rank — rows ∝
    types x hours throughout, independent of event count."""
    events = load_table(spark, sf_dir, "events")
    dense = _dense_hourly_counts(events)
    pts = dense.select(
        "event_type",
        "bucket",
        (F.unix_micros(F.col("bucket").cast("timestamp"))
         / F.lit(3_600_000_000)).cast("long").alias("t"),
        "x",
    )
    wt = Window.partitionBy("event_type")
    pts = pts.withColumn(
        "bid",
        F.floor((F.col("t") - F.min("t").over(wt)) / F.lit(LTTB_BUCKET_HOURS))
        .cast("long"),
    )
    means = pts.groupBy("event_type", "bid").agg(
        (F.sum("t") / F.count(F.lit(1))).alias("mt"),
        (F.sum("x") / F.count(F.lit(1))).alias("mx"),
    )
    wb = Window.partitionBy("event_type").orderBy("bid")
    anchors = means.select(
        "event_type",
        "bid",
        F.lag("mt", 1).over(wb).alias("pt"),
        F.lag("mx", 1).over(wb).alias("px"),
        F.lead("mt", 1).over(wb).alias("nt"),
        F.lead("mx", 1).over(wb).alias("nx"),
    )
    j = pts.join(anchors, ["event_type", "bid"])
    area = F.abs(
        (F.col("t").cast("double") - F.col("pt")) * (F.col("nx") - F.col("px"))
        - (F.col("nt") - F.col("pt")) * (F.col("x") - F.col("px"))
    )
    score = (
        F.when(F.col("pt").isNull(), -F.col("t").cast("double"))
        .when(F.col("nt").isNull(), F.col("t").cast("double"))
        .otherwise(F.round(area, 6))
    )
    wr = Window.partitionBy("event_type", "bid").orderBy(
        score.desc(), F.col("t").asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("bid").alias("bucket_id"),
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("sel_bucket"),
            "x",
        )
    )


QUERIES["x7_lttb_downsample"] = x7_lttb_downsample

ORACLES["x7_lttb_downsample"] = f"""
    WITH {_DENSE_SQL}
    , pts0 AS (
        SELECT event_type, bucket,
               CAST(epoch_us(bucket) / 3600000000 AS BIGINT) AS t, x
        FROM dense
    ), pts AS (
        SELECT *,
               CAST(floor((t - min(t) OVER (PARTITION BY event_type))
                          / CAST({LTTB_BUCKET_HOURS} AS DOUBLE)) AS BIGINT) AS bid
        FROM pts0
    ), means AS (
        SELECT event_type, bid,
               sum(t) / count(*) AS mt, sum(x) / count(*) AS mx
        FROM pts GROUP BY 1, 2
    ), anchors AS (
        SELECT event_type, bid,
               lag(mt, 1) OVER w AS pt, lag(mx, 1) OVER w AS px,
               lead(mt, 1) OVER w AS nt, lead(mx, 1) OVER w AS nx
        FROM means
        WINDOW w AS (PARTITION BY event_type ORDER BY bid)
    ), scored AS (
        SELECT p.event_type, p.bid, p.bucket, p.t, p.x,
               CASE WHEN a.pt IS NULL THEN -CAST(p.t AS DOUBLE)
                    WHEN a.nt IS NULL THEN CAST(p.t AS DOUBLE)
                    ELSE round(abs((CAST(p.t AS DOUBLE) - a.pt) * (a.nx - a.px)
                               - (a.nt - a.pt) * (p.x - a.px)), 6)
               END AS score
        FROM pts p JOIN anchors a USING (event_type, bid)
    ), ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, bid
                                  ORDER BY score DESC, t ASC) AS rn
        FROM scored
    )
    SELECT event_type, bid AS bucket_id,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS sel_bucket, x
    FROM ranked WHERE rn = 1
"""


def x7_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimation per event type over the hourly
    rate series: slope = MEDIAN of all pairwise slopes (x_j - x_i)/(t_j -
    t_i), intercept = median of the per-point residual intercepts
    x_i - slope * t_i. Breakdown point ~29% — the trend line a few burst
    hours cannot drag, unlike the OLS fit (x3_zipf_fit's regr_* family).

    The medians are POSITIONAL, not percentile functions: sort the pair
    slopes on (slope, t_i, t_j) and take row (n+1)/2 via row_number — a
    fully deterministic lower median with engine-identical semantics (and
    no exact-percentile plan guard needed). Every slope is an exact
    integer-difference division, so the sort keys are bit-identical.

    Shape note: the pair self-join is O(hours^2) per type — ~260k pairs
    per type-month — but its input is the ROLLUP, so the cost is
    independent of event count; at longer horizons the standard fix is
    windowed Theil-Sen (pairs within a sliding time window), same plan
    with a range-bounded join."""
    events = load_table(spark, sf_dir, "events")
    dense = _dense_hourly_counts(events)
    pts = dense.select(
        "event_type",
        (F.unix_micros(F.col("bucket").cast("timestamp"))
         / F.lit(3_600_000_000)).cast("long").alias("t"),
        "x",
    )
    a = pts.select("event_type", F.col("t").alias("ti"), F.col("x").alias("xi"))
    b = pts.select("event_type", F.col("t").alias("tj"), F.col("x").alias("xj"))
    pairs = a.join(b, "event_type").where(F.col("ti") < F.col("tj")).select(
        "event_type",
        "ti",
        "tj",
        (
            (F.col("xj") - F.col("xi"))
            / (F.col("tj") - F.col("ti")).cast("double")
        ).alias("slope"),
    )
    wp = Window.partitionBy("event_type")
    ws = Window.partitionBy("event_type").orderBy("slope", "ti", "tj")
    med_slope = (
        pairs.withColumn("rn", F.row_number().over(ws))
        .withColumn("np", F.count(F.lit(1)).over(wp))
        .where(F.col("rn") == F.floor((F.col("np") + F.lit(1)) / F.lit(2)))
        .select("event_type", F.col("slope").alias("m"), F.col("np").alias("n_pairs"))
    )
    resid = pts.join(med_slope, "event_type").select(
        "event_type",
        "n_pairs",
        "t",
        (F.col("x") - F.col("m") * F.col("t").cast("double")).alias("b0"),
        F.col("m"),
    )
    wi = Window.partitionBy("event_type").orderBy("b0", "t")
    return (
        resid.withColumn("rn", F.row_number().over(wi))
        .withColumn("nh", F.count(F.lit(1)).over(wp))
        .where(F.col("rn") == F.floor((F.col("nh") + F.lit(1)) / F.lit(2)))
        .select(
            "event_type",
            F.col("nh").cast("long").alias("n_hours"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("m").alias("slope"),
            F.col("b0").alias("intercept"),
        )
    )


QUERIES["x7_theil_sen"] = x7_theil_sen

ORACLES["x7_theil_sen"] = f"""
    WITH {_DENSE_SQL}
    , pts AS (
        SELECT event_type,
               CAST(epoch_us(bucket) / 3600000000 AS BIGINT) AS t, x
        FROM dense
    ), pairs AS (
        SELECT a.event_type, a.t AS ti, b.t AS tj,
               (b.x - a.x) / CAST(b.t - a.t AS DOUBLE) AS slope
        FROM pts a JOIN pts b
          ON a.event_type = b.event_type AND a.t < b.t
    ), ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY slope, ti, tj) AS rn,
               count(*) OVER (PARTITION BY event_type) AS np
        FROM pairs
    ), med AS (
        SELECT event_type, slope AS m, np AS n_pairs
        FROM ranked WHERE rn = (np + 1) // 2
    ), resid AS (
        SELECT p.event_type, med.n_pairs, p.t,
               p.x - med.m * CAST(p.t AS DOUBLE) AS b0, med.m
        FROM pts p JOIN med USING (event_type)
    ), ranked2 AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY b0, t) AS rn,
               count(*) OVER (PARTITION BY event_type) AS nh
        FROM resid
    )
    SELECT event_type,
           CAST(nh AS BIGINT) AS n_hours,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           m AS slope,
           b0 AS intercept
    FROM ranked2 WHERE rn = (nh + 1) // 2
"""


def x7_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness profile of the hourly event rate per type: Fano factor
    var/mean (1 = Poisson, >1 = overdispersed/bursty), the Goh-Barabasi
    burstiness index (sd - mean)/(sd + mean) in [-1, 1], and the
    peak-to-mean ratio — the three numbers capacity planning reads before
    trusting an average. mu and max are exact integer-derived values; only
    the sd/var aggregates carry summation-order ulps (absorbed by the
    verifier's 9-significant-digit normalization). One rollup + one
    per-type aggregate; rows ∝ types x hours."""
    events = load_table(spark, sf_dir, "events")
    dense = _dense_hourly_counts(events)
    agg = dense.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        (F.sum("x") / F.count(F.lit(1))).alias("mu"),
        F.stddev_samp("x").alias("sd"),
        F.var_samp("x").alias("var"),
        F.max("x").alias("peak"),
    )
    return agg.select(
        "event_type",
        "n_hours",
        "mu",
        "sd",
        (F.col("var") / F.nullif(F.col("mu"), F.lit(0.0))).alias("fano"),
        (
            (F.col("sd") - F.col("mu"))
            / F.nullif(F.col("sd") + F.col("mu"), F.lit(0.0))
        ).alias("burstiness"),
        (F.col("peak") / F.nullif(F.col("mu"), F.lit(0.0))).alias("peak_ratio"),
    )


QUERIES["x7_burstiness"] = x7_burstiness

ORACLES["x7_burstiness"] = f"""
    WITH {_DENSE_SQL}
    , agg AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_hours,
               sum(x) / count(*) AS mu,
               stddev_samp(x) AS sd,
               var_samp(x) AS var,
               max(x) AS peak
        FROM dense GROUP BY 1
    )
    SELECT event_type, n_hours, mu, sd,
           var / nullif(mu, CAST(0 AS DOUBLE)) AS fano,
           (sd - mu) / nullif(sd + mu, CAST(0 AS DOUBLE)) AS burstiness,
           peak / nullif(mu, CAST(0 AS DOUBLE)) AS peak_ratio
    FROM agg
"""


SEAS_ANOM_TOPN = 5


def x7_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted anomaly shortlist: per type, the top-5 hours by
    |residual z-score| AFTER the trend and hour-of-day seasonal components
    are removed (composing x7_seasonal_decompose) — the alert page that
    neither re-fires every rush hour (seasonal handles that) nor misses a
    genuinely off-cycle spike; `anomalous` marks |z| > 3. The top-N form
    (not a threshold filter) keeps the result non-degenerate on quiet
    corpora while staying deterministic: rank on 6-dp-rounded |z| with
    bucket tie-break, flag decided on the same rounded value.

    Shape: the decompose plan plus one per-type stddev window and one
    per-type rank — rows ∝ types x hours throughout. Oracle nests the full
    decompose SQL as a CTE (the composed-pipeline oracle pattern)."""
    base = x7_seasonal_decompose(spark, sf_dir).where(
        F.col("residual").isNotNull()
    )
    wp = Window.partitionBy("event_type")
    sd = F.stddev_samp("residual").over(wp)
    z = F.col("residual") / F.nullif(sd, F.lit(0.0))
    scored = base.select(
        "event_type", "bucket", "x", "trend", "seasonal", "residual",
        z.alias("resid_z"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.round(F.abs("resid_z"), 6).desc(), F.col("bucket").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= SEAS_ANOM_TOPN)
        .select(
            "event_type",
            "bucket",
            "x",
            "residual",
            "resid_z",
            (F.abs(F.round(F.col("resid_z"), 6)) > F.lit(3.0)).alias("anomalous"),
        )
    )


QUERIES["x7_seasonal_anomaly"] = x7_seasonal_anomaly

ORACLES["x7_seasonal_anomaly"] = f"""
    WITH base AS ({ORACLES["x7_seasonal_decompose"]}),
    nn AS (
        SELECT * FROM base WHERE residual IS NOT NULL
    ), scored AS (
        SELECT event_type, bucket, x, residual,
               residual / nullif(stddev_samp(residual)
                   OVER (PARTITION BY event_type), CAST(0 AS DOUBLE)) AS resid_z
        FROM nn
    ), ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY round(abs(resid_z), 6) DESC,
                                           bucket ASC) AS rn
        FROM scored
    )
    SELECT event_type, bucket, x, residual, resid_z,
           abs(round(resid_z, 6)) > CAST(3 AS DOUBLE) AS anomalous
    FROM ranked WHERE rn <= {SEAS_ANOM_TOPN}
"""


HURST_SCALES = (8, 16, 32, 64)


def x7_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the hourly event-rate series per type by rescaled-
    range (R/S) analysis: split the dense series into full blocks of size
    s in {8,16,32,64}; per block compute the range of cumulative
    mean-deviations R and the population stddev S; H is the log2-log2 OLS
    slope of mean(R/S) on s. H ~ 0.5 = memoryless, > 0.5 = long-range
    persistence (load trends that compound — capacity planning cares),
    < 0.5 = mean-reverting. (Z ranges over t >= 1; the Z_0 = 0 anchor
    convention differs across texts and is fixed identically here and in
    the oracle.)

    Exactness: block means are exact integer-sum divisions; the cumulative
    deviations add bit-identical terms in frame order, so R is
    bit-identical; only S and the scale means carry summation-order ulps
    (9-digit normalized); the OLS is regr_slope over 4 points (the
    x3_zipf_fit precedent). Shape: one rollup, a 4x explode, two window
    passes and two aggregates — rows ∝ 4 x types x hours."""
    events = load_table(spark, sf_dir, "events")
    dense = _dense_hourly_counts(events)
    wt = Window.partitionBy("event_type").orderBy("bucket")
    idx = dense.select(
        "event_type", "x", (F.row_number().over(wt) - 1).alias("rn")
    )
    scaled = idx.select(
        "event_type", "x", "rn",
        F.explode(F.array(*[F.lit(s) for s in HURST_SCALES])).alias("s"),
    ).withColumn("blk", F.floor(F.col("rn") / F.col("s")).cast("long"))
    wb = Window.partitionBy("event_type", "s", "blk")
    step1 = scaled.select(
        "event_type", "s", "blk", "rn", "x",
        (F.sum("x").over(wb) / F.count(F.lit(1)).over(wb)).alias("m"),
        F.count(F.lit(1)).over(wb).alias("bs"),
    ).where(F.col("bs") == F.col("s"))  # full blocks only
    wz = (
        Window.partitionBy("event_type", "s", "blk")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    step2 = step1.select(
        "event_type", "s", "blk",
        F.sum(F.col("x") - F.col("m")).over(wz).alias("z"),
        ((F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))).alias("sq"),
    )
    blocks = step2.groupBy("event_type", "s", "blk").agg(
        (F.max("z") - F.min("z")).alias("r"),
        F.sqrt(F.sum("sq") / F.col("s").cast("double")).alias("sd"),
    ).select(
        "event_type", "s",
        (F.col("r") / F.nullif(F.col("sd"), F.lit(0.0))).alias("rs"),
    )
    per_scale = blocks.groupBy("event_type", "s").agg(
        F.avg("rs").alias("mean_rs"),
        F.count("rs").cast("long").alias("n_blocks"),
    )
    return per_scale.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_scales"),
        F.sum("n_blocks").cast("long").alias("n_blocks"),
        F.regr_slope(
            F.log2(F.col("mean_rs")), F.log2(F.col("s").cast("double"))
        ).alias("hurst"),
        F.regr_intercept(
            F.log2(F.col("mean_rs")), F.log2(F.col("s").cast("double"))
        ).alias("log2_c"),
    )


QUERIES["x7_hurst"] = x7_hurst

ORACLES["x7_hurst"] = f"""
    WITH {_DENSE_SQL}
    , idx AS (
        SELECT event_type, x,
               row_number() OVER (PARTITION BY event_type ORDER BY bucket) - 1
                   AS rn
        FROM dense
    ), scaled AS (
        SELECT event_type, x, rn,
               unnest([{', '.join(str(s) for s in HURST_SCALES)}]) AS s
        FROM idx
    ), blocked AS (
        SELECT *, CAST(floor(rn / CAST(s AS DOUBLE)) AS BIGINT) AS blk
        FROM scaled
    ), step1 AS (
        SELECT event_type, s, blk, rn, x,
               sum(x) OVER w / count(*) OVER w AS m,
               count(*) OVER w AS bs
        FROM blocked
        WINDOW w AS (PARTITION BY event_type, s, blk)
        QUALIFY bs = s
    ), step2 AS (
        SELECT event_type, s, blk,
               sum(x - m) OVER (PARTITION BY event_type, s, blk ORDER BY rn
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS z,
               (x - m) * (x - m) AS sq
        FROM step1
    ), blocks AS (
        SELECT event_type, s,
               (max(z) - min(z))
                   / nullif(sqrt(sum(sq) / CAST(s AS DOUBLE)),
                            CAST(0 AS DOUBLE)) AS rs
        FROM step2 GROUP BY event_type, s, blk
    ), per_scale AS (
        SELECT event_type, s, avg(rs) AS mean_rs,
               CAST(count(rs) AS BIGINT) AS n_blocks
        FROM blocks GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_scales,
           CAST(sum(n_blocks) AS BIGINT) AS n_blocks,
           regr_slope(log2(mean_rs), log2(CAST(s AS DOUBLE))) AS hurst,
           regr_intercept(log2(mean_rs), log2(CAST(s AS DOUBLE))) AS log2_c
    FROM per_scale GROUP BY event_type
"""


CCF_MAX_LAG = 6


def x7_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between every PAIR of event types' hourly
    rate series at lags -6..+6 — 'do errors follow purchases, and by how
    many hours?'. ccf(a, b, L) correlates a at hour t with b at hour t-L
    under the standard full-series normalization
    sum(xa_c * xb_c,shifted) / sqrt(ssq_a * ssq_b), so the function is
    comparable across lags (the ACF's cross cousin — ccf(a, a, 0) = 1).
    Only a < b pairs are emitted: ccf(b, a, L) = ccf(a, b, -L).

    Exactness: means are exact integer-sum divisions, so centered values
    are bit-identical; the lag alignment joins on exact integer epoch-hour
    keys; numerators/ssqs carry summation-order ulps (9-digit normalized).

    Shape: one rollup, a 13x lag explode on one side, one (type, hour)
    equi-join, one (pair, lag) aggregate and a broadcast of the 5-row
    per-type ssq table — rows ∝ 13 x types x hours."""
    events = load_table(spark, sf_dir, "events")
    dense = _dense_hourly_counts(events)
    wp = Window.partitionBy("event_type")
    c = dense.select(
        "event_type",
        (F.unix_micros(F.col("bucket").cast("timestamp"))
         / F.lit(3_600_000_000)).cast("long").alias("h"),
        (F.col("x") - F.sum("x").over(wp) / F.count(F.lit(1)).over(wp)).alias("xc"),
    )
    ssq = c.groupBy("event_type").agg(F.sum(F.col("xc") * F.col("xc")).alias("ssq"))
    lags = list(range(-CCF_MAX_LAG, CCF_MAX_LAG + 1))
    a = c.select(
        F.col("event_type").alias("ta"),
        "h",
        F.col("xc").alias("xa"),
        F.explode(F.array(*[F.lit(v) for v in lags])).alias("lag"),
    ).withColumn("hb", F.col("h") - F.col("lag"))
    b = c.select(F.col("event_type").alias("tb"), F.col("h").alias("hb"),
                 F.col("xc").alias("xb"))
    j = a.join(b, "hb").where(F.col("ta") < F.col("tb"))
    num = j.groupBy("ta", "tb", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap"),
        F.sum(F.col("xa") * F.col("xb")).alias("num"),
    )
    return (
        num.join(F.broadcast(ssq.select(F.col("event_type").alias("ta"),
                                        F.col("ssq").alias("sa"))), "ta")
        .join(F.broadcast(ssq.select(F.col("event_type").alias("tb"),
                                     F.col("ssq").alias("sb"))), "tb")
        .select(
            "ta", "tb",
            F.col("lag").cast("int").alias("lag"),
            "n_overlap",
            (F.col("num") / F.nullif(F.sqrt(F.col("sa") * F.col("sb")),
                                     F.lit(0.0))).alias("ccf"),
        )
    )


QUERIES["x7_ccf"] = x7_ccf

ORACLES["x7_ccf"] = f"""
    WITH {_DENSE_SQL}
    , c AS (
        SELECT event_type,
               CAST(epoch_us(bucket) / 3600000000 AS BIGINT) AS h,
               x - (sum(x) OVER (PARTITION BY event_type)
                    / count(*) OVER (PARTITION BY event_type)) AS xc
        FROM dense
    ), ssq AS (
        SELECT event_type, sum(xc * xc) AS ssq FROM c GROUP BY 1
    ), a AS (
        SELECT event_type AS ta, h, xc AS xa,
               unnest([{', '.join(str(v) for v in range(-CCF_MAX_LAG, CCF_MAX_LAG + 1))}]) AS lag
        FROM c
    ), j AS (
        SELECT a.ta, b.event_type AS tb, a.lag, a.xa, b.xc AS xb
        FROM a JOIN c b ON b.h = a.h - a.lag AND a.ta < b.event_type
    ), num AS (
        SELECT ta, tb, lag,
               CAST(count(*) AS BIGINT) AS n_overlap,
               sum(xa * xb) AS num
        FROM j GROUP BY 1, 2, 3
    )
    SELECT num.ta, num.tb, CAST(num.lag AS INT) AS lag, num.n_overlap,
           num.num / nullif(sqrt(sa.ssq * sb.ssq), CAST(0 AS DOUBLE)) AS ccf
    FROM num
    JOIN ssq sa ON num.ta = sa.event_type
    JOIN ssq sb ON num.tb = sb.event_type
"""


LJUNG_CRIT_DF6 = 12.591587  # chi-square 0.95 quantile at 6 dof


def x7_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test per event type, composed directly from
    x7_acf's output: Q = n(n+2) * sum_k acf_k^2/(n-k) over the 6 computed
    lags — the 'is the hourly rate white noise at all?' gate run before
    fitting any AR model (x7_acf shows WHERE the correlation is, Q says
    whether it is jointly significant). n recovers exactly as
    n_pairs + lag and (n-k) IS n_pairs, so the statistic is a pure
    derivation over the 30-row ACF result; the rejection flag compares
    the 6-dp-rounded Q against the fixed chi-square(6) 0.95 critical
    value and is NULL when fewer than 6 lags were computable.

    Oracle nests the full ACF SQL as a CTE (composed-pipeline pattern)."""
    acf = x7_acf(spark, sf_dir).where(F.col("n_pairs") > 0)
    n = (F.col("n_pairs") + F.col("lag")).cast("double")
    term = (F.col("acf") * F.col("acf")) / F.col("n_pairs").cast("double")
    agg = acf.groupBy("event_type").agg(
        F.max(n).alias("nn"),
        F.count(F.lit(1)).cast("long").alias("n_lags"),
        F.sum(term).alias("s"),
    )
    q = F.col("nn") * (F.col("nn") + F.lit(2.0)) * F.col("s")
    return agg.select(
        "event_type",
        F.col("nn").cast("long").alias("n_hours"),
        "n_lags",
        q.alias("q_stat"),
        F.when(
            F.col("n_lags") == 6,
            F.round(q, 6) > F.lit(LJUNG_CRIT_DF6),
        ).alias("white_noise_rejected"),
    )


QUERIES["x7_ljung_box"] = x7_ljung_box

ORACLES["x7_ljung_box"] = f"""
    WITH base AS ({ORACLES["x7_acf"]}),
    nn AS (
        SELECT event_type,
               CAST(n_pairs + lag AS DOUBLE) AS n,
               CAST(n_pairs AS DOUBLE) AS nk,
               acf
        FROM base WHERE n_pairs > 0
    ), agg AS (
        SELECT event_type, max(n) AS n,
               CAST(count(*) AS BIGINT) AS n_lags,
               sum(acf * acf / nk) AS s
        FROM nn GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_hours,
           n_lags,
           n * (n + CAST(2 AS DOUBLE)) * s AS q_stat,
           CASE WHEN n_lags = 6
                THEN round(n * (n + CAST(2 AS DOUBLE)) * s, 6)
                     > CAST({LJUNG_CRIT_DF6} AS DOUBLE)
           END AS white_noise_rejected
    FROM agg
"""


PEAK_Z = 2.0


def x7_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak detection over the dense hourly rate series: an hour is a peak
    if it is a STRICT local maximum (higher than both neighbor hours) AND
    its z-score clears PEAK_Z — the load-spike report an on-call pipeline
    owner reads next to x7_rate_anomaly's rolling form (this one uses the
    full-series mean, so recurring daily crests rank against the whole
    window, not a trailing one).

    Exactness: mean and stddev derive from EXACT integer window sums
    (sx, sxx over integer-valued doubles — no Welford single-pass state,
    which accumulates engine-specific ulps): var = (sxx - sx*sx/n)/(n-1)
    is one fixed-shape double expression, so z is bit-identical on both
    engines, and the peak decision compares round(z, 6) (round-before-
    decision, CLAUDE.md rule 3). Boundary hours (no neighbor) never
    qualify.

    Shape: the shared types x hours rollup (_dense_hourly_counts), one
    per-type ordered window for lag/lead, per-type window sums — all
    PARTITIONED by event_type, rollup-bounded (SCALING.md family note)."""
    events = load_table(spark, sf_dir, "events")
    dense = _dense_hourly_counts(events)
    wp = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("bucket")
    n = F.count(F.lit(1)).over(wp).cast("double")
    sx = F.sum("x").over(wp)
    sxx = F.sum(F.col("x") * F.col("x")).over(wp)
    mean = sx / n
    var = (sxx - sx * sx / n) / (n - F.lit(1.0))
    sd = F.sqrt(var)
    aug = dense.select(
        "event_type",
        "bucket",
        "x",
        F.lag("x").over(wo).alias("xp"),
        F.lead("x").over(wo).alias("xn"),
        mean.alias("mu"),
        sd.alias("sd"),
    )
    z = F.round((F.col("x") - F.col("mu")) / F.col("sd"), 6)
    return (
        aug.filter(
            F.col("xp").isNotNull()
            & F.col("xn").isNotNull()
            & (F.col("x") > F.col("xp"))
            & (F.col("x") > F.col("xn"))
            & (F.col("sd") > 0)
        )
        .select(
            "event_type",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            F.col("x").cast("long").alias("n_events"),
            F.col("mu").alias("series_mean"),
            z.alias("zscore"),
        )
        .filter(F.col("zscore") >= F.lit(PEAK_Z))
    )


QUERIES["x7_peak_detection"] = x7_peak_detection

ORACLES["x7_peak_detection"] = f"""
    WITH {_DENSE_SQL}
    , aug AS (
        SELECT event_type, bucket, x,
               lag(x) OVER w AS xp,
               lead(x) OVER w AS xn,
               sum(x) OVER p / CAST(count(*) OVER p AS DOUBLE) AS mu,
               sqrt((sum(x * x) OVER p
                     - sum(x) OVER p * sum(x) OVER p
                       / CAST(count(*) OVER p AS DOUBLE))
                    / (CAST(count(*) OVER p AS DOUBLE) - CAST(1 AS DOUBLE)))
                   AS sd
        FROM dense
        WINDOW w AS (PARTITION BY event_type ORDER BY bucket),
               p AS (PARTITION BY event_type)
    )
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           CAST(x AS BIGINT) AS n_events,
           mu AS series_mean,
           round((x - mu) / sd, 6) AS zscore
    FROM aug
    WHERE xp IS NOT NULL AND xn IS NOT NULL
      AND x > xp AND x > xn AND sd > 0
      AND round((x - mu) / sd, 6) >= CAST({PEAK_Z} AS DOUBLE)
"""


HOLT_ALPHA = 0.25  # level gain;  binary-exact (0.25/0.75)
HOLT_BETA = 0.25   # trend gain


def x7_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double-exponential) smoothing per event type over
    the dense hourly series — the one-step-ahead forecaster a rate
    dashboard runs where plain EWMA (x7_ewma_smooth) lags any trending
    series by construction: Holt tracks level AND trend
    (l_t = a*x_t + (1-a)(l+b); b_t = g(l_t - l) + (1-g) b, classic init
    l0 = x_0, b0 = x_1 - x_0) and forecasts l + b.

    Exactness: the recursion is an ORDERED LIST FOLD with a STRUCT
    accumulator on the Spark side (`aggregate` with an explicit (l, b)
    init; l_t inlined twice inside b_t — no lambda-local bindings). The
    oracle does NOT use DuckDB's reduce(): v1.0.0 evaluates a
    struct-lambda's fields SEQUENTIALLY with in-place update (a later
    field sees the earlier field's NEW value — measured, see the oracle
    comment), unlike Spark's snapshot semantics — so the oracle steps the
    same arithmetic as a recursive CTE over the value index, which has
    plain column semantics. Identical expressions in identical order;
    the oracle checks the exact float. Gains 0.25/0.75 are binary-exact
    literals.

    Scale shape: the types x hours rollup collected to one value array
    per type (rollup-bounded family, SCALING.md note) — one groupBy, one
    per-type fold; never raw events."""
    events = load_table(spark, sf_dir, "events")
    dense = _dense_hourly_counts(events)
    per = (
        dense.groupBy("event_type")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("bucket", "x"))
            ).alias("seq"),
        )
        .select(
            "event_type",
            F.transform("seq", lambda s: s["x"]).alias("vals"),
        )
        .filter(F.size("vals") >= 2)
    )
    n = F.size("vals")
    a, ac = F.lit(HOLT_ALPHA), F.lit(1.0 - HOLT_ALPHA)
    g, gc = F.lit(HOLT_BETA), F.lit(1.0 - HOLT_BETA)
    init = F.struct(
        F.element_at("vals", 1).alias("l"),
        (F.element_at("vals", 2) - F.element_at("vals", 1)).alias("b"),
    )
    fold = F.aggregate(
        F.slice("vals", 3, n - 2),
        init,
        lambda acc, x: F.struct(
            (a * x + ac * (acc["l"] + acc["b"])).alias("l"),
            (
                g * ((a * x + ac * (acc["l"] + acc["b"])) - acc["l"])
                + gc * acc["b"]
            ).alias("b"),
        ),
    )
    return per.select(
        "event_type",
        n.cast("long").alias("n_hours"),
        F.element_at("vals", -1).alias("last_value"),
        fold["l"].alias("level"),
        fold["b"].alias("trend"),
        (fold["l"] + fold["b"]).alias("forecast_next"),
    )


QUERIES["x7_holt_linear"] = x7_holt_linear

ORACLES["x7_holt_linear"] = f"""
    WITH RECURSIVE {_DENSE_SQL}
    , per AS (
        SELECT event_type,
               list_transform(
                   list_sort(list(
                       {{'bucket': bucket, 'x': x}})),
                   s -> s.x) AS vals
        FROM dense GROUP BY event_type
    ), ok AS (
        SELECT event_type, vals FROM per WHERE len(vals) >= 2
    ), rec AS (
        -- left fold as an index recursion: DuckDB v1.0.0's reduce() with a
        -- struct accumulator updates fields SEQUENTIALLY (a later field
        -- sees the earlier field's NEW value), unlike Spark's snapshot
        -- lambda semantics — a recursive CTE steps the (l, b) pair with
        -- plain column references, no lambda quirk
        SELECT event_type, vals, 2 AS i,
               vals[1] AS l, vals[2] - vals[1] AS b
        FROM ok
        UNION ALL
        SELECT event_type, vals, i + 1,
               CAST({HOLT_ALPHA} AS DOUBLE) * vals[i + 1]
                   + CAST({1.0 - HOLT_ALPHA} AS DOUBLE) * (l + b),
               CAST({HOLT_BETA} AS DOUBLE)
                   * ((CAST({HOLT_ALPHA} AS DOUBLE) * vals[i + 1]
                       + CAST({1.0 - HOLT_ALPHA} AS DOUBLE) * (l + b)) - l)
                   + CAST({1.0 - HOLT_BETA} AS DOUBLE) * b
        FROM rec WHERE i < len(vals)
    )
    SELECT event_type,
           CAST(len(vals) AS BIGINT) AS n_hours,
           vals[-1] AS last_value,
           l AS level,
           b AS trend,
           l + b AS forecast_next
    FROM rec WHERE i = len(vals)
"""


MAD_Z_CUT = 3.5      # Iglewicz-Hoaglin modified z-score cutoff
MAD_SCALE = 0.6745   # standard-normal consistency constant


def x7_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection on the hourly rate series: the modified
    z-score 0.6745*(x - median)/MAD with the Iglewicz-Hoaglin 3.5 cutoff
    — the outlier screen that, unlike x7_peak_detection's mean/sd z, is
    itself immune to the outliers it hunts (one crazy hour inflates sd
    and hides its neighbors; the median/MAD pair doesn't move).

    Exactness: median and MAD are EXACT interpolated percentiles over the
    rollup-bounded per-type series (~10^4 rows per type-year — the
    documented EXACT-percentile-at-rollup-scale exception, same contract
    as x6_outlier_profile's Tukey fences); integer-valued inputs make the
    interpolated midpoints exact halves, and the modified z rounds to
    6 dp BEFORE the cutoff decision (CLAUDE.md rule 3).

    Shape: the shared types x hours rollup, one per-type exact-percentile
    aggregate, one broadcast join back, one filter. At 100 TB swap the
    exact percentile for approx_percentile the way the dataset-card
    family documents."""
    events = load_table(spark, sf_dir, "events")
    dense = _dense_hourly_counts(events)
    med = dense.groupBy("event_type").agg(
        F.expr("percentile(x, 0.5)").alias("med")
    )
    dev = dense.join(F.broadcast(med), "event_type").select(
        "event_type", "bucket", "x", "med",
        F.abs(F.col("x") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    z = F.round(
        F.lit(MAD_SCALE) * (F.col("x") - F.col("med")) / F.col("mad"), 6
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .select(
            "event_type",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            F.col("x").cast("long").alias("n_events"),
            "med",
            "mad",
            z.alias("robust_z"),
        )
        .filter(F.abs(F.col("robust_z")) >= F.lit(MAD_Z_CUT))
    )


QUERIES["x7_mad_anomaly"] = x7_mad_anomaly

ORACLES["x7_mad_anomaly"] = f"""
    WITH {_DENSE_SQL}
    , med AS (
        SELECT event_type, quantile_cont(x, 0.5) AS med
        FROM dense GROUP BY event_type
    ), dev AS (
        SELECT d.event_type, d.bucket, d.x, m.med, abs(d.x - m.med) AS adev
        FROM dense d JOIN med m ON d.event_type = m.event_type
    ), mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT dev.event_type,
           strftime(dev.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           CAST(dev.x AS BIGINT) AS n_events,
           dev.med,
           mad.mad,
           round(CAST({MAD_SCALE} AS DOUBLE) * (dev.x - dev.med) / mad.mad, 6)
               AS robust_z
    FROM dev JOIN mad ON dev.event_type = mad.event_type
    WHERE mad.mad > 0
      AND abs(round(CAST({MAD_SCALE} AS DOUBLE) * (dev.x - dev.med)
                    / mad.mad, 6)) >= CAST({MAD_Z_CUT} AS DOUBLE)
"""


def x7_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the candlestick rollup every
    telemetry/market feed materializes: open = first value, close =
    last, high/low = extrema, plus event count and cent-exact volume.
    First/last are decided by the deterministic (ts, event_id) total
    order (the x7_twap tie-break: event_id breaks same-microsecond
    ties), implemented as min_by/max_by over an exact composite key
    packed in decimal(38,0)/HUGEINT: unix_micros * 10^19 + event_id.
    The 10^19 multiplier strictly exceeds every non-negative int64
    (max 9.22e18), so the packing is injective over the ENTIRE id
    domain — not just ids below some per-microsecond budget (the r10
    ADVICE fix: the old 2^20 multiplier collided once event_id reached
    1048576, and uniqueness does not bound id magnitude). Epoch micros
    (~1.7e15) x 10^19 is a 35-digit product: inside decimal(38,0) and
    DuckDB HUGEINT, outside int64 — hence wide-integer space on both
    engines (the round-8 lesson class).

    Shape: ONE groupBy (event_type, hour) — map-side combined
    min/max/min_by/max_by/sum state, no window, no second shuffle; the
    rollup-bounded output (types x hours) is the frame coarser
    resolutions re-aggregate (except open/close, which re-derive from
    the packed-key extrema — documented non-mergeable the naive way).
    Volume accumulates in cent-exact BIGINT."""
    ev = load_table(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP — the NTZ->TZ cast
    # is exact under the pinned UTC session zone (x7_twap discipline)
    dec = "decimal(38,0)"
    # 10^19 > max int64: injective for every possible event_id; the
    # literal exceeds int64 so it must be born decimal, not a Python int
    id_bound = F.expr(f"CAST('{10**19}' AS {dec})")
    key = (
        F.unix_micros(F.col("ts").cast("timestamp")).cast(dec)
        * id_bound + F.col("event_id")
    )
    cents = F.round(F.col("value") * F.lit(100.0), 0).cast("long")
    return (
        ev.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            key.alias("k"), F.col("value").alias("v"), cents.alias("c"),
        )
        .groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min_by("v", "k").alias("open"),
            F.max_by("v", "k").alias("close"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.sum("c").cast("long").alias("volume_cents"),
        )
    )


QUERIES["x7_ohlc_bars"] = x7_ohlc_bars

ORACLES["x7_ohlc_bars"] = """
    SELECT event_type,
           date_trunc('hour', ts) AS hour,
           CAST(count(*) AS BIGINT) AS n,
           arg_min(value, CAST(epoch_us(ts) AS HUGEINT)
                          * CAST('10000000000000000000' AS HUGEINT)
                          + event_id) AS open,
           arg_max(value, CAST(epoch_us(ts) AS HUGEINT)
                          * CAST('10000000000000000000' AS HUGEINT)
                          + event_id) AS close,
           max(value) AS high,
           min(value) AS low,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS volume_cents
    FROM events
    GROUP BY 1, 2
"""


def x7_gap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-completeness gap profile — the 'are we missing hours of
    data' check every telemetry pipeline runs before trusting a rollup:
    per event type, the observed-hour count, the expected count over
    the type's own [first, last] span, the missing-hour count, and the
    LONGEST interior gap in hours (the outage-length readout; 0 when
    the span is dense).

    Scenario pair (the x6_srm_check discipline — at sf0.1 the hourly
    series is DENSE and a raw-only gap stat would be forever 0, the
    CLAUDE.md 12b dead-output class): scenario 'raw' profiles the
    stream as-is; scenario 'outage_sim' drops every 7th hour index
    before profiling, so the detector demonstrably fires at every SF
    (n_missing > 0, longest gap >= 1) while 'raw' reports the true
    stream.

    All integer math over hour-truncated timestamps (the x7_twap
    NTZ->UTC discipline: unix seconds are exact under the pinned UTC
    session zone, hour deltas are exact divisions of multiples of
    3600). Shape: one distinct (type, hour) aggregate (map-side
    combined — never more than types x hours rows), one
    (scenario, type)-PARTITIONED lag window over the bounded hourly
    series, one final fold. At 100 TB the rollup bound (types x hours)
    is calendar-scale, independent of event volume."""
    ev = load_table(spark, sf_dir, "events")
    obs0 = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("h"),
    ).distinct()
    hidx = F.floor(
        F.unix_timestamp(F.col("h").cast("timestamp")) / F.lit(3600)
    )
    obs = (
        obs0.withColumn("scenario", F.lit("raw"))
        .unionByName(
            obs0.filter(hidx % 7 != 0)
            .withColumn("scenario", F.lit("outage_sim"))
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("scenario", "event_type").orderBy("h")
    hsec = F.unix_timestamp(F.col("h").cast("timestamp"))
    gap = (
        (hsec - F.unix_timestamp(F.lag("h", 1).over(w).cast("timestamp")))
        / F.lit(3600) - F.lit(1)
    ).cast("long")
    per = obs.withColumn("gap", gap)
    agg = per.groupBy("scenario", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_observed"),
        F.min("h").alias("first_hour"),
        F.max("h").alias("last_hour"),
        F.max(F.coalesce(F.col("gap"), F.lit(0))).cast("long")
        .alias("longest_gap_hours"),
    )
    span = (
        (F.unix_timestamp(F.col("last_hour").cast("timestamp"))
         - F.unix_timestamp(F.col("first_hour").cast("timestamp")))
        / F.lit(3600) + F.lit(1)
    ).cast("long")
    return agg.select(
        "scenario", "event_type", "n_observed",
        span.alias("n_expected"),
        (span - F.col("n_observed")).cast("long").alias("n_missing"),
        "longest_gap_hours",
        F.date_format("first_hour", "yyyy-MM-dd HH:mm:ss")
        .alias("first_hour"),
        F.date_format("last_hour", "yyyy-MM-dd HH:mm:ss")
        .alias("last_hour"),
    )


QUERIES["x7_gap_profile"] = x7_gap_profile

ORACLES["x7_gap_profile"] = """
    WITH obs0 AS (
        SELECT DISTINCT event_type, date_trunc('hour', ts) AS h
        FROM events
    ), obs AS (
        SELECT 'raw' AS scenario, event_type, h FROM obs0
        UNION ALL
        SELECT 'outage_sim' AS scenario, event_type, h FROM obs0
        WHERE CAST(floor(epoch(h) / 3600) AS BIGINT) % 7 <> 0
    ), g AS (
        SELECT scenario, event_type, h,
               CAST((epoch(h) - epoch(lag(h) OVER (
                   PARTITION BY scenario, event_type ORDER BY h)))
                   / 3600 - 1 AS BIGINT) AS gap
        FROM obs
    ), agg AS (
        SELECT scenario, event_type,
               CAST(count(*) AS BIGINT) AS n_observed,
               min(h) AS first_hour,
               max(h) AS last_hour,
               CAST(max(coalesce(gap, 0)) AS BIGINT) AS longest_gap_hours
        FROM g GROUP BY 1, 2
    )
    SELECT scenario, event_type, n_observed,
           CAST((epoch(last_hour) - epoch(first_hour)) / 3600 + 1 AS BIGINT)
               AS n_expected,
           CAST((epoch(last_hour) - epoch(first_hour)) / 3600 + 1
                - n_observed AS BIGINT) AS n_missing,
           longest_gap_hours,
           strftime(first_hour, '%Y-%m-%d %H:%M:%S') AS first_hour,
           strftime(last_hour, '%Y-%m-%d %H:%M:%S') AS last_hour
    FROM agg
"""
