"""Behavioral / monitoring analytics over the event stream: cohort
retention, funnel progression, and distribution-drift metrics.

North-star extensions (SURVEY.md §2.9): the reference's only "behavior"
signal is its uploads-per-second gauge (bulkupload.py:363-387); these are
the standard set a pipeline owner layers on an event log, each expressed as
one or two shuffles over the keyed stream:

* **Cohort retention** — two aggregations (first-touch per user, distinct
  user-week activity) joined on the user key; the matrix is
  O(cohorts x offsets), tiny regardless of input scale.
* **Funnel** — staged conditional minima: each stage is an aggregation of
  the next event type filtered to AFTER the previous stage's timestamp,
  chained by equi-joins on user_id. Stage k's input shrinks monotonically,
  and every join key is the same (user_id) so AQE can reuse the exchange.
* **Drift (chi-square + PSI)** — two-sample categorical comparison, split
  at the data-driven time midpoint (epoch-microsecond integer math, exact
  on both engines; the midpoint is a 1-row scalar broadcast, same pattern
  as the histogram bounds). Output is a single row of test statistics —
  the thing a scheduled data-quality job alerts on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from swiftbulkuploader_spark.catalog import load_table


def x7_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by the week of their
    first event; each cell counts distinct cohort members active k weeks
    later."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    cohorted = firsts.select(
        "user_id", F.date_trunc("week", "first_ts").cast("date").alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("active_week")
    ).distinct()
    return (
        activity.join(cohorted, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def x7_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: a user advances a stage
    only with an event strictly AFTER their previous stage's timestamp.
    Returns one row of stage reach counts."""
    events = load_table(spark, sf_dir, "events")

    def stage(event_type: str, prev: DataFrame, prev_ts: str, out_ts: str) -> DataFrame:
        nxt = events.filter(F.col("event_type") == event_type).select(
            "user_id", F.col("ts").alias("_t")
        )
        return (
            nxt.join(prev, "user_id")
            .filter(F.col("_t") > F.col(prev_ts))
            .groupBy("user_id", prev_ts)
            .agg(F.min("_t").alias(out_ts))
        )

    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    clicks = stage("click", views, "t_view", "t_click")
    purchases = stage("purchase", clicks, "t_click", "t_purchase")
    return (
        views.agg(F.countDistinct("user_id").alias("n_viewed"))
        .crossJoin(clicks.agg(F.countDistinct("user_id").alias("n_clicked")))
        .crossJoin(purchases.agg(F.countDistinct("user_id").alias("n_purchased")))
    )


def x6_drift_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift of event_type between the first and second half of
    the stream (split at the epoch-microsecond midpoint): two-sample
    chi-square statistic, PSI, and degrees of freedom, one output row.

    The midpoint is floor((min+max)/2) on BOTH engines (Spark cast
    truncates but DuckDB CAST rounds half-to-even — integer floor sidesteps
    the divergence). PSI uses Laplace-smoothed proportions
    (a+0.5)/(na+k/2): a category present in only one half — the strongest
    drift signal — contributes a large finite term instead of ln(0), which
    DuckDB raises on and Spark silently nulls out."""
    events = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    bounds = events.agg(
        F.floor((F.min("us") + F.max("us")) / F.lit(2)).cast("long").alias("mid_us")
    )
    halves = events.join(F.broadcast(bounds)).select(
        "event_type", (F.col("us") < F.col("mid_us")).alias("is_a")
    )
    return drift_from_halves(halves)


def drift_from_halves(halves: DataFrame) -> DataFrame:
    """chi2/PSI/dof from a (event_type, is_a) frame — split policy factored
    out so degenerate splits (one-sided categories, empty halves) are unit
    testable independent of the midpoint rule."""
    per_cat = halves.groupBy("event_type").agg(
        F.sum(F.col("is_a").cast("long")).alias("a"),
        F.sum((~F.col("is_a")).cast("long")).alias("b"),
    )
    tot = per_cat.agg(
        F.sum("a").alias("na"), F.sum("b").alias("nb"), F.count("*").alias("k")
    )
    j = per_cat.join(F.broadcast(tot))
    ea = (F.col("a") + F.col("b")) * F.col("na") / (F.col("na") + F.col("nb"))
    eb = (F.col("a") + F.col("b")) * F.col("nb") / (F.col("na") + F.col("nb"))
    # Laplace-smoothed proportions: finite, nonzero even for one-sided cats
    pa = (F.col("a") + 0.5) / (F.col("na") + F.col("k") / 2)
    pb = (F.col("b") + 0.5) / (F.col("nb") + F.col("k") / 2)
    return j.agg(
        F.round(
            F.sum(
                F.pow(F.col("a") - ea, 2) / F.nullif(ea, F.lit(0.0))
                + F.pow(F.col("b") - eb, 2) / F.nullif(eb, F.lit(0.0))
            ),
            6,
        ).alias("chi2"),
        F.round(F.sum((pa - pb) * F.log(pa / pb)), 6).alias("psi"),
        (F.first("k") - 1).cast("int").alias("dof"),
    )


KS_BINS = 64
KS_C_ALPHA = 1.358  # alpha = 0.05 two-sample critical coefficient


def x6_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift for the CONTINUOUS column
    (event value), completing x6_drift_metrics' categorical chi-square/PSI:
    split the stream at the epoch-us midpoint, compare the halves' value
    distributions by max ECDF distance, and test against the alpha=0.05
    critical value c(alpha)*sqrt((na+nb)/(na*nb)).

    BINNED KS (64 equi-width bins), not the exact order-statistic form:
    exact two-sample KS needs a global sort of both samples — the plan
    this engine refuses at 100 TB — while the binned ECDF needs one
    64-group aggregate and a window over the 64-row bin table (bounded
    input). The discretization only COARSENS the statistic (true KS >=
    binned KS), so the drift flag errs conservative. Every arithmetic step
    is the same IEEE op sequence on both engines (integer cumulative
    counts, one division per bin), so even the boolean is hash-stable."""
    events = load_table(spark, sf_dir, "events").select(
        "value", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    bounds = events.agg(
        F.floor((F.min("us") + F.max("us")) / F.lit(2)).cast("long").alias("mid_us"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    binned = events.join(F.broadcast(bounds)).select(
        (F.col("us") < F.col("mid_us")).alias("is_a"),
        # hi == lo (constant value column) would make the bin expression
        # 0/0 = NaN — which Spark's non-ANSI int cast silently folds to 0
        # while DuckDB ERRORS casting NaN — so the degenerate case is
        # short-circuited to bin 0 identically on both engines (same
        # degenerate-input discipline as x6_benford_digits)
        F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
            F.least(
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * F.lit(KS_BINS)
                ).cast("int"),
                F.lit(KS_BINS - 1),
            )
        ).alias("bin"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum(F.col("is_a").cast("long")).alias("a"),
        F.sum((~F.col("is_a")).cast("long")).alias("b"),
    )
    # bounded input: cumulative window over <= 64 bin rows — the
    # unpartitioned WindowExec warning is intentional
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cdf = per_bin.select(
        F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb")
    )
    tot = per_bin.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    # nullif guards the empty-half degenerate (na or nb = 0): the ECDF
    # gap and the critical value become NULL instead of Inf, and so does
    # `drifted` — the documented degenerate row, identical on both engines
    gap = F.abs(
        F.col("ca") / F.nullif(F.col("na"), F.lit(0))
        - F.col("cb") / F.nullif(F.col("nb"), F.lit(0))
    )
    stat = cdf.join(F.broadcast(tot)).agg(
        F.min("na").alias("n_a"),
        F.min("nb").alias("n_b"),
        F.max(gap).alias("ks_stat"),
    )
    crit = F.lit(KS_C_ALPHA) * F.sqrt(
        (F.col("n_a") + F.col("n_b"))
        / F.nullif(F.col("n_a") * F.col("n_b"), F.lit(0))
    )
    return stat.select(
        "n_a",
        "n_b",
        "ks_stat",
        crit.alias("ks_crit"),
        (F.col("ks_stat") > crit).alias("drifted"),
    )


QUERIES = {
    "x7_cohort_retention": x7_cohort_retention,
    "x7_funnel_steps": x7_funnel_steps,
    "x6_drift_metrics": x6_drift_metrics,
    "x6_ks_drift": x6_ks_drift,
}

ORACLES = {
    "x7_cohort_retention": """
        WITH firsts AS (
            SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY user_id
        ), activity AS (
            SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
            FROM events
        )
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS INT)
                   AS week_offset,
               CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        FROM activity a JOIN firsts f USING (user_id)
        GROUP BY 1, 2
    """,
    "x7_funnel_steps": """
        WITH views AS (
            SELECT user_id, min(ts) AS t_view
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ), clicks AS (
            SELECT e.user_id, v.t_view, min(e.ts) AS t_click
            FROM events e JOIN views v USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > v.t_view
            GROUP BY e.user_id, v.t_view
        ), purchases AS (
            SELECT e.user_id, c.t_click, min(e.ts) AS t_purchase
            FROM events e JOIN clicks c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            GROUP BY e.user_id, c.t_click
        )
        SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM views) AS n_viewed,
               (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM clicks) AS n_clicked,
               (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM purchases) AS n_purchased
    """,
    # identical binning arithmetic (all-DOUBLE), integer cumulative counts,
    # one division per bin -> the statistic and even the drifted boolean
    # are bit-stable across engines
    "x6_ks_drift": f"""
        WITH e AS (
            SELECT value, epoch_us(ts) AS us FROM events
        ), bounds AS (
            SELECT (min(us) + max(us)) // 2 AS mid_us,
                   min(value) AS lo, max(value) AS hi
            FROM e
        ), binned AS (
            -- hi = lo short-circuits to bin 0 (NaN-cast guard), mirroring
            -- the Spark side's F.when
            SELECT us < mid_us AS is_a,
                   CASE WHEN hi = lo THEN 0
                        ELSE least(CAST(floor((value - lo) / (hi - lo)
                                         * CAST({KS_BINS} AS DOUBLE)) AS INT),
                                   {KS_BINS - 1}) END AS bin
            FROM e CROSS JOIN bounds
        ), per_bin AS (
            SELECT bin,
                   CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS a,
                   CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS b
            FROM binned GROUP BY bin
        ), cdf AS (
            SELECT sum(a) OVER (ORDER BY bin) AS ca,
                   sum(b) OVER (ORDER BY bin) AS cb
            FROM per_bin
        ), tot AS (
            SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb
            FROM per_bin
        ), stat AS (
            -- nullif: an empty half (na or nb = 0) yields NULL stat /
            -- crit / drifted instead of Inf, mirroring the Spark side
            SELECT min(na) AS n_a, min(nb) AS n_b,
                   max(abs(CAST(ca AS BIGINT) / nullif(na, 0)
                           - CAST(cb AS BIGINT) / nullif(nb, 0))) AS ks_stat
            FROM cdf CROSS JOIN tot
        )
        SELECT n_a, n_b, ks_stat,
               CAST({KS_C_ALPHA} AS DOUBLE)
                 * sqrt((n_a + n_b) / nullif(n_a * n_b, 0)) AS ks_crit,
               ks_stat > CAST({KS_C_ALPHA} AS DOUBLE)
                 * sqrt((n_a + n_b) / nullif(n_a * n_b, 0)) AS drifted
        FROM stat
    """,
    "x6_drift_metrics": """
        WITH e AS (
            SELECT event_type, epoch_us(ts) AS us FROM events
        ), bounds AS (
            SELECT (min(us) + max(us)) // 2 AS mid_us FROM e
        ), halves AS (
            SELECT event_type, us < mid_us AS is_a FROM e CROSS JOIN bounds
        ), per_cat AS (
            SELECT event_type,
                   CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS a,
                   CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS b
            FROM halves GROUP BY event_type
        ), tot AS (
            SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb,
                   count(*) AS k
            FROM per_cat
        )
        SELECT round(sum(
                   pow(a - (a + b) * na / (na + nb), 2)
                       / nullif((a + b) * na / (na + nb), 0)
                 + pow(b - (a + b) * nb / (na + nb), 2)
                       / nullif((a + b) * nb / (na + nb), 0)
               ), 6) AS chi2,
               round(sum(((a + 0.5) / (na + k / 2) - (b + 0.5) / (nb + k / 2))
                         * ln(((a + 0.5) / (na + k / 2))
                              / ((b + 0.5) / (nb + k / 2)))), 6) AS psi,
               CAST(min(k) - 1 AS INT) AS dof
        FROM per_cat CROSS JOIN tot
    """,
}


def x7_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the per-user event-type
    sequence: P(next = j | current = i) estimated from every consecutive
    pair in each user's chronologically-ordered stream — the behavioral
    model behind "what do users do after an error?" and the generator for
    session simulation / next-action baselines.

    Shape: one per-user window sort (lead), then a groupBy over at most
    |types|^2 cells with the row-normalizing total as a per-cell window sum
    over that TINY cell table — raw events are shuffled exactly once on
    user_id. prob is an exact integer/integer double division, identical on
    both engines.

    Reference parity: none (the reference has no sequence analytics);
    north-star extension per SURVEY.md §2.9."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type", 1).over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    cells = pairs.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    wr = Window.partitionBy("cur")
    return cells.select(
        "cur",
        "nxt",
        F.col("n").cast("long").alias("n"),
        (
            F.col("n").cast("double") / F.sum("n").over(wr).cast("double")
        ).alias("prob"),
    )


QUERIES["x7_markov_transitions"] = x7_markov_transitions

ORACLES["x7_markov_transitions"] = """
    WITH nx AS (
        SELECT event_type AS cur,
               lead(event_type, 1) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS nxt
        FROM events
    ), cells AS (
        SELECT cur, nxt, count(*) AS n
        FROM nx WHERE nxt IS NOT NULL GROUP BY 1, 2
    )
    SELECT cur, nxt, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE)
               / CAST(sum(n) OVER (PARTITION BY cur) AS DOUBLE) AS prob
    FROM cells
"""


def x7_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the first-order behavioral Markov chain (plug-in
    estimator): H = -sum_ij (n_ij/N) ln p_ij over the observed transition
    matrix (x7_markov_transitions composed) — the predictability number
    behind 'how surprising is the next user action', with perplexity
    exp(H) as its branching-factor reading (1 = deterministic behavior,
    |types| = uniform chaos). Empirical cell frequencies stand in for the
    stationary distribution (the standard plug-in; exact on long chains).

    One aggregate over the <= |types|^2-cell transition table; n/N and
    p are exact integer divisions, ln carries operand-identical ulps.
    Oracle nests the transition-matrix SQL (composed pattern)."""
    cells = x7_markov_transitions(spark, sf_dir)
    tot = Window.partitionBy()
    h_term = (
        F.col("n").cast("double") / F.sum("n").over(tot).cast("double")
    ) * F.log("prob")
    agg = cells.select("cur", "nxt", "n", h_term.alias("t")).agg(
        F.sum("n").cast("long").alias("n_transitions"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        (-F.sum("t")).alias("entropy_rate"),
    )
    return agg.select(
        "n_transitions",
        "n_cells",
        "entropy_rate",
        F.exp("entropy_rate").alias("perplexity"),
    )


QUERIES["x7_entropy_rate"] = x7_entropy_rate

ORACLES["x7_entropy_rate"] = f"""
    WITH cells AS ({ORACLES["x7_markov_transitions"]}),
    t AS (
        SELECT n, prob,
               (CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE)) * ln(prob)
                   AS term
        FROM cells
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_transitions,
           CAST(count(*) AS BIGINT) AS n_cells,
           -sum(term) AS entropy_rate,
           exp(-sum(term)) AS perplexity
    FROM t
"""
