"""Statistical-inference aggregates: linear-regression family, correlation,
and sketch-backed frequent-items.

Rounds out §2.9/X6 profiling with the bivariate statistics a corpus- or
cost-model pass needs (price ~ quantity fit per segment) and the heavy-hitter
sketch every 100 TB categorical profile starts with. The regression family
(`regr_*`) and `corr`/`covar_samp` are single-pass, mergeable aggregate
states in Spark — partial aggregation map-side, one shuffle of O(groups)
state, no second pass. `approx_top_k` is a frequent-items sketch
(SpaceSaving-style): bounded memory per partition, merged at the driver —
the scale path for "top N values of a column" that avoids a full
groupBy/count shuffle of every distinct value.

Reference parity: the reference has no statistics beyond counters
(bulkupload.py:320-331 progress %, :363-387 rate); these are north-star
extensions (SURVEY.md §2.9).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swiftbulkuploader_spark.catalog import load_table


def x6_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-return-flag OLS fit of extendedprice on quantity: slope/intercept/
    R², correlation, sample covariance, and the marginal stddevs.

    All are algebraic aggregates (sums of x, y, xy, x², y²) — one pass,
    partial+final merge, O(1) state per group. Results rounded to 6 dp on
    both engines: the sums differ only in summation order (~1e-12 rel), far
    inside the rounding margin.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_count(y, x).cast("long").alias("n"),
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.round(F.corr(y, x), 6).alias("corr_yx"),
            F.round(F.covar_samp(y, x), 6).alias("covar_yx"),
            F.round(F.stddev_samp(x), 6).alias("sd_qty"),
            F.round(F.stddev_samp(y), 6).alias("sd_price"),
        )
    )


def x6_top_frequent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters of `p_brand` via the `approx_top_k` frequent-items
    sketch, exploded back to (item, cnt) rows.

    Run in the sketch's *exact regime*: k (25) covers every distinct brand
    and the tracked-item budget (default 10⁴) exceeds the distinct count, so
    counts are exact and the result is oracle-checkable against a plain
    GROUP BY — which is precisely how the sketch is validated before being
    trusted at a scale where the GROUP BY is unaffordable.
    """
    part = load_table(spark, sf_dir, "part")
    topk = part.agg(F.expr("approx_top_k(p_brand, 25)").alias("tk"))
    return (
        topk.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("brand"),
            F.col("e.count").cast("long").alias("cnt"),
        )
    )


AB_CONV_VALUE = 95.0  # conversion = a purchase at or above this value:
                      # the bare has-a-purchase definition SATURATES on
                      # this substrate (every user converts at every SF,
                      # so rates pin at 1.0 and z goes NULL — the
                      # dead-substrate class; found round 9 while pinning
                      # the power-analysis formula)


def x6_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a HASH-ASSIGNED experiment — the
    measure-the-experiment query every event pipeline runs: users split
    into A/B by a deterministic hash of user_id (md5-prefix parity, so
    both engines assign identically and assignment is stable across
    reruns — the real-world bucketing contract), conversion = the user
    has >= 1 HIGH-VALUE purchase (value >= AB_CONV_VALUE — see the
    constant's note), pooled-variance z statistic with a
    |z| > 1.96 significance flag.

    Shape: one distinct-user aggregate (conversion via max-of-boolean),
    then a 2-group conditional aggregate folded to ONE row — everything
    after the user rollup is constant-size. Degenerate guards (the
    x6_ks_drift discipline): an empty arm or a pooled rate of exactly
    0 or 1 makes the standard error 0/NULL via nullif, so z and
    `significant` go NULL instead of Inf on BOTH engines. The flag is
    decided on a 6-dp-rounded |z| (round-before-boolean)."""
    events = load_table(spark, sf_dir, "events")
    users = (
        events.groupBy("user_id")
        .agg(
            F.max(
                (
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= F.lit(AB_CONV_VALUE))
                ).cast("int")
            ).alias("conv")
        )
        .select(
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                    16, 10,
                ).cast("long") % 2
            ).alias("variant"),
            "conv",
        )
    )
    arms = users.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0)).alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0)).alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.nullif(F.col("n_a"), F.lit(0))
    p_b = F.col("conv_b") / F.nullif(F.col("n_b"), F.lit(0))
    p_pool = (F.col("conv_a") + F.col("conv_b")) / F.nullif(
        F.col("n_a") + F.col("n_b"), F.lit(0)
    )
    se = F.sqrt(
        F.nullif(
            p_pool * (F.lit(1.0) - p_pool)
            * (F.lit(1.0) / F.nullif(F.col("n_a"), F.lit(0))
               + F.lit(1.0) / F.nullif(F.col("n_b"), F.lit(0))),
            F.lit(0.0),
        )
    )
    z = (p_a - p_b) / se
    return arms.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("conv_a").cast("long").alias("conv_a"),
        F.col("conv_b").cast("long").alias("conv_b"),
        p_a.alias("rate_a"),
        p_b.alias("rate_b"),
        z.alias("z_stat"),
        (F.abs(F.round(z, 6)) > F.lit(1.96)).alias("significant"),
    )


QUERIES = {
    "x6_regression_stats": x6_regression_stats,
    "x6_top_frequent": x6_top_frequent,
    "x6_ab_test": x6_ab_test,
}

ORACLES = {
    "x6_regression_stats": """
        SELECT l_returnflag,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
               round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
               round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
               round(corr(l_extendedprice, l_quantity), 6) AS corr_yx,
               round(covar_samp(l_extendedprice, l_quantity), 6) AS covar_yx,
               round(stddev_samp(l_quantity), 6) AS sd_qty,
               round(stddev_samp(l_extendedprice), 6) AS sd_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "x6_top_frequent": """
        SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS cnt
        FROM part
        GROUP BY p_brand
    """,
}

ORACLES["x6_ab_test"] = """
    WITH users AS (
        SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2
                   AS variant,
               CAST(max(CASE WHEN event_type = 'purchase' AND value >= CAST(95 AS DOUBLE) THEN 1 ELSE 0 END) AS INT)
                   AS conv
        FROM events GROUP BY user_id
    ), arms AS (
        SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
               CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        FROM users
    ), calc AS (
        SELECT *,
               conv_a / CAST(nullif(n_a, 0) AS DOUBLE) AS rate_a,
               conv_b / CAST(nullif(n_b, 0) AS DOUBLE) AS rate_b,
               (conv_a + conv_b) / CAST(nullif(n_a + n_b, 0) AS DOUBLE) AS p_pool
        FROM arms
    ), zc AS (
        SELECT *,
               (rate_a - rate_b)
               / sqrt(nullif(p_pool * (CAST(1 AS DOUBLE) - p_pool)
                             * (CAST(1 AS DOUBLE) / nullif(n_a, 0)
                                + CAST(1 AS DOUBLE) / nullif(n_b, 0)),
                             CAST(0 AS DOUBLE))) AS z_stat
        FROM calc
    )
    SELECT n_a, n_b, conv_a, conv_b, rate_a, rate_b, z_stat,
           abs(round(z_stat, 6)) > CAST(1.96 AS DOUBLE) AS significant
    FROM zc
"""


def x6_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between event_type and hour-of-day — the
    bounded [0,1] effect-size companion to the chi-square drift test (a
    10^10-row table makes ANY dependence "significant"; V says whether it is
    MATERIAL). The profiling question it answers: is traffic mix
    time-of-day-dependent enough that per-hour stratification matters?

    Chi-square uses the observed-cells-only identity
    chi2 = N * (sum_cells o^2 / (rowtot * coltot) - 1), which needs NO dense
    contingency grid (zero cells contribute zero to the sum) — so the plan
    is one groupBy over at most |types| x 24 cells plus two window marginals
    on that tiny cell table, and raw events are aggregated exactly once. All
    cell terms are exact small-integer products divided pairwise; only the
    final sum carries summation-order ulps.

    V = sqrt(chi2 / (N * (min(r, c) - 1))), r/c = observed category counts.

    Reference parity: none (reference has no statistics beyond counters,
    bulkupload.py:320-331); north-star extension per SURVEY.md §2.9."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    cells = events.groupBy(
        F.col("event_type").alias("r"), F.hour("ts").alias("c")
    ).agg(F.count(F.lit(1)).alias("o"))
    wr = Window.partitionBy("r")
    wc = Window.partitionBy("c")
    terms = cells.select(
        "r",
        "c",
        "o",
        (
            (F.col("o").cast("double") * F.col("o").cast("double"))
            / (F.sum("o").over(wr).cast("double") * F.sum("o").over(wc).cast("double"))
        ).alias("term"),
    )
    agg = terms.agg(
        F.sum("o").cast("long").alias("n"),
        F.count_distinct("r").alias("n_rows"),
        F.count_distinct("c").alias("n_cols"),
        F.sum("term").alias("s"),
    )
    chi2 = agg["n"].cast("double") * (F.col("s") - F.lit(1.0))
    dof_min = F.least(F.col("n_rows"), F.col("n_cols")) - F.lit(1)
    return agg.select(
        "n",
        "n_rows",
        "n_cols",
        chi2.alias("chi2"),
        F.sqrt(chi2 / (F.col("n").cast("double") * dof_min.cast("double"))).alias(
            "cramers_v"
        ),
    )


QUERIES["x6_cramers_v"] = x6_cramers_v

ORACLES["x6_cramers_v"] = """
    WITH cells AS (
        SELECT event_type AS r, hour(ts) AS c, count(*) AS o
        FROM events GROUP BY 1, 2
    ), terms AS (
        SELECT r, c, o,
               (CAST(o AS DOUBLE) * CAST(o AS DOUBLE))
               / (CAST(sum(o) OVER (PARTITION BY r) AS DOUBLE)
                  * CAST(sum(o) OVER (PARTITION BY c) AS DOUBLE)) AS term
        FROM cells
    ), agg AS (
        SELECT CAST(sum(o) AS BIGINT) AS n,
               CAST(count(DISTINCT r) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT c) AS BIGINT) AS n_cols,
               sum(term) AS s
        FROM terms
    )
    SELECT n, n_rows, n_cols,
           CAST(n AS DOUBLE) * (s - CAST(1 AS DOUBLE)) AS chi2,
           sqrt(CAST(n AS DOUBLE) * (s - CAST(1 AS DOUBLE))
                / (CAST(n AS DOUBLE)
                   * CAST(least(n_rows, n_cols) - 1 AS DOUBLE))) AS cramers_v
    FROM agg
"""


def x6_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between event_type and hour-of-day, plus
    both marginal entropies and the normalized MI — the information-
    theoretic companion to x6_cramers_v: V measures the strength of the
    linear-ish association, MI captures ANY dependence and NMI puts it on
    the [0,1] scale feature-selection pipelines rank by.

    Observed-cells-only identities (zero cells contribute zero, so no
    dense grid): with rt/ct the window marginals and n the total,
        MI  = (sum o*ln o)/n + ln n - (sum o*ln rt)/n - (sum o*ln ct)/n
        H_r = ln n - (sum o*ln rt)/n      (since sum_cells o*ln rt
                                           = sum_r rt*ln rt)
        H_c = ln n - (sum o*ln ct)/n
    One groupBy over <= |types| x 24 cells, two window marginals on the
    tiny cell table, one single-row aggregate; raw events aggregated once.
    All ln() inputs are exact integers; only sum order carries ulps."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    cells = events.groupBy(
        F.col("event_type").alias("r"), F.hour("ts").alias("c")
    ).agg(F.count(F.lit(1)).alias("o"))
    wr = Window.partitionBy("r")
    wc = Window.partitionBy("c")
    od = F.col("o").cast("double")
    t = cells.select(
        "o",
        (od * F.log(od)).alias("olno"),
        (od * F.log(F.sum("o").over(wr).cast("double"))).alias("olnr"),
        (od * F.log(F.sum("o").over(wc).cast("double"))).alias("olnc"),
    )
    agg = t.agg(
        F.sum("o").cast("long").alias("n"),
        F.sum("olno").alias("so"),
        F.sum("olnr").alias("sr"),
        F.sum("olnc").alias("sc"),
    )
    nd = F.col("n").cast("double")
    mi = F.col("so") / nd + F.log(nd) - F.col("sr") / nd - F.col("sc") / nd
    h_row = F.log(nd) - F.col("sr") / nd
    h_col = F.log(nd) - F.col("sc") / nd
    return agg.select(
        "n",
        mi.alias("mi"),
        h_row.alias("h_row"),
        h_col.alias("h_col"),
        (mi / F.nullif(F.sqrt(h_row * h_col), F.lit(0.0))).alias("nmi"),
    )


QUERIES["x6_mutual_information"] = x6_mutual_information

ORACLES["x6_mutual_information"] = """
    WITH cells AS (
        SELECT event_type AS r, hour(ts) AS c, count(*) AS o
        FROM events GROUP BY 1, 2
    ), t AS (
        SELECT o,
               CAST(o AS DOUBLE) * ln(CAST(o AS DOUBLE)) AS olno,
               CAST(o AS DOUBLE)
                   * ln(CAST(sum(o) OVER (PARTITION BY r) AS DOUBLE)) AS olnr,
               CAST(o AS DOUBLE)
                   * ln(CAST(sum(o) OVER (PARTITION BY c) AS DOUBLE)) AS olnc
        FROM cells
    ), agg AS (
        SELECT CAST(sum(o) AS BIGINT) AS n,
               sum(olno) AS so, sum(olnr) AS sr, sum(olnc) AS sc
        FROM t
    )
    SELECT n,
           so / CAST(n AS DOUBLE) + ln(CAST(n AS DOUBLE))
               - sr / CAST(n AS DOUBLE) - sc / CAST(n AS DOUBLE) AS mi,
           ln(CAST(n AS DOUBLE)) - sr / CAST(n AS DOUBLE) AS h_row,
           ln(CAST(n AS DOUBLE)) - sc / CAST(n AS DOUBLE) AS h_col,
           (so / CAST(n AS DOUBLE) + ln(CAST(n AS DOUBLE))
               - sr / CAST(n AS DOUBLE) - sc / CAST(n AS DOUBLE))
           / nullif(sqrt((ln(CAST(n AS DOUBLE)) - sr / CAST(n AS DOUBLE))
                         * (ln(CAST(n AS DOUBLE)) - sc / CAST(n AS DOUBLE))),
                    CAST(0 AS DOUBLE)) AS nmi
    FROM agg
"""


BOOT_B = 32
# Poisson(1) inverse-CDF thresholds, P(X <= k) for k = 0..5 (beyond -> 6).
BOOT_CDF = (0.367879441, 0.735758882, 0.919698603,
            0.981011843, 0.996340153, 0.999405815)
# The same thresholds as 13-hex-digit strings: a 52-bit md5-prefix uniform
# u = n / 2^52 satisfies u < c  <=>  n < ceil(c * 2^52), and with n kept AS
# ITS HEX STRING the compare is a plain fixed-width lowercase-hex string
# comparison — no base-16 conv() on either engine. ceil(c * 2^52) is exact
# in Python floats (power-of-2 scaling of a 53-bit mantissa).
BOOT_THR_HEX = tuple(
    format(math.ceil(c * float(1 << 52)), "013x") for c in BOOT_CDF
)

# Shared Poisson-replica substrate (r10 verdict ask #5): the two
# bootstrap readouts (x6_poisson_bootstrap mean CI, x6_bootstrap_diff_ci
# uplift CI) explode the SAME rows x BOOT_B weighted frame — md5 per
# (order, g), two 13-hex uniforms per digest, hex-threshold inverse CDF.
# Profiled execute-bound (build 0.4 s, exec 3.5-6.6 s at sf0.1), so the
# fix is the _LLOYD_CACHE discipline: build + persist the weighted frame
# once per (application, sf_dir); each readout is then one map-side
# combined groupBy over the resident blocks. At 100 TB the persisted
# frame spills executor-local (MEMORY_AND_DISK) or each query simply
# rebuilds its own single pass — sharing is a session optimization, not
# a correctness dependency.
_BOOT_CACHE: dict[tuple, DataFrame] = {}


def _boot_weighted_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(b, arm, x, w): order price x entering replica b (1..BOOT_B) with
    deterministic Poisson(1) weight w, arm = md5-parity of o_custkey
    (the x6_ab_test bucketing contract). Weights depend only on
    (o_orderkey, g) so ALL consumers — armed or not — share them."""
    cache_key = (spark.sparkContext.applicationId, sf_dir)
    cached = _BOOT_CACHE.get(cache_key)
    if cached is not None:
        return cached
    from swiftbulkuploader_spark.plans.layout import spread

    # spread() first: a small parquet file arrives as ONE partition and
    # the md5-per-(row, g) stage is the compute-dense step (the
    # _ALLPAIRS_CACHE shingle-base discipline)
    orders = spread(load_table(spark, sf_dir, "orders"))
    arm = (
        F.conv(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8),
            16, 10,
        ).cast("long") % 2
    ).alias("arm")
    g = F.explode(F.sequence(F.lit(1), F.lit(BOOT_B // 2))).alias("g")
    rows = orders.select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("x"),
        arm, g,
    )
    # ONE md5 yields TWO independent 52-bit uniforms (chars 1-13 /
    # 14-26), materialized between the explode stages so codegen keeps
    # one digest per (row, g) — the round-8 constant-cost cut
    hh = F.md5(F.concat(F.col("k").cast("string"), F.lit(":"),
                        F.col("g").cast("string")))
    pairs = F.array(*[
        F.struct(
            ((F.col("g") - F.lit(1)) * 2 + F.lit(j)).alias("b"),
            F.substring(hh, (j - 1) * 13 + 1, 13).alias("s"),
        )
        for j in (1, 2)
    ])
    ex = rows.select("x", "arm", F.explode(pairs).alias("p")).select(
        "x", "arm", F.col("p.b").alias("b"), F.col("p.s").alias("s")
    )
    w = F.lit(6)
    for k in range(len(BOOT_THR_HEX) - 1, -1, -1):
        w = F.when(F.col("s") < F.lit(BOOT_THR_HEX[k]), F.lit(k)).otherwise(w)
    out = ex.select("b", "arm", "x", w.cast("long").alias("w")).persist()
    out.count()  # materialize once, eagerly
    _BOOT_CACHE[cache_key] = out
    return out


def x6_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic POISSON BOOTSTRAP confidence interval for the mean
    order price — the scalable bootstrap (Chamandy et al., Google 2012):
    instead of resampling n rows with replacement (which needs global
    coordination), each row enters replica b with an independent
    Poisson(1) weight derived from a 52-bit md5 uniform so both engines
    draw IDENTICAL weights. One explode to rows x B, one B-group
    aggregate for the replica means, positional order statistics of the
    32 means for the ~95% interval (rank 2 / rank 31 — the row_number
    median discipline, no percentile function).

    Round-8 constant-cost cut (the r7 verdict's ask, profiled
    execute-bound first per CLAUDE.md rule 10): (a) ONE md5 yields TWO
    independent 52-bit uniforms (chars 1-13 / 14-26 of the 32-hex digest)
    — 16 hash calls per row instead of 32, materialized between the two
    explode stages so codegen subexpression elimination keeps one digest
    per (row, g); (b) the inverse-CDF compares the hex PREFIX STRING
    against precomputed 13-hex thresholds (u < c <=> hex < hex(ceil(c *
    2^52))) — fixed-width lowercase hex compares like the integer, so
    base-16 conv() disappears from both engines. Measured 9.5 s -> 3.0 s
    at sf0.1 (SCALING.md).

    Shape: rows x 32 weighted partial sums map-side-combine down to 32
    groups; at 100 TB this is one pass and a 32-row aggregate regardless
    of n. The weighted frame itself is the SHARED persisted substrate
    _boot_weighted_rows (r10 verdict ask #5) — x6_bootstrap_diff_ci
    reads the same blocks, so the md5+explode cost is paid once per
    session. Exactness: weights are integers from shared hex thresholds,
    replica means are sum-order-ulp doubles (9-digit normalized), and the
    CI bounds are SELECTED values (order decided on 6-dp-rounded means
    with replica-id tie-break)."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    # shared persisted replica substrate (weights ignore arm — they key
    # on (order, g) only), one map-side-combined groupBy per readout
    wx = _boot_weighted_rows(spark, sf_dir)
    reps = (
        wx.groupBy("b")
        .agg(
            (F.sum(F.col("w") * F.col("x")) / F.sum("w").cast("double")).alias("m")
        )
    )
    wr = Window.orderBy(F.round("m", 6).asc(), F.col("b").asc())
    ranked = reps.withColumn("rn", F.row_number().over(wr))
    stats = ranked.agg(
        F.stddev_samp("m").alias("boot_se"),
        F.max(F.when(F.col("rn") == 2, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("rn") == BOOT_B - 1, F.col("m"))).alias("ci_hi"),
    )
    base = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("o_totalprice").alias("mean"),
    )
    return base.crossJoin(stats)  # bounded: two 1-row summaries


QUERIES["x6_poisson_bootstrap"] = x6_poisson_bootstrap


def _boot_oracle_sql() -> str:
    cdf_case = "CASE " + " ".join(
        f"WHEN s < '{t}' THEN {k}"
        for k, t in enumerate(BOOT_THR_HEX)
    ) + " ELSE 6 END"
    return f"""
    WITH r AS (
        SELECT o_orderkey AS k, o_totalprice AS x,
               unnest(range(1, {BOOT_B // 2 + 1})) AS g
        FROM orders
    ), h AS MATERIALIZED (
        SELECT x, g, md5(CAST(k AS VARCHAR) || ':'
                         || CAST(g AS VARCHAR)) AS hh
        FROM r
    ), s AS (
        SELECT x, (g - 1) * 2 + j AS b,
               substr(hh, (j - 1) * 13 + 1, 13) AS s
        FROM h CROSS JOIN (SELECT unnest([1, 2]) AS j)
    ), wts AS (
        SELECT b, x, CAST({cdf_case} AS BIGINT) AS w FROM s
    ), reps AS (
        SELECT b, sum(w * x) / CAST(sum(w) AS DOUBLE) AS m
        FROM wts GROUP BY b
    ), ranked AS (
        SELECT *, row_number() OVER (ORDER BY round(m, 6) ASC, b ASC) AS rn
        FROM reps
    ), stats AS (
        SELECT stddev_samp(m) AS boot_se,
               max(CASE WHEN rn = 2 THEN m END) AS ci_lo,
               max(CASE WHEN rn = {BOOT_B - 1} THEN m END) AS ci_hi
        FROM ranked
    ), base AS (
        SELECT CAST(count(*) AS BIGINT) AS n, avg(o_totalprice) AS mean
        FROM orders
    )
    SELECT n, mean, boot_se, ci_lo, ci_hi FROM base CROSS JOIN stats
"""


ORACLES["x6_poisson_bootstrap"] = _boot_oracle_sql()


def x6_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on mean order price — the
    continuous-outcome companion to x6_ab_test's two-proportion z: one
    NULL SPLIT row (orderkey parity — same distribution, |t| should be
    small) calibrates the one REAL split row (urgent/high priority vs
    rest), the same own-baseline reporting discipline as x2_mmd_drift.
    Satterthwaite df included (the number to feed a t table).

    EXACTNESS (the reason this query is engineered, not just written):
    a double sum over 10^5 prices carries ~1e-11 relative summation-order
    error, and the null split's mean DIFFERENCE is small — t would agree
    across engines to only ~7 digits and fail the 9-digit compare. So
    prices become exact integer CENTS (round(price*100) — 2-dp source
    data, exact both engines) and every sum runs in EXACT integer space:
    Spark decimal(30,0) sums vs DuckDB HUGEINT sums, both overflow-free
    at 10^19 magnitudes. The exact integers cast to double identically
    (nearest), so mean/variance/t/df are ONE fixed-shape double
    expression over bit-identical operands — the x2_pq_distortion
    scaled-integer discipline applied to second moments.

    Shape: per comparison ONE conditional aggregate over the scan
    (map-side combined, no shuffle beyond the 1-row agg), two aggregate
    subtrees unioned."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * F.lit(100.0), 0).cast(
        "decimal(20,0)"
    )

    def welch_row(in_a, in_b, tag):
        base = orders.select(
            cents.alias("c"),
            in_a.alias("ia"),
            in_b.alias("ib"),
        )
        agg = base.agg(
            F.sum(F.when(F.col("ia"), 1).otherwise(0)).cast("long").alias("n1"),
            F.sum(F.when(F.col("ia"), F.col("c"))).alias("sx1"),
            F.sum(F.when(F.col("ia"), F.col("c") * F.col("c"))).alias("sxx1"),
            F.sum(F.when(F.col("ib"), 1).otherwise(0)).cast("long").alias("n2"),
            F.sum(F.when(F.col("ib"), F.col("c"))).alias("sx2"),
            F.sum(F.when(F.col("ib"), F.col("c") * F.col("c"))).alias("sxx2"),
        )
        n1d = F.col("n1").cast("double")
        n2d = F.col("n2").cast("double")
        sx1 = F.col("sx1").cast("double")
        sx2 = F.col("sx2").cast("double")
        sxx1 = F.col("sxx1").cast("double")
        sxx2 = F.col("sxx2").cast("double")
        m1 = sx1 / n1d
        m2 = sx2 / n2d
        v1 = (sxx1 - sx1 * sx1 / n1d) / (n1d - F.lit(1.0))
        v2 = (sxx2 - sx2 * sx2 / n2d) / (n2d - F.lit(1.0))
        se2 = v1 / n1d + v2 / n2d
        t = (m1 - m2) / F.sqrt(se2)
        df = (se2 * se2) / (
            (v1 / n1d) * (v1 / n1d) / (n1d - F.lit(1.0))
            + (v2 / n2d) * (v2 / n2d) / (n2d - F.lit(1.0))
        )
        return agg.select(
            F.lit(tag).alias("comparison"),
            F.col("n1").alias("n_a"),
            F.col("n2").alias("n_b"),
            ((m1 - m2) / F.lit(100.0)).alias("mean_diff"),
            t.alias("t_stat"),
            df.alias("welch_df"),
        )

    null_split = welch_row(
        F.col("o_orderkey") % 2 == 0,
        F.col("o_orderkey") % 2 == 1,
        "null_split",
    )
    prio = welch_row(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        "priority_split",
    )
    return null_split.unionByName(prio)


QUERIES["x6_welch_ttest"] = x6_welch_ttest


def _welch_oracle_sql() -> str:
    def row(ca, cb, tag):
        return f"""
        SELECT '{tag}' AS comparison,
               CAST(n1 AS BIGINT) AS n_a,
               CAST(n2 AS BIGINT) AS n_b,
               (sx1 / n1d - sx2 / n2d) / CAST(100 AS DOUBLE) AS mean_diff,
               (sx1 / n1d - sx2 / n2d)
                   / sqrt(((sxx1 - sx1 * sx1 / n1d) / (n1d - CAST(1 AS DOUBLE))) / n1d
                          + ((sxx2 - sx2 * sx2 / n2d) / (n2d - CAST(1 AS DOUBLE))) / n2d)
                   AS t_stat,
               ((((sxx1 - sx1 * sx1 / n1d) / (n1d - CAST(1 AS DOUBLE))) / n1d
                 + ((sxx2 - sx2 * sx2 / n2d) / (n2d - CAST(1 AS DOUBLE))) / n2d)
                * (((sxx1 - sx1 * sx1 / n1d) / (n1d - CAST(1 AS DOUBLE))) / n1d
                   + ((sxx2 - sx2 * sx2 / n2d) / (n2d - CAST(1 AS DOUBLE))) / n2d))
               / ((((sxx1 - sx1 * sx1 / n1d) / (n1d - CAST(1 AS DOUBLE))) / n1d)
                  * (((sxx1 - sx1 * sx1 / n1d) / (n1d - CAST(1 AS DOUBLE))) / n1d)
                  / (n1d - CAST(1 AS DOUBLE))
                  + (((sxx2 - sx2 * sx2 / n2d) / (n2d - CAST(1 AS DOUBLE))) / n2d)
                    * (((sxx2 - sx2 * sx2 / n2d) / (n2d - CAST(1 AS DOUBLE))) / n2d)
                    / (n2d - CAST(1 AS DOUBLE))) AS welch_df
        FROM (
            SELECT sum(CASE WHEN {ca} THEN 1 ELSE 0 END) AS n1,
                   CAST(sum(CASE WHEN {ca} THEN 1 ELSE 0 END) AS DOUBLE) AS n1d,
                   CAST(sum(CASE WHEN {ca} THEN c END) AS DOUBLE) AS sx1,
                   CAST(sum(CASE WHEN {ca} THEN c * c END) AS DOUBLE) AS sxx1,
                   sum(CASE WHEN {cb} THEN 1 ELSE 0 END) AS n2,
                   CAST(sum(CASE WHEN {cb} THEN 1 ELSE 0 END) AS DOUBLE) AS n2d,
                   CAST(sum(CASE WHEN {cb} THEN c END) AS DOUBLE) AS sx2,
                   CAST(sum(CASE WHEN {cb} THEN c * c END) AS DOUBLE) AS sxx2
            FROM (
                SELECT CAST(round(o_totalprice * CAST(100 AS DOUBLE), 0)
                            AS BIGINT) AS c,
                       o_orderkey, o_orderpriority
                FROM orders
            )
        )"""

    return (
        "    " + row("o_orderkey % 2 = 0", "o_orderkey % 2 = 1", "null_split")
        + "\n    UNION ALL\n    "
        + row("o_orderpriority IN ('1-URGENT', '2-HIGH')",
              "o_orderpriority NOT IN ('1-URGENT', '2-HIGH')",
              "priority_split")
    )


ORACLES["x6_welch_ttest"] = _welch_oracle_sql()


POWER_Z_ALPHA = 1.959964   # two-sided alpha = 0.05
POWER_Z_BETA = 0.841621    # 80% power
POWER_LIFTS = (0.05, 0.10, 0.20)


def x6_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment SIZING — the question asked before x6_ab_test is ever
    run: at the control arm's observed conversion rate, how many users
    per arm does each candidate relative lift need (classic
    two-proportion normal approximation, alpha = 0.05 two-sided / 80%
    power), is the current arm already big enough, and what's the
    minimum detectable effect at today's size. One row per candidate
    lift over the same deterministic md5-parity split as x6_ab_test, so
    the two reports read off the same experiment.

    n_req = ceil((z_a+z_b)^2 * (p1(1-p1) + p2(1-p2)) / (p2-p1)^2);
    MDE = (z_a+z_b) * sqrt(2 p1 (1-p1) / n_a). Everything after the
    one distinct-user rollup is a constant-size grid (arms x 3 lifts,
    bounded broadcast); degenerate p1 = 0 or lift-capped p2 = p1 turns
    n_req NULL via nullif on both engines (then achievable_now = NULL,
    honest rather than Inf)."""
    events = load_table(spark, sf_dir, "events")
    users = (
        events.groupBy("user_id")
        .agg(
            F.max(
                (
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= F.lit(AB_CONV_VALUE))
                ).cast("int")
            ).alias("conv")
        )
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 8
                    ),
                    16, 10,
                ).cast("long") % 2
            ).alias("variant"),
            "conv",
        )
    )
    arms = users.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when(F.col("variant") == 0, F.col("conv")).otherwise(0)
        ).alias("conv_a"),
    )
    lifts = spark.createDataFrame(
        [(float(x),) for x in POWER_LIFTS], "lift: double"
    )
    grid = arms.crossJoin(F.broadcast(lifts))  # bounded: 1 x |lifts|
    zsum = F.lit(POWER_Z_ALPHA) + F.lit(POWER_Z_BETA)
    p1 = F.col("conv_a") / F.nullif(F.col("n_a"), F.lit(0)).cast("double")
    p2 = F.least(p1 * (F.lit(1.0) + F.col("lift")), F.lit(1.0))
    num = zsum * zsum * (
        p1 * (F.lit(1.0) - p1) + p2 * (F.lit(1.0) - p2)
    )
    n_req = F.ceil(
        num / F.nullif((p2 - p1) * (p2 - p1), F.lit(0.0))
    ).cast("long")
    mde = zsum * F.sqrt(
        F.lit(2.0) * p1 * (F.lit(1.0) - p1)
        / F.nullif(F.col("n_a"), F.lit(0)).cast("double")
    )
    return grid.select(
        F.round(F.col("lift"), 4).alias("lift"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        p1.alias("p_base"),
        p2.alias("p_target"),
        n_req.alias("n_required_per_arm"),
        (F.col("n_a") >= n_req).alias("achievable_now"),
        mde.alias("mde_at_current_n"),
    )


QUERIES["x6_power_analysis"] = x6_power_analysis

ORACLES["x6_power_analysis"] = f"""
    WITH users AS (
        SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 2 AS variant,
               CAST(max(CASE WHEN event_type = 'purchase' AND value >= CAST(95 AS DOUBLE) THEN 1 ELSE 0 END)
                    AS INT) AS conv
        FROM events GROUP BY user_id
    ), arms AS (
        SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
               CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b,
               CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END)
                    AS BIGINT) AS conv_a
        FROM users
    ), grid AS (
        SELECT * FROM arms
        CROSS JOIN (SELECT unnest([{", ".join(f"CAST({x} AS DOUBLE)" for x in POWER_LIFTS)}]) AS lift)
    ), calc AS (
        SELECT *,
               conv_a / CAST(nullif(n_a, 0) AS DOUBLE) AS p1,
               least(conv_a / CAST(nullif(n_a, 0) AS DOUBLE)
                     * (CAST(1 AS DOUBLE) + lift), CAST(1 AS DOUBLE)) AS p2,
               CAST({POWER_Z_ALPHA} AS DOUBLE)
                   + CAST({POWER_Z_BETA} AS DOUBLE) AS zsum
        FROM grid
    ), req AS (
        SELECT *,
               CAST(ceil(zsum * zsum
                         * (p1 * (CAST(1 AS DOUBLE) - p1)
                            + p2 * (CAST(1 AS DOUBLE) - p2))
                         / nullif((p2 - p1) * (p2 - p1),
                                  CAST(0 AS DOUBLE))) AS BIGINT) AS n_req
        FROM calc
    )
    SELECT round(lift, 4) AS lift,
           n_a, n_b,
           p1 AS p_base,
           p2 AS p_target,
           n_req AS n_required_per_arm,
           n_a >= n_req AS achievable_now,
           zsum * sqrt(CAST(2 AS DOUBLE) * p1 * (CAST(1 AS DOUBLE) - p1)
                       / CAST(nullif(n_a, 0) AS DOUBLE))
               AS mde_at_current_n
    FROM req
"""


def x6_bootstrap_diff_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-arm UPLIFT bootstrap CI — the experiment-readout companion of
    x6_poisson_bootstrap (round-9 memory's scoped candidate): customers
    hash-assigned to arms A/B (md5-prefix parity of o_custkey — the
    x6_ab_test bucketing contract), per bootstrap replica the DIFFERENCE
    of the arms' Poisson-weighted mean order prices, ~95% CI from the
    positional order statistics of the BOOT_B diffs. A significance call
    on uplift ("is mean(B) - mean(A) distinguishable from 0") without
    any normality assumption — the test the z/t queries approximate.

    Reuses the whole deterministic-bootstrap machinery: one md5 per
    (order, g) yields two 13-hex 52-bit uniforms; weights via the
    precomputed hex-threshold inverse CDF (u < c <=> hex13 < thr);
    replica means are per-arm conditional aggregates of the SAME
    weighted rows, so each replica resamples both arms coherently. CI
    bounds are SELECTED replica diffs (rank 2 / rank BOOT_B-1 decided on
    6-dp-rounded diffs with replica-id tie-break); boot_se is the sample
    stddev of the diffs.

    Shape: rows x BOOT_B weighted partials map-side-combine to BOOT_B
    groups — one pass + a 32-row aggregate at any n, over the SHARED
    persisted replica substrate (_boot_weighted_rows, the _LLOYD_CACHE
    discipline — r10 verdict ask #5). Liveness (the
    x6_ab_test lesson): both arms populated, diff nonzero, ci_lo <
    ci_hi, pinned in tests/test_liveness_pins.py.

    Reference parity: none (§2.9 stats extension)."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    arm = (
        F.conv(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8),
            16, 10,
        ).cast("long") % 2
    ).alias("arm")
    # shared persisted replica substrate (see _boot_weighted_rows)
    wx = _boot_weighted_rows(spark, sf_dir)
    is_a, is_b = F.col("arm") == 0, F.col("arm") == 1
    reps = wx.groupBy("b").agg(
        (
            F.sum(F.when(is_b, F.col("w") * F.col("x")))
            / F.sum(F.when(is_b, F.col("w"))).cast("double")
            - F.sum(F.when(is_a, F.col("w") * F.col("x")))
            / F.sum(F.when(is_a, F.col("w"))).cast("double")
        ).alias("d")
    )
    wr = Window.orderBy(F.round("d", 6).asc(), F.col("b").asc())
    ranked = reps.withColumn("rn", F.row_number().over(wr))
    stats = ranked.agg(
        F.stddev_samp("d").alias("boot_se"),
        F.max(F.when(F.col("rn") == 2, F.col("d"))).alias("ci_lo"),
        F.max(F.when(F.col("rn") == BOOT_B - 1, F.col("d"))).alias("ci_hi"),
    )
    base = orders.select(arm, "o_totalprice").agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(is_b, 1).otherwise(0)).cast("long").alias("n_b"),
        (
            F.avg(F.when(is_b, F.col("o_totalprice")))
            - F.avg(F.when(is_a, F.col("o_totalprice")))
        ).alias("diff"),
    )
    return base.crossJoin(stats)  # bounded: two 1-row summaries


QUERIES["x6_bootstrap_diff_ci"] = x6_bootstrap_diff_ci


def _boot_diff_oracle_sql() -> str:
    cdf_case = "CASE " + " ".join(
        f"WHEN s < '{t}' THEN {k}"
        for k, t in enumerate(BOOT_THR_HEX)
    ) + " ELSE 6 END"
    return f"""
    WITH r AS (
        SELECT o_orderkey AS k, o_totalprice AS x,
               CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS arm,
               unnest(range(1, {BOOT_B // 2 + 1})) AS g
        FROM orders
    ), h AS MATERIALIZED (
        SELECT x, arm, g, md5(CAST(k AS VARCHAR) || ':'
                              || CAST(g AS VARCHAR)) AS hh
        FROM r
    ), s AS (
        SELECT x, arm, (g - 1) * 2 + j AS b,
               substr(hh, (j - 1) * 13 + 1, 13) AS s
        FROM h CROSS JOIN (SELECT unnest([1, 2]) AS j)
    ), wts AS (
        SELECT b, arm, x, CAST({cdf_case} AS BIGINT) AS w FROM s
    ), reps AS (
        SELECT b,
               sum(CASE WHEN arm = 1 THEN w * x END)
                   / CAST(sum(CASE WHEN arm = 1 THEN w END) AS DOUBLE)
               - sum(CASE WHEN arm = 0 THEN w * x END)
                   / CAST(sum(CASE WHEN arm = 0 THEN w END) AS DOUBLE) AS d
        FROM wts GROUP BY b
    ), ranked AS (
        SELECT d, row_number() OVER (ORDER BY round(d, 6) ASC, b ASC) AS rn
        FROM reps
    ), st AS (
        SELECT stddev_samp(d) AS boot_se,
               max(CASE WHEN rn = 2 THEN d END) AS ci_lo,
               max(CASE WHEN rn = {BOOT_B - 1} THEN d END) AS ci_hi
        FROM ranked
    ), base AS (
        SELECT CAST(count(*) FILTER (arm = 0) AS BIGINT) AS n_a,
               CAST(count(*) FILTER (arm = 1) AS BIGINT) AS n_b,
               avg(x) FILTER (arm = 1) - avg(x) FILTER (arm = 0) AS diff
        FROM (SELECT o_totalprice AS x, CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS arm
              FROM orders)
    )
    SELECT base.n_a, base.n_b, base.diff, st.boot_se, st.ci_lo, st.ci_hi
    FROM base, st
"""


ORACLES["x6_bootstrap_diff_ci"] = _boot_diff_oracle_sql()


def x6_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al., WSDM'13
    "Improving the Sensitivity of Online Controlled Experiments") — the
    adjustment every mature A/B platform applies before the z/t test:
    per user, outcome Y = purchase revenue and covariate X =
    non-purchase activity value (the pre-experiment-style covariate this
    substrate offers); theta = cov(X, Y)/var(X) pooled across arms;
    adjusted uplift = diff(Y) - theta * diff(X); variance reduction =
    corr(X, Y)^2.

    EXACTNESS (the welch-ttest discipline for second moments): values
    are cent-QUANTIZED first (round(value*100) — half-away in both
    engines), per-user sums are exact BIGINTs, and the pooled moment
    sums (Sx, Sy, Sxx, Syy, Sxy) accumulate in decimal(38,0) /
    HUGEINT — overflow-free integer space — so theta, the diffs, and
    the reduction are fixed-shape double expressions over bit-identical
    operands (each exact integer casts to double identically; no
    summation-order ulps anywhere).

    Shape: one user rollup (map-side combined), one 1-row moment
    aggregate per arm folded via conditional sums — constant-size after
    the rollup at any scale. Liveness: theta finite and nonzero,
    0 <= var_reduction < 1 (pinned)."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * F.lit(100.0), 0).cast("long")
    users = events.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") != "purchase", cents).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(F.col("event_type") == "purchase", cents).otherwise(0)
        ).alias("y"),
    ).select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16, 10,
            ).cast("long") % 2
        ).alias("arm"),
        "x", "y",
    )
    dec = "decimal(38,0)"
    xd, yd = F.col("x").cast(dec), F.col("y").cast(dec)
    m = users.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(F.when(F.col("arm") == 0, xd)).alias("sxa"),
        F.sum(F.when(F.col("arm") == 1, xd)).alias("sxb"),
        F.sum(F.when(F.col("arm") == 0, yd)).alias("sya"),
        F.sum(F.when(F.col("arm") == 1, yd)).alias("syb"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    covn = (F.col("n").cast(dec) * F.col("sxy")
            - F.col("sx") * F.col("sy")).cast("double")
    varxn = (F.col("n").cast(dec) * F.col("sxx")
             - F.col("sx") * F.col("sx")).cast("double")
    varyn = (F.col("n").cast(dec) * F.col("syy")
             - F.col("sy") * F.col("sy")).cast("double")
    theta = covn / varxn
    diff_raw = (d("syb") / d("n_b") - d("sya") / d("n_a")) / F.lit(100.0)
    diff_x = (d("sxb") / d("n_b") - d("sxa") / d("n_a")) / F.lit(100.0)
    return m.select(
        "n_a", "n_b",
        theta.alias("theta"),
        diff_raw.alias("diff_raw"),
        (diff_raw - theta * diff_x).alias("diff_cuped"),
        (covn * covn / (varxn * varyn)).alias("var_reduction"),
    )


QUERIES["x6_cuped_adjust"] = x6_cuped_adjust

ORACLES["x6_cuped_adjust"] = """
    WITH u AS (
        SELECT user_id,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 2 AS arm,
               sum(CASE WHEN event_type <> 'purchase'
                        THEN CAST(round(value * 100) AS BIGINT)
                        ELSE 0 END) AS x,
               sum(CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 100) AS BIGINT)
                        ELSE 0 END) AS y
        FROM events GROUP BY user_id
    ), m AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(count(*) FILTER (arm = 0) AS BIGINT) AS n_a,
               CAST(count(*) FILTER (arm = 1) AS BIGINT) AS n_b,
               sum(CAST(x AS HUGEINT)) AS sx,
               sum(CAST(y AS HUGEINT)) AS sy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CAST(x AS HUGEINT)) FILTER (arm = 0) AS sxa,
               sum(CAST(x AS HUGEINT)) FILTER (arm = 1) AS sxb,
               sum(CAST(y AS HUGEINT)) FILTER (arm = 0) AS sya,
               sum(CAST(y AS HUGEINT)) FILTER (arm = 1) AS syb
        FROM u
    )
    SELECT n_a, n_b,
           CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
           (CAST(syb AS DOUBLE) / CAST(n_b AS DOUBLE)
            - CAST(sya AS DOUBLE) / CAST(n_a AS DOUBLE))
               / CAST(100.0 AS DOUBLE) AS diff_raw,
           (CAST(syb AS DOUBLE) / CAST(n_b AS DOUBLE)
            - CAST(sya AS DOUBLE) / CAST(n_a AS DOUBLE))
               / CAST(100.0 AS DOUBLE)
           - (CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE))
             * ((CAST(sxb AS DOUBLE) / CAST(n_b AS DOUBLE)
                 - CAST(sxa AS DOUBLE) / CAST(n_a AS DOUBLE))
                / CAST(100.0 AS DOUBLE)) AS diff_cuped,
           (CAST(n * sxy - sx * sy AS DOUBLE)
            * CAST(n * sxy - sx * sy AS DOUBLE))
               / (CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE)) AS var_reduction
    FROM m
"""


SEQ_OBF_C = 2.797  # ~alpha 0.05 O'Brien-Fleming constant


def x6_sequential_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENTIAL experiment monitoring — the peeking-safe readout a
    dashboard needs: per hour of the experiment, the CUMULATIVE
    unequal-variance z of the arm revenue difference against an
    O'Brien-Fleming-style spending boundary (c / sqrt(information
    fraction)), with a crossed flag. A fixed-horizon z re-checked hourly
    inflates false positives ~5x; the widening-early boundary is the
    standard fix (Pocock/OBF group-sequential family).

    EXACTNESS: cent-quantized values, per-hour integer partials, and the
    CUMULATIVE sums run as window sums in decimal(38,0)/HUGEINT — exact
    integers at every hour — so each hour's z is a fixed-shape double
    over bit-identical operands (the welch/cuped moment discipline made
    cumulative). The crossed boolean compares 6-dp-rounded |z| and
    boundary (round-before-decision). Degenerate guards: hours where
    either arm has < 2 cumulative users-events or zero variance yield
    NULL z and crossed=false via nullif.

    Shape: one hourly rollup (map-side combined), then window cumsums
    over the ~720-row hourly grid — the rollup-bounded unpartitioned-
    window class (kaplan_meier discipline; BOUNDED_WINDOW_OK)."""
    events = load_table(spark, sf_dir, "events")
    return monitor_readout(monitor_hourly_cells(events))


def monitor_hourly_cells(events: DataFrame) -> DataFrame:
    """(hour, pna..pqb) exact-integer moment cells — the SUM-MERGEABLE
    state of the sequential monitor (all six cells are plain sums, so
    per-batch deltas re-aggregate exactly: the property the streaming
    twin streaming/monitor_stream.py builds on)."""
    cents = F.round(F.col("value") * F.lit(100.0), 0).cast("long")
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
            16, 10,
        ).cast("long") % 2
    )
    dec = "decimal(38,0)"
    return (
        events.select(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            arm.alias("arm"), cents.alias("c"),
        )
        .groupBy("hour")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast(dec).alias("pna"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast(dec).alias("pnb"),
            F.sum(F.when(F.col("arm") == 0, F.col("c")).otherwise(0)).cast(dec).alias("psa"),
            F.sum(F.when(F.col("arm") == 1, F.col("c")).otherwise(0)).cast(dec).alias("psb"),
            F.sum(F.when(F.col("arm") == 0,
                         F.col("c").cast(dec) * F.col("c")).otherwise(0)).alias("pqa"),
            F.sum(F.when(F.col("arm") == 1,
                         F.col("c").cast(dec) * F.col("c")).otherwise(0)).alias("pqb"),
        )
    )


def monitor_readout(hourly: DataFrame) -> DataFrame:
    """Cumulative z + OBF boundary + crossed flag over the hourly moment
    cells (see x6_sequential_monitor's docstring for the statistics)."""
    from pyspark.sql.window import Window

    # rollup-bounded cumulative window (~720 hourly rows)
    wc = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = hourly.select(
        "hour",
        *[F.sum(c).over(wc).alias(c) for c in
          ("pna", "pnb", "psa", "psb", "pqa", "pqb")],
        F.row_number().over(Window.orderBy("hour")).alias("t"),
        F.count(F.lit(1)).over(wall).alias("tt"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    va_n = (F.col("pna") * F.col("pqa") - F.col("psa") * F.col("psa")).cast("double")
    vb_n = (F.col("pnb") * F.col("pqb") - F.col("psb") * F.col("psb")).cast("double")
    na, nb = d("pna"), d("pnb")
    va = va_n / (na * F.nullif(na - 1.0, F.lit(0.0)))
    vb = vb_n / (nb * F.nullif(nb - 1.0, F.lit(0.0)))
    se = F.sqrt(
        F.nullif(va / na + vb / nb, F.lit(0.0))
    )
    z = (d("psb") / F.nullif(nb, F.lit(0.0))
         - d("psa") / F.nullif(na, F.lit(0.0))) / se
    boundary = F.lit(SEQ_OBF_C) / F.sqrt(
        F.col("t").cast("double") / F.col("tt").cast("double")
    )
    return cum.select(
        "hour",
        F.col("pna").cast("long").alias("n_a"),
        F.col("pnb").cast("long").alias("n_b"),
        z.alias("z"),
        boundary.alias("boundary"),
        F.coalesce(
            F.round(F.abs(z), 6) >= F.round(boundary, 6), F.lit(False)
        ).alias("crossed"),
    )


QUERIES["x6_sequential_monitor"] = x6_sequential_monitor

ORACLES["x6_sequential_monitor"] = f"""
    WITH e AS (
        SELECT date_trunc('hour', ts) AS hour,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 2 AS arm,
               CAST(round(value * 100) AS BIGINT) AS c
        FROM events
    ), hourly AS (
        SELECT hour,
               CAST(count(*) FILTER (arm = 0) AS HUGEINT) AS pna,
               CAST(count(*) FILTER (arm = 1) AS HUGEINT) AS pnb,
               CAST(coalesce(sum(c) FILTER (arm = 0), 0) AS HUGEINT) AS psa,
               CAST(coalesce(sum(c) FILTER (arm = 1), 0) AS HUGEINT) AS psb,
               CAST(coalesce(sum(CAST(c AS HUGEINT) * c) FILTER (arm = 0), 0)
                    AS HUGEINT) AS pqa,
               CAST(coalesce(sum(CAST(c AS HUGEINT) * c) FILTER (arm = 1), 0)
                    AS HUGEINT) AS pqb
        FROM e GROUP BY hour
    ), cum AS (
        SELECT hour,
               sum(pna) OVER w AS pna, sum(pnb) OVER w AS pnb,
               sum(psa) OVER w AS psa, sum(psb) OVER w AS psb,
               sum(pqa) OVER w AS pqa, sum(pqb) OVER w AS pqb,
               row_number() OVER (ORDER BY hour) AS t,
               count(*) OVER () AS tt
        FROM hourly
        WINDOW w AS (ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ), calc AS (
        SELECT hour, pna, pnb, t, tt,
               (CAST(psb AS DOUBLE) / nullif(CAST(pnb AS DOUBLE), 0)
                - CAST(psa AS DOUBLE) / nullif(CAST(pna AS DOUBLE), 0))
               / sqrt(nullif(
                   CAST(pna * pqa - psa * psa AS DOUBLE)
                     / (CAST(pna AS DOUBLE)
                        * nullif(CAST(pna AS DOUBLE) - 1.0, 0.0))
                     / CAST(pna AS DOUBLE)
                   + CAST(pnb * pqb - psb * psb AS DOUBLE)
                     / (CAST(pnb AS DOUBLE)
                        * nullif(CAST(pnb AS DOUBLE) - 1.0, 0.0))
                     / CAST(pnb AS DOUBLE), 0.0)) AS z,
               CAST({SEQ_OBF_C} AS DOUBLE)
                   / sqrt(CAST(t AS DOUBLE) / CAST(tt AS DOUBLE))
                   AS boundary
        FROM cum
    )
    SELECT hour, CAST(pna AS BIGINT) AS n_a, CAST(pnb AS BIGINT) AS n_b,
           z, boundary,
           coalesce(round(abs(z), 6) >= round(boundary, 6), false)
               AS crossed
    FROM calc
"""


SRM_ARMS = (("control", 0, 5, 0.5), ("t1", 5, 8, 0.3), ("t2", 8, 10, 0.2))
SRM_CHI2_CRIT = 5.991  # chi-square 0.05 critical value at df = 2


def x6_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check (Fabijan et al., KDD'19 "Diagnosing
    Sample Ratio Mismatch") — the first health gate every experimentation
    platform runs before reading ANY metric: does the observed user split
    match the intended 50/30/20 allocation? chi2 = sum over arms of
    (obs - n*w)^2 / (n*w), df = arms-1, flagged at the 0.05 critical
    value. Users bucket by a 'srm:'-salted md5 prefix mod 10 (engine-
    identical, independent of the x6_ab_test arm hash).

    TWO scenarios so both flag polarities are exercised (substrate-
    liveness, the x6_ab_test lesson): 'healthy' counts everyone (chi2
    small, srm false); 'broken' simulates one-sided logging loss — t2
    keeps only users with user_id % 3 = 0, a ~2/3 arm deficit (chi2
    grows linearly with n under a fixed fractional deficit, so the flag
    fires from sf0.01 up; at sf0.001's ~15 users it sits under the
    critical value — document, don't pretend). A flag that can only
    ever be false verifies nothing.

    Shape: one distinct-user rollup, then two constant-size conditional
    aggregates unioned — everything after the rollup is O(1). Exactness:
    obs and n are integers; expected = n * (w literal) and the chi2
    terms are fixed-shape double expressions, identical on both engines;
    the flag compares a 6-dp-rounded chi2 (round-before-boolean)."""
    events = load_table(spark, sf_dir, "events")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("srm:"), F.col("user_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long") % 10
    )
    users = events.select("user_id").distinct().select(
        F.col("user_id"), bucket.alias("bucket")
    )

    def _scenario(name: str, frame) -> DataFrame:
        obs = frame.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            *[
                F.sum(
                    F.when((F.col("bucket") >= lo) & (F.col("bucket") < hi), 1)
                    .otherwise(0)
                ).cast("long").alias(f"obs_{arm}")
                for arm, lo, hi, _w in SRM_ARMS
            ],
        )
        chi2 = None
        for arm, _lo, _hi, w in SRM_ARMS:
            exp = F.col("n").cast("double") * F.lit(w)
            dev = F.col(f"obs_{arm}").cast("double") - exp
            # explicit dev*dev, not pow(dev, 2): libm pow can differ from
            # the multiply by an ulp between engines
            term = dev * dev / exp
            chi2 = term if chi2 is None else chi2 + term
        return obs.select(
            F.lit(name).alias("scenario"),
            "n", "obs_control", "obs_t1", "obs_t2",
            chi2.alias("chi2"),
            (F.round(chi2, 6) > F.lit(SRM_CHI2_CRIT)).alias("srm"),
        )

    healthy = _scenario("healthy", users)
    broken = _scenario(
        "broken",
        users.filter((F.col("bucket") < 8) | (F.col("user_id") % 3 == 0)),
    )
    return healthy.unionByName(broken)


QUERIES["x6_srm_check"] = x6_srm_check

_SRM_SCEN_SQL = """
        SELECT '{name}' AS scenario,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN bucket >= 0 AND bucket < 5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS obs_control,
               CAST(sum(CASE WHEN bucket >= 5 AND bucket < 8 THEN 1 ELSE 0 END)
                    AS BIGINT) AS obs_t1,
               CAST(sum(CASE WHEN bucket >= 8 AND bucket < 10 THEN 1 ELSE 0 END)
                    AS BIGINT) AS obs_t2
        FROM users {where}"""

ORACLES["x6_srm_check"] = f"""
    WITH users AS (
        SELECT user_id,
               CAST(('0x' || substr(md5('srm:' || CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 10 AS bucket
        FROM (SELECT DISTINCT user_id FROM events)
    ), scen AS (
        {_SRM_SCEN_SQL.format(name="healthy", where="")}
        UNION ALL
        {_SRM_SCEN_SQL.format(
            name="broken",
            where="WHERE bucket < 8 OR user_id % 3 = 0")}
    ), calc AS (
        SELECT scenario, n, obs_control, obs_t1, obs_t2,
               (CAST(obs_control AS DOUBLE) - CAST(n AS DOUBLE) * CAST(0.5 AS DOUBLE))
               * (CAST(obs_control AS DOUBLE) - CAST(n AS DOUBLE) * CAST(0.5 AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(0.5 AS DOUBLE))
               + (CAST(obs_t1 AS DOUBLE) - CAST(n AS DOUBLE) * CAST(0.3 AS DOUBLE))
                 * (CAST(obs_t1 AS DOUBLE) - CAST(n AS DOUBLE) * CAST(0.3 AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(0.3 AS DOUBLE))
               + (CAST(obs_t2 AS DOUBLE) - CAST(n AS DOUBLE) * CAST(0.2 AS DOUBLE))
                 * (CAST(obs_t2 AS DOUBLE) - CAST(n AS DOUBLE) * CAST(0.2 AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(0.2 AS DOUBLE)) AS chi2
        FROM scen
    )
    SELECT scenario, n, obs_control, obs_t1, obs_t2, chi2,
           round(chi2, 6) > {SRM_CHI2_CRIT} AS srm
    FROM calc
"""


DID_SPLIT = "2024-01-16 00:00:00"  # fixed pre/post boundary (events span
                                   # Jan 2024 at every SF — FIXTURES.md)


def x6_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout (Card & Krueger, AER'94 design)
    over the 2x2 (treat x pre/post) grid — the quasi-experimental
    estimator for a launch without a randomized holdout: did the treated
    group's pre->post change exceed the control group's? treat = a
    'did:'-salted md5 parity of user_id; period = event ts before/after
    a FIXED mid-month boundary; unit of analysis = user-period total
    event value (cents).

    did = (m_t_post - m_t_pre) - (m_c_post - m_c_pre); SE via the
    four cells' sample variances (s^2/n summed, the unpooled form);
    t flagged at 1.96 on a 6-dp round. On this hash-split substrate the
    true effect is ~0 — the pin asserts LIVENESS (all four cells
    populated, finite nonzero t, positive se), not significance.

    EXACTNESS (the x6_cuped_adjust discipline): values cent-quantized,
    per-user-period sums are exact BIGINTs, cell moments (n, s, ss)
    accumulate in decimal(38,0)/HUGEINT via conditional sums in ONE
    1-row aggregate, so every mean/variance/t is a fixed-shape double
    expression over bit-identical operands. Shape: one (user, period)
    rollup, one constant-size fold — O(1) after the rollup at any
    scale."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * F.lit(100.0), 0).cast("long")
    # cast the boundary literal to ts's OWN type (timestamp_ntz on the
    # nanos-parquet path) — an implicit ntz<->instant coercion would shift
    # by the session time zone on a non-UTC driver session
    ts_type = dict(events.dtypes)["ts"]
    up = (
        events.groupBy(
            "user_id",
            (F.col("ts") >= F.lit(DID_SPLIT).cast(ts_type)).cast("int")
            .alias("post"),
        )
        .agg(F.sum(cents).alias("y"))
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("did:"),
                                       F.col("user_id").cast("string"))),
                        1, 8,
                    ),
                    16, 10,
                ).cast("long") % 2
            ).alias("treat"),
            "post", "y",
        )
    )
    dec = "decimal(38,0)"
    yd = F.col("y").cast(dec)
    cells = [(t, p) for t in (0, 1) for p in (0, 1)]
    m = up.agg(
        *[
            F.sum(F.when((F.col("treat") == t) & (F.col("post") == p), 1)
                  .otherwise(0)).cast("long").alias(f"n{t}{p}")
            for t, p in cells
        ],
        *[
            F.sum(F.when((F.col("treat") == t) & (F.col("post") == p), yd))
            .alias(f"s{t}{p}")
            for t, p in cells
        ],
        *[
            F.sum(F.when((F.col("treat") == t) & (F.col("post") == p), yd * yd))
            .alias(f"q{t}{p}")
            for t, p in cells
        ],
    )

    def _mean(t, p):
        return (
            F.col(f"s{t}{p}").cast("double")
            / F.nullif(F.col(f"n{t}{p}").cast("double"), F.lit(0.0))
            / F.lit(100.0)
        )

    def _var_over_n(t, p):
        n = F.col(f"n{t}{p}")
        num = (n.cast(dec) * F.col(f"q{t}{p}")
               - F.col(f"s{t}{p}") * F.col(f"s{t}{p}")).cast("double")
        return (
            num
            / (n.cast("double")
               * F.nullif(n.cast("double") - F.lit(1.0), F.lit(0.0)))
            / n.cast("double")
            / F.lit(10000.0)
        )

    did = (_mean(1, 1) - _mean(1, 0)) - (_mean(0, 1) - _mean(0, 0))
    se = F.sqrt(
        F.nullif(
            _var_over_n(1, 1) + _var_over_n(1, 0)
            + _var_over_n(0, 1) + _var_over_n(0, 0),
            F.lit(0.0),
        )
    )
    t_stat = did / se
    return m.select(
        "n00", "n01", "n10", "n11",
        _mean(0, 0).alias("m_c_pre"), _mean(0, 1).alias("m_c_post"),
        _mean(1, 0).alias("m_t_pre"), _mean(1, 1).alias("m_t_post"),
        did.alias("did"), se.alias("se"), t_stat.alias("t_stat"),
        (F.abs(F.round(t_stat, 6)) > F.lit(1.96)).alias("significant"),
    )


QUERIES["x6_diff_in_diff"] = x6_diff_in_diff

_DID_MEAN = ("CAST(s{t}{p} AS DOUBLE) / nullif(CAST(n{t}{p} AS DOUBLE), 0.0)"
             " / CAST(100.0 AS DOUBLE)")
_DID_VON = ("CAST(n{t}{p} * q{t}{p} - s{t}{p} * s{t}{p} AS DOUBLE)"
            " / (CAST(n{t}{p} AS DOUBLE)"
            "    * nullif(CAST(n{t}{p} AS DOUBLE) - 1.0, 0.0))"
            " / CAST(n{t}{p} AS DOUBLE) / CAST(10000.0 AS DOUBLE)")

ORACLES["x6_diff_in_diff"] = f"""
    WITH up AS (
        SELECT CAST(('0x' || substr(md5('did:' || CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 2 AS treat,
               CAST(ts >= TIMESTAMP '{DID_SPLIT}' AS INT) AS post,
               sum(CAST(round(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY user_id, CAST(ts >= TIMESTAMP '{DID_SPLIT}' AS INT)
    ), m AS (
        SELECT
            {", ".join(
                f"CAST(count(*) FILTER (treat = {t} AND post = {p}) AS BIGINT)"
                f" AS n{t}{p}" for t in (0, 1) for p in (0, 1))},
            {", ".join(
                f"sum(CAST(y AS HUGEINT)) FILTER (treat = {t} AND post = {p})"
                f" AS s{t}{p}" for t in (0, 1) for p in (0, 1))},
            {", ".join(
                f"sum(CAST(y AS HUGEINT) * y) FILTER (treat = {t} AND post = {p})"
                f" AS q{t}{p}" for t in (0, 1) for p in (0, 1))}
        FROM up
    ), calc AS (
        SELECT n00, n01, n10, n11,
               {_DID_MEAN.format(t=0, p=0)} AS m_c_pre,
               {_DID_MEAN.format(t=0, p=1)} AS m_c_post,
               {_DID_MEAN.format(t=1, p=0)} AS m_t_pre,
               {_DID_MEAN.format(t=1, p=1)} AS m_t_post,
               (({_DID_MEAN.format(t=1, p=1)}) - ({_DID_MEAN.format(t=1, p=0)}))
               - (({_DID_MEAN.format(t=0, p=1)}) - ({_DID_MEAN.format(t=0, p=0)}))
                   AS did,
               sqrt(nullif(
                   ({_DID_VON.format(t=1, p=1)}) + ({_DID_VON.format(t=1, p=0)})
                   + ({_DID_VON.format(t=0, p=1)}) + ({_DID_VON.format(t=0, p=0)}),
                   0.0)) AS se
        FROM m
    )
    SELECT n00, n01, n10, n11, m_c_pre, m_c_post, m_t_pre, m_t_post,
           did, se, did / se AS t_stat,
           abs(round(did / se, 6)) > 1.96 AS significant
    FROM calc
"""


def x6_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (Mann & Whitney, AMS'47) — the
    NONPARAMETRIC two-sample test the stats family was missing: compares
    per-user activity (event count) between the two hash arms without
    any normality assumption, the robust twin of x6_welch_ttest for
    skewed engagement metrics. Emits U, its null mean/sd with the tie
    correction, and the normal-approximation z (|z| > 1.96 flag on a
    6-dp round; no p-value — a cross-engine normal CDF is not
    bit-reproducible, z is).

    RANKS WITHOUT A CORPUS-SCALE WINDOW (the UNPART-WIN! discipline):
    the metric is a small-integer per-user count, so ranks are computed
    on its VALUE HISTOGRAM — one (value, n_a, n_b) aggregate, a
    cumulative window over the DISTINCT-VALUE table (bounded: values <=
    max events/user, allowlisted), midrank(v) = cum_less + (n_v+1)/2.
    U_a = sum n_a(v)*midrank(v) - n_a(n_a+1)/2. EXACTNESS: midranks are
    exact halves, products and sums stay exact in doubles far below
    2^53; the tie term sum(t^3 - t) accumulates in decimal(38,0)/
    HUGEINT (the cuped discipline); mu/sigma/z are fixed-shape double
    expressions over bit-identical operands."""
    events = load_table(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    ).select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("mw:"), F.col("user_id").cast("string"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long") % 2
        ).alias("arm"),
        "v",
    )
    hist = users.groupBy("v").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("na_v"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("nb_v"),
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.select(
        "v", "na_v", "nb_v",
        (F.col("na_v") + F.col("nb_v")).alias("t_v"),
        F.coalesce(
            F.sum(F.col("na_v") + F.col("nb_v")).over(w), F.lit(0)
        ).alias("cum_less"),
    )
    dec = "decimal(38,0)"
    td = F.col("t_v").cast(dec)
    agg = ranked.agg(
        F.sum("na_v").cast("long").alias("n_a"),
        F.sum("nb_v").cast("long").alias("n_b"),
        F.sum(
            F.col("na_v").cast("double")
            * (
                F.col("cum_less").cast("double")
                + (F.col("t_v").cast("double") + F.lit(1.0)) / F.lit(2.0)
            )
        ).alias("rank_sum_a"),
        F.sum(td * td * td - td).alias("tie_sum"),
    )
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    nn = n_a + n_b
    u_a = (
        F.col("rank_sum_a") - n_a * (n_a + F.lit(1.0)) / F.lit(2.0)
    )
    mu = n_a * n_b / F.lit(2.0)
    sigma = F.sqrt(
        F.nullif(
            n_a * n_b / F.lit(12.0)
            * (
                (nn + F.lit(1.0))
                - F.col("tie_sum").cast("double") / (nn * (nn - F.lit(1.0)))
            ),
            F.lit(0.0),
        )
    )
    z = (u_a - mu) / sigma
    return agg.select(
        "n_a", "n_b",
        u_a.alias("u_a"),
        mu.alias("mu_u"),
        sigma.alias("sigma_u"),
        z.alias("z_stat"),
        (F.abs(F.round(z, 6)) > F.lit(1.96)).alias("significant"),
    )


QUERIES["x6_mann_whitney"] = x6_mann_whitney

ORACLES["x6_mann_whitney"] = """
    WITH u AS (
        SELECT CAST(('0x' || substr(md5('mw:' || CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 2 AS arm,
               CAST(count(*) AS BIGINT) AS v
        FROM events GROUP BY user_id
    ), hist AS (
        SELECT v,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na_v,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb_v
        FROM u GROUP BY v
    ), ranked AS (
        SELECT v, na_v, nb_v, na_v + nb_v AS t_v,
               coalesce(sum(na_v + nb_v) OVER (
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS cum_less
        FROM hist
    ), agg AS (
        SELECT CAST(sum(na_v) AS BIGINT) AS n_a,
               CAST(sum(nb_v) AS BIGINT) AS n_b,
               sum(CAST(na_v AS DOUBLE)
                   * (CAST(cum_less AS DOUBLE)
                      + (CAST(t_v AS DOUBLE) + 1.0) / 2.0)) AS rank_sum_a,
               sum(CAST(t_v AS HUGEINT) * t_v * t_v - CAST(t_v AS HUGEINT))
                   AS tie_sum
        FROM ranked
    ), calc AS (
        SELECT n_a, n_b,
               rank_sum_a
               - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0) / 2.0 AS u_a,
               CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0 AS mu_u,
               sqrt(nullif(
                   CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                   * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
                      - CAST(tie_sum AS DOUBLE)
                        / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                           * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0))),
                   0.0)) AS sigma_u
        FROM agg
    )
    SELECT n_a, n_b, u_a, mu_u, sigma_u,
           (u_a - mu_u) / sigma_u AS z_stat,
           abs(round((u_a - mu_u) / sigma_u, 6)) > 1.96 AS significant
    FROM calc
"""


def x6_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across event types — the k-group generalization
    completing the test-statistic family (z, t, U, chi2 -> F): does mean
    event value differ across the bounded event-type alphabet? Emits
    sum-of-squares decomposition (between/within), the F statistic and
    eta-squared effect size; no p-value (an F CDF is not cross-engine
    bit-reproducible; F and the dfs are).

    EXACTNESS (the cuped/welch moment discipline): cents-quantized
    values, per-group (n, s, q) moments in decimal(38,0)/HUGEINT, group
    terms s_g^2/n_g computed as fixed-shape double divisions of exact
    integers, folded over the BOUNDED group table (summation-order ulps
    absorbed by the 9-sig verifier normalization). SS reported in
    value^2 units (cents^2 / 1e4).

    Shape: one map-side-combined group rollup to k rows + one k-row
    fold — O(1) after the scan at any scale."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * F.lit(100.0), 0).cast("long")
    dec = "decimal(38,0)"
    g = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(cents).cast(dec).alias("s"),
        F.sum(cents.cast(dec) * cents).alias("q"),
    )
    term = (F.col("s") * F.col("s")).cast("double") / F.col("n").cast("double")
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("n")).cast("long").alias("n"),
        F.sum(F.col("s")).alias("s_all"),
        F.sum(F.col("q").cast("double")).alias("q_all"),
        F.sum(term).alias("t_all"),
    )
    grand = (F.col("s_all") * F.col("s_all")).cast("double") / F.col("n").cast(
        "double"
    )
    ssb = (F.col("t_all") - grand) / F.lit(10000.0)
    ssw = (F.col("q_all") - F.col("t_all")) / F.lit(10000.0)
    df1 = (F.col("k") - 1).cast("double")
    df2 = (F.col("n") - F.col("k")).cast("double")
    f_stat = (ssb / F.nullif(df1, F.lit(0.0))) / F.nullif(
        ssw / F.nullif(df2, F.lit(0.0)), F.lit(0.0)
    )
    return tot.select(
        "k", "n",
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        f_stat.alias("f_stat"),
        (ssb / F.nullif(ssb + ssw, F.lit(0.0))).alias("eta_sq"),
    )


QUERIES["x6_anova_oneway"] = x6_anova_oneway

ORACLES["x6_anova_oneway"] = """
    WITH g AS (
        SELECT event_type,
               CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS s,
               sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
                   * CAST(round(value * 100) AS BIGINT)) AS q
        FROM events GROUP BY 1
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS n,
               sum(s) AS s_all,
               sum(CAST(q AS DOUBLE)) AS q_all,
               sum(CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)) AS t_all
        FROM g
    ), calc AS (
        SELECT k, n,
               (t_all - CAST(s_all * s_all AS DOUBLE) / CAST(n AS DOUBLE))
                   / CAST(10000.0 AS DOUBLE) AS ssb,
               (q_all - t_all) / CAST(10000.0 AS DOUBLE) AS ssw
        FROM tot
    )
    SELECT k, n, ssb AS ss_between, ssw AS ss_within,
           (ssb / nullif(CAST(k - 1 AS DOUBLE), 0.0))
           / nullif(ssw / nullif(CAST(n - k AS DOUBLE), 0.0), 0.0) AS f_stat,
           ssb / nullif(ssb + ssw, 0.0) AS eta_sq
    FROM calc
"""


POWER_MEANS_LIFTS = (0.02, 0.05, 0.10)  # candidate relative mean lifts
POWER_Z_A = 1.959964  # two-sided alpha 0.05
POWER_Z_B = 0.841621  # 80% power


def x6_power_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sizing for a CONTINUOUS metric — the means twin of
    x6_power_analysis (which sizes proportions): at the control arm's
    observed per-user revenue mean and variance, how many users per arm
    does each candidate relative lift need (two-sample normal
    approximation, n = 2 (z_a+z_b)^2 s^2 / delta^2, alpha 0.05
    two-sided / 80% power), is today's arm already big enough, and the
    minimum detectable relative lift at the current size. Same
    md5-parity split as the rest of the experiment kit.

    EXACTNESS: per-user cents totals, control-arm (n, s, q) moments in
    decimal(38,0)/HUGEINT, variance as the exact (n*q - s^2) integer
    cast once to double — every emitted number is a fixed-shape double
    expression over bit-identical operands; the achievable flag compares
    a 6-dp-rounded requirement (round-before-boolean). Degenerate zero
    mean or zero variance -> NULLs via nullif, honest rather than Inf.

    Shape: one distinct-user rollup, one 1-row moment fold, a bounded
    3-row lift grid cross join (the x6_power_analysis class,
    allowlisted)."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * F.lit(100.0), 0).cast("long")
    users = events.groupBy("user_id").agg(F.sum(cents).alias("y")).select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16, 10,
            ).cast("long") % 2
        ).alias("arm"),
        "y",
    )
    dec = "decimal(38,0)"
    yd = F.col("y").cast(dec)
    m = users.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n_c"),
        F.sum(F.when(F.col("arm") == 0, yd)).alias("s_c"),
        F.sum(F.when(F.col("arm") == 0, yd * yd)).alias("q_c"),
    )
    lifts = spark.createDataFrame(
        [(lift,) for lift in POWER_MEANS_LIFTS], "lift double"
    )
    g = m.crossJoin(F.broadcast(lifts))
    n = F.col("n_c").cast("double")
    mean_c = F.col("s_c").cast("double") / F.nullif(n, F.lit(0.0)) / F.lit(100.0)
    var_c = (
        (F.col("n_c").cast(dec) * F.col("q_c")
         - F.col("s_c") * F.col("s_c")).cast("double")
        / (n * F.nullif(n - F.lit(1.0), F.lit(0.0)))
        / F.lit(10000.0)
    )
    zsum = F.lit(POWER_Z_A + POWER_Z_B)
    delta = F.col("lift") * mean_c
    n_req = F.ceil(
        F.round(
            F.lit(2.0) * zsum * zsum * var_c
            / F.nullif(delta * delta, F.lit(0.0)),
            6,
        )
    ).cast("long")
    mde_rel = (
        zsum * F.sqrt(F.lit(2.0) * var_c / F.nullif(n, F.lit(0.0)))
        / F.nullif(mean_c, F.lit(0.0))
    )
    return g.select(
        "lift",
        F.col("n_c").alias("n_control"),
        mean_c.alias("mean_control"),
        var_c.alias("var_control"),
        n_req.alias("n_required"),
        (F.col("n_c") >= n_req).alias("achievable_now"),
        mde_rel.alias("mde_rel"),
    )


QUERIES["x6_power_means"] = x6_power_means

ORACLES["x6_power_means"] = f"""
    WITH u AS (
        SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 2 AS arm,
               sum(CAST(round(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY user_id
    ), m AS (
        SELECT CAST(count(*) FILTER (arm = 0) AS BIGINT) AS n_c,
               sum(CAST(y AS HUGEINT)) FILTER (arm = 0) AS s_c,
               sum(CAST(y AS HUGEINT) * y) FILTER (arm = 0) AS q_c
        FROM u
    ), lifts(lift) AS (VALUES {", ".join(
        f"(CAST({lift} AS DOUBLE))" for lift in POWER_MEANS_LIFTS)}),
    g AS (
        SELECT m.*, lifts.lift,
               CAST(s_c AS DOUBLE) / nullif(CAST(n_c AS DOUBLE), 0.0)
                   / CAST(100.0 AS DOUBLE) AS mean_c,
               CAST(n_c * q_c - s_c * s_c AS DOUBLE)
                   / (CAST(n_c AS DOUBLE)
                      * nullif(CAST(n_c AS DOUBLE) - 1.0, 0.0))
                   / CAST(10000.0 AS DOUBLE) AS var_c
        FROM m CROSS JOIN lifts
    )
    SELECT lift,
           n_c AS n_control,
           mean_c AS mean_control,
           var_c AS var_control,
           CAST(ceil(round(
               2.0 * {POWER_Z_A + POWER_Z_B!r} * {POWER_Z_A + POWER_Z_B!r}
               * var_c / nullif((lift * mean_c) * (lift * mean_c), 0.0),
               6)) AS BIGINT) AS n_required,
           n_c >= CAST(ceil(round(
               2.0 * {POWER_Z_A + POWER_Z_B!r} * {POWER_Z_A + POWER_Z_B!r}
               * var_c / nullif((lift * mean_c) * (lift * mean_c), 0.0),
               6)) AS BIGINT) AS achievable_now,
           {POWER_Z_A + POWER_Z_B!r}
           * sqrt(2.0 * var_c / nullif(CAST(n_c AS DOUBLE), 0.0))
           / nullif(mean_c, 0.0) AS mde_rel
    FROM g
"""


# ---------------------------------------------------------------------------
# X6 — Benjamini-Hochberg FDR across the per-metric test family
# ---------------------------------------------------------------------------

BH_ALPHA = 0.10
BH_LIFT_CENTS = 2000       # injected per-event treatment lift (20.00 units)
_INV_SQRT_2PI = 0.3989422804014327  # 1/sqrt(2*pi), shared literal


def x6_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-testing correction for an experiment's metric FAMILY —
    the readout that closes the x6 kit's loop: one z-test per
    event_type metric (the x6_ab_test hash-arm split) is fine alone,
    but a dashboard of m metrics at alpha each false-positives ~m*alpha
    of the time; Benjamini-Hochberg caps the FALSE DISCOVERY RATE
    instead. Emits, per metric: arm sizes/means, the Welch z, its
    two-sided p, BH rank and threshold (rank/m * alpha), the step-up
    REJECTED verdict, and the q-value (min over j >= rank of
    p_(j)*m/j — the smallest alpha at which this metric would reject).

    Scenario design (the x6_srm_check healthy+broken discipline): a
    deterministic treatment lift of BH_LIFT_CENTS is injected into
    arm 1 for the metrics whose md5 leading hex digit is even, so both
    verdicts are LIVE at every SF — lifted metrics reject, null metrics
    calibrate the threshold (liveness pinned in
    tests/test_liveness_pins.py).

    Exactness: outcomes are exact integer cents (the x6_welch_ttest
    scaled-integer discipline — decimal vs HUGEINT sums cast to double
    identically); z is one fixed-shape double expression over those
    bit-identical operands; Phi uses the Abramowitz-Stegun 7.1.26
    polynomial (max abs error 7.5e-8 — an APPROXIMATION, identical
    literal coefficients on both engines, documented rather than
    hidden); p is rounded to 6 dp BEFORE every ranking/threshold
    decision with event_type tie-breaks (round-before-decision). The
    exp() in the normal pdf is the one residual cross-engine 1-ulp
    surface — absorbed by the 6-dp decision rounding except on
    measure-zero boundary inputs (the lloyd_refined_centroids accepted
    residual class).

    Shape: one conditional aggregate over the scan (map-side combined)
    -> one m-row frame; every window after that runs over the bounded
    metric alphabet (BOUNDED_WINDOW_OK class). At 100 TB this is a
    metrics-dashboard query: scan once, correct the whole family."""
    ev = load_table(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
            16, 10,
        ).cast("long") % 2
    )
    lifted_type = (
        F.conv(F.substring(F.md5(F.col("event_type")), 1, 1), 16, 10)
        .cast("long") % 2 == 0
    )
    cents = (
        F.round(F.col("value") * F.lit(100.0), 0).cast("decimal(20,0)")
        + F.when((arm == 1) & lifted_type, F.lit(BH_LIFT_CENTS))
        .otherwise(F.lit(0)).cast("decimal(20,0)")
    )
    base = ev.select("event_type", arm.alias("arm"), cents.alias("c"))
    agg = base.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("c"))).alias("s0"),
        F.sum(F.when(F.col("arm") == 0, F.col("c") * F.col("c"))).alias("ss0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("c"))).alias("s1"),
        F.sum(F.when(F.col("arm") == 1, F.col("c") * F.col("c"))).alias("ss1"),
    )
    n0, n1 = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    s0, s1 = F.col("s0").cast("double"), F.col("s1").cast("double")
    ss0, ss1 = F.col("ss0").cast("double"), F.col("ss1").cast("double")
    m0, m1 = s0 / n0, s1 / n1
    v0 = (ss0 - s0 * s0 / n0) / (n0 - F.lit(1.0))
    v1 = (ss1 - s1 * s1 / n1) / (n1 - F.lit(1.0))
    # degenerate-arm guard (r11 ADVICE): an arm with n <= 1 rows (or two
    # zero-variance arms) divides by zero — Spark (non-ANSI) yields NULL
    # where DuckDB's IEEE ops yield inf/NaN, and a NULL p ranks FIRST in
    # Spark's ASC window but LAST under DuckDB's NULLS LAST, shifting
    # every rank/threshold/q downstream. Pin the degenerate case to the
    # no-evidence sentinel (z = 0, p = 1) on BOTH engines before the
    # rank window; unreachable on the contract substrate
    # (liveness-pinned), but the cross-engine surface is closed.
    se2 = v0 / n0 + v1 / n1
    degenerate = (
        (F.col("n_a") <= 1) | (F.col("n_b") <= 1) | ~(se2 > F.lit(0.0))
    )
    z = F.when(degenerate, F.lit(0.0)).otherwise((m1 - m0) / F.sqrt(se2))
    az = F.abs(z)
    # Abramowitz-Stegun 7.1.26 upper-tail polynomial
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * az)
    poly = (
        t * (F.lit(0.319381530)
             + t * (F.lit(-0.356563782)
                    + t * (F.lit(1.781477937)
                           + t * (F.lit(-1.821255978)
                                  + t * F.lit(1.330274429)))))
    )
    pdf = F.lit(_INV_SQRT_2PI) * F.exp(-az * az / F.lit(2.0))
    p6 = F.round(F.lit(2.0) * pdf * poly, 6)
    scored = agg.select(
        "event_type", "n_a", "n_b",
        F.round(m0 / F.lit(100.0), 6).alias("mean_a"),
        F.round(m1 / F.lit(100.0), 6).alias("mean_b"),
        F.round(z, 6).alias("z"),
        p6.alias("p"),
    )
    from pyspark.sql.window import Window

    w_rank = Window.orderBy(F.col("p").asc(), F.col("event_type").asc())
    w_all = Window.partitionBy()
    ranked = scored.withColumn(
        "rank", F.row_number().over(w_rank).cast("long")
    ).withColumn("m", F.count(F.lit(1)).over(w_all))
    thr = F.round(
        F.col("rank").cast("double") / F.col("m").cast("double")
        * F.lit(BH_ALPHA), 6,
    )
    hit = F.col("p") <= thr
    kstar = F.max(F.when(hit, F.col("rank"))).over(w_all)
    w_tail = (
        Window.orderBy(F.col("rank").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    q = F.round(
        F.min(
            F.least(
                F.col("p") * F.col("m").cast("double")
                / F.col("rank").cast("double"),
                F.lit(1.0),
            )
        ).over(w_tail), 6,
    )
    return ranked.select(
        "event_type", "n_a", "n_b", "mean_a", "mean_b", "z", "p",
        "rank",
        thr.alias("bh_thresh"),
        q.alias("q_value"),
        (F.col("rank") <= F.coalesce(kstar, F.lit(0))).alias("rejected"),
    )


QUERIES["x6_bh_fdr"] = x6_bh_fdr

ORACLES["x6_bh_fdr"] = f"""
    WITH base AS (
        SELECT event_type,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 2 AS arm,
               CAST(round(value * 100) AS HUGEINT)
               + (CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                             AS BIGINT) % 2 = 1
                        AND CAST(('0x' || substr(md5(event_type), 1, 1))
                                 AS BIGINT) % 2 = 0
                       THEN {BH_LIFT_CENTS} ELSE 0 END) AS c
        FROM events
    ), agg AS (
        SELECT event_type,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               sum(CASE WHEN arm = 0 THEN c END) AS s0,
               sum(CASE WHEN arm = 0 THEN c * c END) AS ss0,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               sum(CASE WHEN arm = 1 THEN c END) AS s1,
               sum(CASE WHEN arm = 1 THEN c * c END) AS ss1
        FROM base GROUP BY 1
    ), zc AS (
        SELECT event_type, n_a, n_b,
               CAST(s0 AS DOUBLE) / CAST(n_a AS DOUBLE) AS m0,
               CAST(s1 AS DOUBLE) / CAST(n_b AS DOUBLE) AS m1,
               (CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
                    / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0) AS v0,
               (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                    / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0) AS v1
        FROM agg
    ), zz AS (
        -- degenerate-arm guard mirroring the engine: n <= 1 in either
        -- arm or a non-positive variance sum pins z to the no-evidence
        -- sentinel 0.0 (p then computes to 1.0 identically on both
        -- engines from the same polynomial at z = 0)
        SELECT event_type, n_a, n_b, m0, m1,
               CASE WHEN n_a <= 1 OR n_b <= 1
                         OR NOT (v0 / CAST(n_a AS DOUBLE)
                                 + v1 / CAST(n_b AS DOUBLE) > 0.0)
                    THEN 0.0
                    ELSE (m1 - m0) / sqrt(v0 / CAST(n_a AS DOUBLE)
                                          + v1 / CAST(n_b AS DOUBLE)) END AS z
        FROM zc
    ), pp AS (
        SELECT event_type, n_a, n_b, m0, m1, z,
               round(2.0 * {_INV_SQRT_2PI!r} * exp(-abs(z) * abs(z) / 2.0)
                 * ((1.0 / (1.0 + 0.2316419 * abs(z)))
                    * (0.319381530
                       + (1.0 / (1.0 + 0.2316419 * abs(z)))
                       * (-0.356563782
                          + (1.0 / (1.0 + 0.2316419 * abs(z)))
                          * (1.781477937
                             + (1.0 / (1.0 + 0.2316419 * abs(z)))
                             * (-1.821255978
                                + (1.0 / (1.0 + 0.2316419 * abs(z)))
                                * 1.330274429))))), 6) AS p
        FROM zz
    ), ranked AS (
        SELECT event_type, n_a, n_b, m0, m1, z, p,
               CAST(row_number() OVER (ORDER BY p ASC, event_type ASC)
                    AS BIGINT) AS rank,
               count(*) OVER () AS m
        FROM pp
    ), marked AS (
        SELECT *,
               round(CAST(rank AS DOUBLE) / CAST(m AS DOUBLE)
                     * {BH_ALPHA}, 6) AS bh_thresh,
               max(CASE WHEN p <= round(CAST(rank AS DOUBLE)
                                        / CAST(m AS DOUBLE)
                                        * {BH_ALPHA}, 6)
                        THEN rank END) OVER () AS kstar,
               round(min(least(p * CAST(m AS DOUBLE) / CAST(rank AS DOUBLE),
                               1.0)) OVER (
                   ORDER BY rank DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                   AS q_value
        FROM ranked
    )
    SELECT event_type, n_a, n_b,
           round(m0 / 100.0, 6) AS mean_a,
           round(m1 / 100.0, 6) AS mean_b,
           round(z, 6) AS z,
           p, rank, bh_thresh, q_value,
           rank <= coalesce(kstar, 0) AS rejected
    FROM marked
"""


# ---------------------------------------------------------------------------
# X6 — TOST equivalence (round 12 widening)
# ---------------------------------------------------------------------------

TOST_MARGIN_CENTS = 2000   # equivalence margin delta (20.00 units)
TOST_SHIFT_CENTS = 4000    # scenario 'shifted': injected arm-1 lift = 2*delta
TOST_ZCRIT = 1.644854      # one-sided alpha = 0.05 critical value


def x6_tost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two One-Sided Tests equivalence readout — the experiment question
    the z/t kit cannot answer: 'did this change NOT move the metric by
    more than delta?' (non-inferiority / do-no-harm launches; Schuirmann
    1987). Per (scenario, event_type): both one-sided Welch z statistics
    against the +/-delta bounds and the equivalence verdict (reject both
    one-sided nulls: z_lower > z_crit AND z_upper < -z_crit).

    Scenario pair built in (the x6_srm_check discipline): scenario
    'null' splits identically-distributed arms — equivalent at the
    contract margin; scenario 'shifted' injects a 2*delta arm-1 lift —
    z_upper lands at ~+delta/se, decisively NOT equivalent. Both
    verdicts are live at every pinned SF (tests/test_liveness_pins.py).

    Exactness: the x6_welch_ttest scaled-integer discipline (exact
    decimal/HUGEINT cent sums cast to double identically); z's are 6-dp
    rounded BEFORE the verdict comparison (round-before-decision); the
    x6_bh_fdr degenerate-arm guard pins n<=1 / zero-variance cells to
    z = 0 (never equivalent) on both engines. Shape: one conditional
    aggregate per scenario over the scan (map-side combined) -> bounded
    metric-alphabet rows; at 100 TB this is a scan-once dashboard query."""
    ev = load_table(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
            16, 10,
        ).cast("long") % 2
    )
    base_cents = F.round(F.col("value") * F.lit(100.0), 0).cast("decimal(20,0)")
    rows = []
    for scen, shift in (("null", 0), ("shifted", TOST_SHIFT_CENTS)):
        cents = base_cents + F.when(arm == 1, F.lit(shift)).otherwise(
            F.lit(0)
        ).cast("decimal(20,0)")
        b = ev.select("event_type", arm.alias("arm"), cents.alias("c"))
        agg = b.groupBy("event_type").agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
            F.sum(F.when(F.col("arm") == 0, F.col("c"))).alias("s0"),
            F.sum(F.when(F.col("arm") == 0, F.col("c") * F.col("c"))).alias("ss0"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
            F.sum(F.when(F.col("arm") == 1, F.col("c"))).alias("s1"),
            F.sum(F.when(F.col("arm") == 1, F.col("c") * F.col("c"))).alias("ss1"),
        )
        rows.append(agg.select(F.lit(scen).alias("scenario"), "*"))
    both = rows[0].unionByName(rows[1])
    n0, n1 = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    s0, s1 = F.col("s0").cast("double"), F.col("s1").cast("double")
    ss0, ss1 = F.col("ss0").cast("double"), F.col("ss1").cast("double")
    m0, m1 = s0 / n0, s1 / n1
    v0 = (ss0 - s0 * s0 / n0) / (n0 - F.lit(1.0))
    v1 = (ss1 - s1 * s1 / n1) / (n1 - F.lit(1.0))
    se2 = v0 / n0 + v1 / n1
    degenerate = (
        (F.col("n_a") <= 1) | (F.col("n_b") <= 1) | ~(se2 > F.lit(0.0))
    )
    diff = m1 - m0
    se = F.sqrt(se2)
    zl = F.when(degenerate, F.lit(0.0)).otherwise(
        (diff + F.lit(float(TOST_MARGIN_CENTS))) / se
    )
    zu = F.when(degenerate, F.lit(0.0)).otherwise(
        (diff - F.lit(float(TOST_MARGIN_CENTS))) / se
    )
    zl6, zu6 = F.round(zl, 6), F.round(zu, 6)
    return both.select(
        "scenario", "event_type", "n_a", "n_b",
        F.round(diff / F.lit(100.0), 6).alias("diff"),
        F.round(se / F.lit(100.0), 6).alias("se"),
        zl6.alias("z_lower"),
        zu6.alias("z_upper"),
        (
            (zl6 > F.lit(TOST_ZCRIT)) & (zu6 < F.lit(-TOST_ZCRIT))
        ).alias("equivalent"),
    )


QUERIES["x6_tost"] = x6_tost

_TOST_SCEN_SQL = """
        SELECT '{scen}' AS scenario, event_type,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               sum(CASE WHEN arm = 0 THEN c END) AS s0,
               sum(CASE WHEN arm = 0 THEN c * c END) AS ss0,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               sum(CASE WHEN arm = 1 THEN c END) AS s1,
               sum(CASE WHEN arm = 1 THEN c * c END) AS ss1
        FROM (
            SELECT event_type,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 2 AS arm,
                   CAST(round(value * 100) AS HUGEINT)
                   + (CASE WHEN CAST(('0x' || substr(md5(CAST(user_id
                                 AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 1
                           THEN {shift} ELSE 0 END) AS c
            FROM events
        ) GROUP BY 2"""

ORACLES["x6_tost"] = f"""
    WITH agg AS ({_TOST_SCEN_SQL.format(scen="null", shift=0)}
        UNION ALL{_TOST_SCEN_SQL.format(scen="shifted",
                                        shift=TOST_SHIFT_CENTS)}
    ), zc AS (
        SELECT scenario, event_type, n_a, n_b,
               CAST(s1 AS DOUBLE) / CAST(n_b AS DOUBLE)
               - CAST(s0 AS DOUBLE) / CAST(n_a AS DOUBLE) AS diff,
               (CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
                    / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)
                   / CAST(n_a AS DOUBLE)
               + (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                    / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)
                   / CAST(n_b AS DOUBLE) AS se2
        FROM agg
    ), zz AS (
        SELECT scenario, event_type, n_a, n_b, diff, sqrt(se2) AS se,
               CASE WHEN n_a <= 1 OR n_b <= 1 OR NOT (se2 > 0.0) THEN 0.0
                    ELSE (diff + CAST({TOST_MARGIN_CENTS} AS DOUBLE))
                         / sqrt(se2) END AS zl,
               CASE WHEN n_a <= 1 OR n_b <= 1 OR NOT (se2 > 0.0) THEN 0.0
                    ELSE (diff - CAST({TOST_MARGIN_CENTS} AS DOUBLE))
                         / sqrt(se2) END AS zu
        FROM zc
    )
    SELECT scenario, event_type, n_a, n_b,
           round(diff / 100.0, 6) AS diff,
           round(se / 100.0, 6) AS se,
           round(zl, 6) AS z_lower,
           round(zu, 6) AS z_upper,
           round(zl, 6) > CAST({TOST_ZCRIT} AS DOUBLE)
               AND round(zu, 6) < -CAST({TOST_ZCRIT} AS DOUBLE)
               AS equivalent
    FROM zz
"""


# ---------------------------------------------------------------------------
# X6 — split-conformal prediction interval + coverage audit (round 13)
# ---------------------------------------------------------------------------

CONF_ALPHA = 0.1  # nominal miscoverage: the 90% interval


def x6_conformal_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for token count given n_chars,
    with its held-out coverage audit — the distribution-free uncertainty
    primitive (Vovk et al.; Lei et al. JASA'18) a data pipeline uses to
    turn ANY point model into calibrated bounds (e.g. "predicted tokens
    ± q̂" for budget planning) without distributional assumptions.

    Recipe: deterministic split (even doc_id = calibration, odd = test);
    fit OLS tokens ~ n_chars on calibration (regr_slope/intercept, 6-dp
    rounded so both engines share exact coefficients); conformity score =
    |y - ŷ| (6-dp rounded, bit-identical fixed-shape arithmetic on
    integer-derived inputs); q̂ = the exact interpolated 1-alpha quantile
    of calibration scores (Spark `percentile` == DuckDB `quantile_cont`,
    the x6_quantiles pairing; the finite-sample (n+1)/n correction is
    absorbed into the audit, which is the point of the query); coverage =
    share of TEST docs with score <= q̂ — valid iff ~>= 1 - alpha.

    Liveness: coverage strictly inside (0, 1) and near 0.9 at every SF
    (tests/test_liveness_pins.py); the interval is informative (q̂ far
    below the score range's top).

    Shape: two corpus scans folded to 1-row aggregates chained by
    bounded 1-row broadcasts (BNLJ-bounded-ok class); the exact
    calibration percentile is the test-scale form (EXACT_PERCENTILE_OK —
    the GK-sketch `approx_percentile` swap gives approximately-valid
    conformal at 100 TB, same schema).

    Reference parity: none (§2.9 stats extension)."""
    from swiftbulkuploader_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("x"),
        token_count(F.col("text")).cast("double").alias("y"),
        (F.col("doc_id") % 2 == 0).alias("is_cal"),
    )
    fit = base.filter("is_cal").agg(
        F.round(F.regr_slope(F.col("y"), F.col("x")), 6).alias("slope"),
        F.round(F.regr_intercept(F.col("y"), F.col("x")), 6)
        .alias("intercept"),
        F.count(F.lit(1)).cast("long").alias("n_cal"),
    )
    scored = base.crossJoin(F.broadcast(fit)).withColumn(
        "res",
        F.round(
            F.abs(
                F.col("y") - F.col("intercept") - F.col("slope") * F.col("x")
            ), 6,
        ),
    )
    qrow = scored.filter("is_cal").agg(
        F.round(
            F.expr(f"percentile(res, {1.0 - CONF_ALPHA!r}D)"), 6
        ).alias("q_hat")
    )
    return (
        scored.filter(~F.col("is_cal"))
        .crossJoin(F.broadcast(qrow))
        .agg(
            F.max("n_cal").alias("n_cal"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.max("slope").alias("slope"),
            F.max("intercept").alias("intercept"),
            F.max("q_hat").alias("q_hat"),
            F.round(
                F.avg((F.col("res") <= F.col("q_hat")).cast("double")), 6
            ).alias("coverage"),
        )
    )


QUERIES["x6_conformal_bounds"] = x6_conformal_bounds

from swiftbulkuploader_spark.operators.oracle_fragments import (  # noqa: E402
    TOKENS_DUCK as _TOKENS_DUCK,
)

ORACLES["x6_conformal_bounds"] = f"""
    WITH d AS (
        SELECT doc_id,
               CAST(n_chars AS DOUBLE) AS x,
               CAST({_TOKENS_DUCK} AS DOUBLE) AS y,
               doc_id % 2 = 0 AS is_cal
        FROM documents
    ), fit AS (
        SELECT round(regr_slope(y, x), 6) AS slope,
               round(regr_intercept(y, x), 6) AS intercept,
               CAST(count(*) AS BIGINT) AS n_cal
        FROM d WHERE is_cal
    ), scored AS (
        SELECT d.doc_id, d.is_cal,
               round(abs(d.y - fit.intercept - fit.slope * d.x), 6) AS res
        FROM d, fit
    ), q AS (
        SELECT round(quantile_cont(res, CAST({1.0 - CONF_ALPHA} AS DOUBLE)), 6)
                   AS q_hat
        FROM scored WHERE is_cal
    )
    SELECT fit.n_cal,
           CAST(count(*) AS BIGINT) AS n_test,
           fit.slope, fit.intercept, q.q_hat,
           round(avg(CASE WHEN res <= q.q_hat THEN CAST(1.0 AS DOUBLE)
                          ELSE CAST(0.0 AS DOUBLE) END), 6) AS coverage
    FROM scored, fit, q
    WHERE NOT is_cal
    GROUP BY fit.n_cal, fit.slope, fit.intercept, q.q_hat
"""


# ---------------------------------------------------------------------------
# X6 — confounding adjustment via direct standardization (round 13)
# ---------------------------------------------------------------------------

CFD_GAP_THRESH = 20000.0  # dollars; the confounded scenario's gap sits at
                          # ~78-80k and the randomized one at <=1.7k at
                          # every SF (measured sf0.001/0.01/0.1) — an
                          # order of magnitude clear on both sides.


def x6_adjusted_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confounding-adjusted treatment effect via direct standardization
    (Cochran, Biometrics'68 "The effectiveness of adjustment by
    subclassification"; the Simpson's-paradox guard every observational
    readout needs): compare the CRUDE arm difference in mean per-order
    revenue against the STRATUM-ADJUSTED difference, where the stratum
    is order size (few = <=3 lineitems vs many) — a variable that
    genuinely drives per-order revenue (~122k vs ~284k mean at sf0.01,
    compositional structure, not injected).

    TWO scenarios so both flag polarities are exercised (the
    x6_srm_check discipline): 'randomized' assigns arms by a
    'cfd:'-salted md5 parity (independent of stratum — crude ~=
    adjusted, gap <=1.7k at every SF, flag false); 'confounded'
    simulates a selection-biased rollout that over-samples many-line
    orders into treatment (75%/25% by the same hash's mod-4 value) —
    the crude estimate inflates to ~+79k while the adjusted estimate
    stays ~0, so gap = crude - adjusted fires the flag. adjusted =
    sum over strata of (n_s/n) * (mean_t,s - mean_c,s), standardized
    to the total population.

    EXACTNESS (the x6_diff_in_diff discipline): revenue cent-quantized
    to exact BIGINTs, all 24 cell moments (both scenarios) accumulate
    via conditional decimal(38,0) sums in ONE 1-row aggregate, and
    every mean/gap is a fixed-shape double expression over
    bit-identical operands, 6-dp rounded before the boolean.

    Shape: one narrow rollup shuffle on l_orderkey, then a single
    constant-size fold; the two output rows explode from the 1-row
    frame (no second scan, no union re-execution) — O(1) after the
    rollup at any scale.

    Reference parity: none (§2.9 stats extension)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * F.lit(100.0), 0).cast("long")
    orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(cents).alias("y"), F.count(F.lit(1)).alias("nl"))
        .select(
            F.col("y"),
            (F.col("nl") <= 3).cast("int").alias("few"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("cfd:"),
                                F.col("l_orderkey").cast("string"),
                            )
                        ),
                        1, 8,
                    ),
                    16, 10,
                ).cast("long") % 4
            ).alias("h4"),
        )
        .select(
            "y", "few",
            (F.col("h4") % 2).cast("int").alias("arm_r"),
            F.when(
                ((F.col("few") == 0) & (F.col("h4") < 3))
                | ((F.col("few") == 1) & (F.col("h4") < 1)),
                1,
            ).otherwise(0).alias("arm_c"),
        )
    )

    return adjusted_effect_cells(orders)


def adjusted_effect_cells(
    orders: DataFrame, thresh: float = CFD_GAP_THRESH
) -> DataFrame:
    """Core of x6_adjusted_effect, factored for crafted-fixture tests:
    `orders` carries (y: long cents, few: int, arm_r: int, arm_c: int);
    returns the 2-row (confounded, randomized) scenario readout. All 24
    cell moments fold in ONE constant-size aggregate; the two output
    rows explode from the 1-row frame."""
    dec = "decimal(38,0)"

    def _cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    def _s(cond):
        return F.sum(F.when(cond, F.col("y")).otherwise(0).cast(dec))

    aggs = []
    for p, armc in (("r", "arm_r"), ("c", "arm_c")):
        a1, a0 = F.col(armc) == 1, F.col(armc) == 0
        f1, f0 = F.col("few") == 1, F.col("few") == 0
        aggs += [
            _cnt(a1).alias(f"{p}_nt"), _cnt(a0).alias(f"{p}_nc"),
            _cnt(a1 & f1).alias(f"{p}_nt1"), _cnt(a0 & f1).alias(f"{p}_nc1"),
            _cnt(a1 & f0).alias(f"{p}_nt0"), _cnt(a0 & f0).alias(f"{p}_nc0"),
            _s(a1).alias(f"{p}_st"), _s(a0).alias(f"{p}_sc"),
            _s(a1 & f1).alias(f"{p}_st1"), _s(a0 & f1).alias(f"{p}_sc1"),
            _s(a1 & f0).alias(f"{p}_st0"), _s(a0 & f0).alias(f"{p}_sc0"),
        ]
    row = orders.agg(*aggs)

    def _d(name):
        return F.col(name).cast("double")

    def _scenario_struct(label, p):
        crude = F.round(
            (_d(f"{p}_st") / _d(f"{p}_nt") - _d(f"{p}_sc") / _d(f"{p}_nc"))
            / F.lit(100.0),
            6,
        )
        adjusted = F.round(
            (
                (_d(f"{p}_nt1") + _d(f"{p}_nc1"))
                / (_d(f"{p}_nt") + _d(f"{p}_nc"))
                * (_d(f"{p}_st1") / _d(f"{p}_nt1")
                   - _d(f"{p}_sc1") / _d(f"{p}_nc1"))
                + (_d(f"{p}_nt0") + _d(f"{p}_nc0"))
                / (_d(f"{p}_nt") + _d(f"{p}_nc"))
                * (_d(f"{p}_st0") / _d(f"{p}_nt0")
                   - _d(f"{p}_sc0") / _d(f"{p}_nc0"))
            )
            / F.lit(100.0),
            6,
        )
        gap = F.round(crude - adjusted, 6)
        return F.struct(
            F.lit(label).alias("scenario"),
            F.col(f"{p}_nt").alias("n_treat"),
            F.col(f"{p}_nc").alias("n_control"),
            crude.alias("crude_effect"),
            adjusted.alias("adjusted_effect"),
            gap.alias("confound_gap"),
            (F.abs(gap) > F.lit(float(thresh))).alias("confounded"),
        )

    return (
        row.select(
            F.explode(
                F.array(
                    _scenario_struct("confounded", "c"),
                    _scenario_struct("randomized", "r"),
                )
            ).alias("s")
        )
        .select("s.*")
        .orderBy("scenario")
    )


QUERIES["x6_adjusted_effect"] = x6_adjusted_effect

_CFD_SCEN_SQL = """
        SELECT '{label}' AS scenario,
               CAST({p}_nt AS BIGINT) AS n_treat,
               CAST({p}_nc AS BIGINT) AS n_control,
               round((CAST({p}_st AS DOUBLE) / CAST({p}_nt AS DOUBLE)
                      - CAST({p}_sc AS DOUBLE) / CAST({p}_nc AS DOUBLE))
                     / CAST(100.0 AS DOUBLE), 6) AS crude_effect,
               round(((CAST({p}_nt1 AS DOUBLE) + CAST({p}_nc1 AS DOUBLE))
                      / (CAST({p}_nt AS DOUBLE) + CAST({p}_nc AS DOUBLE))
                      * (CAST({p}_st1 AS DOUBLE) / CAST({p}_nt1 AS DOUBLE)
                         - CAST({p}_sc1 AS DOUBLE) / CAST({p}_nc1 AS DOUBLE))
                      + (CAST({p}_nt0 AS DOUBLE) + CAST({p}_nc0 AS DOUBLE))
                        / (CAST({p}_nt AS DOUBLE) + CAST({p}_nc AS DOUBLE))
                        * (CAST({p}_st0 AS DOUBLE) / CAST({p}_nt0 AS DOUBLE)
                           - CAST({p}_sc0 AS DOUBLE) / CAST({p}_nc0 AS DOUBLE)))
                     / CAST(100.0 AS DOUBLE), 6) AS adjusted_effect
        FROM cells"""

ORACLES["x6_adjusted_effect"] = f"""
    WITH orders AS (
        SELECT CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT))
                    AS BIGINT) AS y,
               CASE WHEN count(*) <= 3 THEN 1 ELSE 0 END AS few,
               CAST(('0x' || substr(md5('cfd:' || CAST(l_orderkey AS VARCHAR)),
                                    1, 8)) AS BIGINT) % 4 AS h4
        FROM lineitem GROUP BY l_orderkey
    ), arms AS (
        SELECT y, few,
               h4 % 2 AS arm_r,
               CASE WHEN (few = 0 AND h4 < 3) OR (few = 1 AND h4 < 1)
                    THEN 1 ELSE 0 END AS arm_c
        FROM orders
    ), cells AS (
        SELECT
            sum(CASE WHEN arm_r = 1 THEN 1 ELSE 0 END) AS r_nt,
            sum(CASE WHEN arm_r = 0 THEN 1 ELSE 0 END) AS r_nc,
            sum(CASE WHEN arm_r = 1 AND few = 1 THEN 1 ELSE 0 END) AS r_nt1,
            sum(CASE WHEN arm_r = 0 AND few = 1 THEN 1 ELSE 0 END) AS r_nc1,
            sum(CASE WHEN arm_r = 1 AND few = 0 THEN 1 ELSE 0 END) AS r_nt0,
            sum(CASE WHEN arm_r = 0 AND few = 0 THEN 1 ELSE 0 END) AS r_nc0,
            sum(CASE WHEN arm_r = 1 THEN y ELSE 0 END) AS r_st,
            sum(CASE WHEN arm_r = 0 THEN y ELSE 0 END) AS r_sc,
            sum(CASE WHEN arm_r = 1 AND few = 1 THEN y ELSE 0 END) AS r_st1,
            sum(CASE WHEN arm_r = 0 AND few = 1 THEN y ELSE 0 END) AS r_sc1,
            sum(CASE WHEN arm_r = 1 AND few = 0 THEN y ELSE 0 END) AS r_st0,
            sum(CASE WHEN arm_r = 0 AND few = 0 THEN y ELSE 0 END) AS r_sc0,
            sum(CASE WHEN arm_c = 1 THEN 1 ELSE 0 END) AS c_nt,
            sum(CASE WHEN arm_c = 0 THEN 1 ELSE 0 END) AS c_nc,
            sum(CASE WHEN arm_c = 1 AND few = 1 THEN 1 ELSE 0 END) AS c_nt1,
            sum(CASE WHEN arm_c = 0 AND few = 1 THEN 1 ELSE 0 END) AS c_nc1,
            sum(CASE WHEN arm_c = 1 AND few = 0 THEN 1 ELSE 0 END) AS c_nt0,
            sum(CASE WHEN arm_c = 0 AND few = 0 THEN 1 ELSE 0 END) AS c_nc0,
            sum(CASE WHEN arm_c = 1 THEN y ELSE 0 END) AS c_st,
            sum(CASE WHEN arm_c = 0 THEN y ELSE 0 END) AS c_sc,
            sum(CASE WHEN arm_c = 1 AND few = 1 THEN y ELSE 0 END) AS c_st1,
            sum(CASE WHEN arm_c = 0 AND few = 1 THEN y ELSE 0 END) AS c_sc1,
            sum(CASE WHEN arm_c = 1 AND few = 0 THEN y ELSE 0 END) AS c_st0,
            sum(CASE WHEN arm_c = 0 AND few = 0 THEN y ELSE 0 END) AS c_sc0
        FROM arms
    ), scen AS (
        {_CFD_SCEN_SQL.format(label="confounded", p="c")}
        UNION ALL
        {_CFD_SCEN_SQL.format(label="randomized", p="r")}
    )
    SELECT scenario, n_treat, n_control, crude_effect, adjusted_effect,
           round(crude_effect - adjusted_effect, 6) AS confound_gap,
           abs(round(crude_effect - adjusted_effect, 6))
               > CAST({CFD_GAP_THRESH!r} AS DOUBLE) AS confounded
    FROM scen ORDER BY scenario
"""
