"""Dataset profiling operators (SURVEY.md §2.9 X6): distinct counts,
quantiles, and their approximate scale-friendly variants.

Exact versions are oracle-checked; `approx_count_distinct` (HyperLogLog++)
and `percentile_approx` (Greenwald-Khanna) are engine-specific sketches, so
they ship as rows-only queries — at 100 TB the approx variants are the ones
you actually run (single pass, bounded memory, mergeable partial state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from swiftbulkuploader_spark.catalog import load_table
from swiftbulkuploader_spark.plans.layout import spread


def x6_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cardinality profile of the fact table's key columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_returnflag").alias("n_flags"),
    )


def x6_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of quantity/price (Spark `percentile`
    == DuckDB `quantile_cont`).

    One percentile state per column (array form), not one per requested
    quantile, and `spread()` so the per-partition state build parallelizes
    past the single-row-group scan split. Width 8, not full parallelism:
    exact-percentile partial state is a value->count map over near-unique
    doubles, so the final single-threaded merge cost grows with partition
    count — 8 measured fastest (0.99s vs 1.44s@1 / 1.10s@32 at sf0.1)."""
    li = spread(load_table(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice"), 8)
    return li.agg(
        F.expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").alias("qty_ps"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.99))").alias("price_ps"),
    ).select(
        F.round(F.element_at("qty_ps", 1), 6).alias("qty_p25"),
        F.round(F.element_at("qty_ps", 2), 6).alias("qty_p50"),
        F.round(F.element_at("qty_ps", 3), 6).alias("qty_p75"),
        F.round(F.element_at("price_ps", 1), 6).alias("price_p50"),
        F.round(F.element_at("price_ps", 2), 6).alias("price_p99"),
    )


# GK accuracy=10000 bounds rank error at n/10000; 2% relative value
# tolerance (floored at 1.0 absolute for near-zero metrics) is comfortably
# above the sketch's worst observed deviation yet tight enough that a broken
# sketch hash-mismatches the oracle.
GK_REL_TOL = 0.02
# approx_count_distinct(rsd=0.01): 3-sigma error ~3%; 5% is the fail line.
HLL_REL_TOL = 0.05


def approx_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure 100 TB scale path: GK `percentile_approx` sketches (single
    pass, bounded memory, mergeable partials) with the SAME output schema as
    `x6_quantiles`, so a caller can swap the exact plan for the sketch plan
    without schema churn. Not a contract query (sketch output is
    engine-specific) — the oracled contract form is `x6_quantiles_approx`,
    which runs this sketch against its exact twin and emits
    engine-independent tolerance rows. bench.py times THIS function so the
    exact-vs-sketch cost comparison stays pure."""
    li = load_table(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    acc = 10000
    return li.agg(
        F.percentile_approx("l_quantity", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), acc).alias("qty_ps"),
        F.percentile_approx("l_extendedprice", F.array(F.lit(0.5), F.lit(0.99)), acc).alias("price_ps"),
    ).select(
        F.round(F.element_at("qty_ps", 1), 6).alias("qty_p25"),
        F.round(F.element_at("qty_ps", 2), 6).alias("qty_p50"),
        F.round(F.element_at("qty_ps", 3), 6).alias("qty_p75"),
        F.round(F.element_at("price_ps", 1), 6).alias("price_p50"),
        F.round(F.element_at("price_ps", 2), 6).alias("price_p99"),
    )


def x6_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable GK sketch validation: one agg computes BOTH the
    exact interpolated percentiles and the GK `percentile_approx` sketches,
    then emits one row per metric as (metric, exact_value, within_tol).
    The exact value and the boolean are engine-independent — DuckDB
    reproduces `exact_value` with `quantile_cont` and `within_tol` as a
    literal TRUE — so a healthy sketch hash-matches and an out-of-tolerance
    sketch fails the oracle loudly instead of hiding behind rows-only.
    The sketch-only scale plan is `approx_quantiles_sketch`."""
    li = load_table(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    agg = spread(li, 8).agg(
        F.expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").alias("eq"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.99))").alias("ep"),
        F.percentile_approx("l_quantity", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), 10000).alias("aq"),
        F.percentile_approx("l_extendedprice", F.array(F.lit(0.5), F.lit(0.99)), 10000).alias("ap"),
    )
    rows = agg.select(F.expr(
        "stack(5, "
        "'qty_p25', eq[0], CAST(aq[0] AS DOUBLE), "
        "'qty_p50', eq[1], CAST(aq[1] AS DOUBLE), "
        "'qty_p75', eq[2], CAST(aq[2] AS DOUBLE), "
        "'price_p50', ep[0], CAST(ap[0] AS DOUBLE), "
        "'price_p99', ep[1], CAST(ap[1] AS DOUBLE)) AS (metric, ev, av)"
    ))
    tol = F.lit(GK_REL_TOL) * F.greatest(F.abs(F.col("ev")), F.lit(1.0))
    return rows.select(
        "metric",
        F.round("ev", 6).alias("exact_value"),
        (F.abs(F.col("av") - F.col("ev")) <= tol).alias("within_tol"),
    )


def x6_approx_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct + GK quantile sketches validated against their exact
    twins in one pass, emitted as engine-independent tolerance rows
    (metric, exact_value, within_tol) so the driver's DuckDB oracle can
    hash-check it. At 100 TB you run only the sketch half (single pass,
    mergeable, bounded memory); the exact half here is the check harness
    that makes the sketch auditable at test scale."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.countDistinct("l_orderkey").alias("eo"),
        F.countDistinct("l_partkey").alias("ep_"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("ao"),
        F.approx_count_distinct("l_partkey", 0.01).alias("ap_"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("ep50"),
        F.expr("percentile(l_quantity, 0.95)").alias("eq95"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("ap50"),
        F.percentile_approx("l_quantity", 0.95, 10000).alias("aq95"),
    )
    rows = agg.select(F.expr(
        "stack(4, "
        "'n_orders', CAST(eo AS DOUBLE), CAST(ao AS DOUBLE), 'hll', "
        "'n_parts', CAST(ep_ AS DOUBLE), CAST(ap_ AS DOUBLE), 'hll', "
        "'price_p50', ep50, CAST(ap50 AS DOUBLE), 'gk', "
        "'qty_p95', eq95, CAST(aq95 AS DOUBLE), 'gk') "
        "AS (metric, ev, av, sketch)"
    ))
    rel = F.when(F.col("sketch") == "hll", F.lit(HLL_REL_TOL)).otherwise(F.lit(GK_REL_TOL))
    tol = rel * F.greatest(F.abs(F.col("ev")), F.lit(1.0))
    return rows.select(
        "metric",
        F.round("ev", 6).alias("exact_value"),
        (F.abs(F.col("av") - F.col("ev")) <= tol).alias("within_tol"),
    )


def x6_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact percentiles (quantity quartiles by return flag) —
    grouped aggregate state, partial+final merge per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").alias("ps"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("ps", 1), 6).alias("q25"),
            F.round(F.element_at("ps", 2), 6).alias("q50"),
            F.round(F.element_at("ps", 3), 6).alias("q75"),
            "n",
        )
    )


def x6_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/16 sample: last hex digit of md5(text) == '7'.
    Unlike TABLESAMPLE/rand(seed) (engine-specific RNG), a content-hash
    sample is reproducible across engines and runs — the property a
    train/eval split actually needs."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.substring(F.md5("text"), 32, 1) == "7").select(
        "doc_id", "lang", "n_chars"
    )


def x6_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch profiling (Apache DataSketches HLL): one sketch of
    distinct order keys per return flag, then the GLOBAL cardinality from
    `hll_union_agg` over the per-group sketches — without re-reading data.

    This re-aggregation property is the whole point at 100 TB: per-partition
    (per-day, per-source) sketches are built once at ingest and any rollup
    (weekly, global, cross-source) is a cheap union of kilobyte sketches.
    `approx_count_distinct` answers one question; a stored sketch answers
    every future grouping of it.

    Oracle-checkable form: each row carries the exact per-flag distinct
    count plus booleans asserting the per-group estimate AND the unioned
    global estimate land within tolerance of their exact twins — all
    engine-independent values, so DuckDB hash-checks it (exact counts +
    literal TRUEs). Sketch internals stay Spark-side; only their
    within-tolerance verdict crosses the oracle boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    # exact GLOBAL distinct: 1-row agg, broadcast-attached (order keys
    # overlap across flags, so it is not derivable from the per-flag rows)
    exact_global = li.agg(F.countDistinct("l_orderkey").alias("eg"))
    # global sketch = union over the (3-row) per-group sketch table: a
    # window over the whole frame, not a re-scan of lineitem
    wall = Window.partitionBy(F.lit(1))
    est = per_flag.select(
        "l_returnflag",
        "n_rows",
        "exact_orders",
        F.hll_sketch_estimate("sk").alias("est"),
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(wall)).alias("est_g"),
    ).join(F.broadcast(exact_global))
    return est.select(
        "l_returnflag",
        "n_rows",
        "exact_orders",
        (F.abs(F.col("est") - F.col("exact_orders"))
         <= F.lit(HLL_REL_TOL) * F.col("exact_orders")).alias("est_ok"),
        (F.abs(F.col("est_g") - F.col("eg"))
         <= F.lit(HLL_REL_TOL) * F.col("eg")).alias("global_ok"),
    )


def x6_median_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median() (= continuous p50) and discrete percentiles (percentile
    within ties to an ACTUAL data value, no interpolation) per return flag —
    the disc/cont distinction matters for integer-coded columns where an
    interpolated 2.5 is not a value the column can take."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.median("l_quantity"), 6).alias("qty_median"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)")
             .alias("qty_p50_disc"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)")
             .alias("qty_p90_disc"),
        )
    )


def x5_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form cube/rollup specialize:
    exactly the (status), (priority), and () grand-total groupings, no
    cross combinations (half the aggregate rows a CUBE would compute)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_orders_gs")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


def x5_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: the distinct priorities seen per order
    status as one sorted comma-joined string. collect_set is unordered by
    contract — array_sort pins it (same determinism rule as
    x5_order_lists); DuckDB's string_agg(DISTINCT ... ORDER BY) is the
    direct equivalent."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), ","
            ).alias("priorities"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
    )


def x6_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified train/eval split: within every language,
    route docs by content hash — ~8/16 train, ~2/16 eval, rest held out.
    Content-hash routing (vs rand(seed)) is reproducible across engines,
    runs, AND cluster sizes — repartitioning cannot move a doc between
    splits. Per-lang counts verify the stratification."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5("text"), 32, 1), 16, 10).cast("int")
    split = (
        F.when(bucket < 8, "train").when(bucket < 10, "eval").otherwise("holdout")
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def x5_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping() indicators: distinguishes "NULL because
    subtotal row" from "NULL in the data" — required for correct rollup
    consumption (the cube/rollup family's missing piece)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


N_HIST_BINS = 20


def x6_equiwidth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals with data-driven bounds: one
    pass for min/max, broadcast the 1-row bounds to every partition (a
    broadcast join, not a driver round-trip), then a groupBy over the
    computed bin. Bin edges are identical IEEE doubles on both engines, so
    the binning — including boundary values — is hash-exact. Empty bins are
    absent (observed-bins semantics). At 100 TB the bounds pass is the part
    you replace with approx quantile bounds; the binning pass is unchanged."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("vmin"), F.max("o_totalprice").alias("vmax")
    )
    width = (F.col("vmax") - F.col("vmin")) / F.lit(float(N_HIST_BINS))
    # scalar broadcast: a BroadcastNestedLoop join against a 1-row build
    # side is O(n) — it is the plan you want for attaching global constants
    # nullif guards the degenerate vmax == vmin input (width 0): ANSI Spark
    # would raise DIVIDE_BY_ZERO; instead everything lands in bin 0
    binned = orders.join(F.broadcast(bounds)).select(
        F.least(
            F.coalesce(
                F.floor(
                    (F.col("o_totalprice") - F.col("vmin"))
                    / F.nullif(width, F.lit(0.0))
                ),
                F.lit(0).cast("long"),
            ),
            F.lit(N_HIST_BINS - 1).cast("long"),
        )
        .cast("long")
        .alias("bin"),
        F.col("vmin"),
        width.alias("w"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.first("vmin").alias("vmin"),
            F.first("w").alias("w"),
            F.count("*").alias("cnt"),
        )
        .select(
            "bin",
            F.round(F.col("vmin") + F.col("bin") * F.col("w"), 6).alias("lo"),
            F.round(F.col("vmin") + (F.col("bin") + 1) * F.col("w"), 6).alias("hi"),
            "cnt",
        )
    )


def x6_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit — the dbt-test / Deequ-style constraint suite a
    production table ships with, run as a handful of cheap scans:

    * uniqueness  — key cardinality vs row count (one agg, no self-join);
    * not-null    — conditional count in the same style;
    * referential — child LEFT JOIN distinct parent keys, counting
      null-parent rows and total rows in the same aggregate (parent side
      broadcast only when it is a dim table);
    * domain      — predicate violation count at scan speed.

    One row per check: (check, violations, n_checked, passed). The checks
    union into one plan, so a nightly audit of N constraints is one job.
    At 100 TB each check is either a single-pass aggregate or one
    broadcast anti-join — nothing quadratic, nothing driver-side."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    def check(name, violations_df):
        return violations_df.select(
            F.lit(name).alias("check"),
            F.col("violations").cast("long").alias("violations"),
            F.col("n_checked").cast("long").alias("n_checked"),
            (F.col("violations") == 0).alias("passed"),
        )

    unique_key = orders.agg(
        (F.count("o_orderkey") - F.countDistinct("o_orderkey")).alias("violations"),
        F.count(F.lit(1)).alias("n_checked"),
    )
    not_null = orders.agg(
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("violations"),
        F.count(F.lit(1)).alias("n_checked"),
    )
    positive_price = orders.agg(
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("violations"),
        F.count(F.lit(1)).alias("n_checked"),
    )
    # referential checks as LEFT JOIN + conditional count: violations and
    # n_checked come out of ONE pass (no eager .count() jobs at plan-build
    # time). The parent side is broadcast only when it IS a dim table
    # (customer); orders-as-parent is a fact table, so that join is left to
    # Catalyst/AQE — forcing a broadcast there would fail outright at the
    # 100 TB scale this audit claims.
    orphan_li = (
        lineitem.select(F.col("l_orderkey"))
        .join(
            orders.select("o_orderkey").distinct(),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .agg(
            F.sum(F.col("o_orderkey").isNull().cast("long")).alias("violations"),
            F.count(F.lit(1)).alias("n_checked"),
        )
    )
    orphan_cust = (
        orders.select("o_custkey")
        .join(
            F.broadcast(customer.select("c_custkey").distinct()),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .agg(
            F.sum(F.col("c_custkey").isNull().cast("long")).alias("violations"),
            F.count(F.lit(1)).alias("n_checked"),
        )
    )
    return (
        check("orders.o_orderkey.unique", unique_key)
        .unionByName(check("orders.o_custkey.not_null", not_null))
        .unionByName(check("orders.o_totalprice.positive", positive_price))
        .unionByName(check("lineitem.l_orderkey.referential", orphan_li))
        .unionByName(check("orders.o_custkey.referential", orphan_cust))
    )


def x6_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit analysis of order totals — the classic
    fraud/synthetic-data screen: naturally-occurring multiplicative amounts
    follow P(d) = log10(1 + 1/d); fabricated or uniformly-generated values
    don't. One row per leading digit with observed vs expected share and
    the chi-square contribution.

    The leading digit is extracted from a FIXED-FORMAT string
    (printf '%.2f') rather than float log10 math: double->string casts
    differ across engines, but C-style printf is byte-identical, so the
    digit — and therefore the whole distribution — is oracle-exact. Single
    scan + 9-group aggregate; trivially scale-safe."""
    orders = load_table(spark, sf_dir, "orders")
    n_total = orders.count()  # metadata-scale; inlined as a literal
    digit = F.substring(F.format_string("%.2f", F.col("o_totalprice")), 1, 1)
    # >= 1, not > 0: a value in (0,1) has leading digit '0', whose
    # expected_share log10(1 + 1/0) is Infinity in Spark but NULL in DuckDB
    # — degenerate inputs must be excluded identically on both sides
    per = (
        orders.filter(F.col("o_totalprice") >= 1)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    observed = F.col("n") / F.lit(float(n_total))
    return per.select(
        "digit",
        "n",
        expected.alias("expected_share"),
        observed.alias("observed_share"),
        (
            F.pow(observed - expected, F.lit(2.0)) / expected * F.lit(float(n_total))
        ).alias("chi2_term"),
    )


def x6_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy per categorical column (order status/priority) —
    the information-content profile a data-quality monitor tracks: a
    collapsing entropy means a column is degenerating (constant fill,
    upstream default), a jump means schema/semantic drift. Normalized
    entropy (H / ln k) is scale-free across columns with different
    cardinalities (NULL when k = 1 — a constant column has no basis).

    One scan: both columns explode to (col, val) rows via a struct array,
    then a two-level aggregate (per-value counts -> per-column entropy);
    the shuffle carries one row per distinct (col, val), map-side
    combined. Summation-order ulps absorbed by the 9-sig-digit hash."""
    orders = load_table(spark, sf_dir, "orders")
    pairs = orders.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("o_orderstatus").alias("col"),
                    F.col("o_orderstatus").alias("val"),
                ),
                F.struct(
                    F.lit("o_orderpriority").alias("col"),
                    F.col("o_orderpriority").alias("val"),
                ),
            )
        ).alias("p")
    ).select("p.col", "p.val")
    per = pairs.groupBy("col", "val").agg(F.count(F.lit(1)).alias("c"))
    tot = per.groupBy("col").agg(
        F.sum("c").cast("double").alias("n"), F.count(F.lit(1)).alias("nd")
    )
    p = F.col("c") / F.col("n")
    ent = (
        per.join(F.broadcast(tot), "col")
        .groupBy("col")
        .agg(F.min("nd").alias("nd"), (-F.sum(p * F.log(p))).alias("entropy"))
    )
    return ent.select(
        "col",
        F.col("nd").cast("long").alias("n_distinct"),
        "entropy",
        (
            F.col("entropy")
            / F.nullif(F.log(F.col("nd").cast("double")), F.lit(0.0))
        ).alias("norm_entropy"),
    )


def x6_outlier_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier profile per group: Q1/Q3 of extended price per
    return flag, 1.5*IQR fences, and how many rows fall outside — the
    standard anomaly screen a data-quality monitor runs per partition.

    Two passes (quantile pass -> 3-row broadcast of the fences -> counting
    pass); at 100 TB the quantile pass swaps to the GK sketch exactly like
    the dataset card (same output schema, fences unchanged in form).
    Fences round to 6 dp BEFORE the per-row comparison (round-before-
    boolean, CLAUDE.md rule 3): prices carry 2 decimals, so a 6-dp fence
    cannot flip a row across engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    q = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.25, 0.75))").alias("ps")
    )
    q1, q3 = F.element_at("ps", 1), F.element_at("ps", 2)
    fences = q.select(
        "l_returnflag",
        F.round(q1 - F.lit(1.5) * (q3 - q1), 6).alias("lo"),
        F.round(q3 + F.lit(1.5) * (q3 - q1), 6).alias("hi"),
    )
    joined = li.join(F.broadcast(fences), "l_returnflag")
    out = (F.col("l_extendedprice") < F.col("lo")) | (
        F.col("l_extendedprice") > F.col("hi")
    )
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("lo").alias("lo"),
        F.min("hi").alias("hi"),
        F.sum(out.cast("long")).alias("n_outliers"),
        (F.sum(out.cast("long")) / F.count(F.lit(1))).alias("outlier_rate"),
    )


QUERIES = {
    "x6_outlier_profile": x6_outlier_profile,
    "x6_entropy_profile": x6_entropy_profile,
    "x6_dq_audit": x6_dq_audit,
    "x6_benford_digits": x6_benford_digits,
    "x6_equiwidth_histogram": x6_equiwidth_histogram,
    "x6_hll_mergeable": x6_hll_mergeable,
    "x6_median_disc": x6_median_disc,
    "x5_grouping_sets": x5_grouping_sets,
    "x5_string_agg": x5_string_agg,
    "x6_stratified_split": x6_stratified_split,
    "x5_grouping_id": x5_grouping_id,
    "x6_distinct_profile": x6_distinct_profile,
    "x6_quantiles": x6_quantiles,
    "x6_quantiles_approx": x6_quantiles_approx,
    "x6_group_quantiles": x6_group_quantiles,
    "x6_deterministic_sample": x6_deterministic_sample,
    "x6_approx_profile": x6_approx_profile,
}

ORACLES = {
    # fences rounded to 6 dp before the row comparison on both sides;
    # 2-decimal prices can't straddle a 6-dp fence ulp
    "x6_outlier_profile": """
        WITH q AS (
            SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.25)
                         - CAST(1.5 AS DOUBLE)
                           * (quantile_cont(l_extendedprice, 0.75)
                              - quantile_cont(l_extendedprice, 0.25)), 6) AS lo,
                   round(quantile_cont(l_extendedprice, 0.75)
                         + CAST(1.5 AS DOUBLE)
                           * (quantile_cont(l_extendedprice, 0.75)
                              - quantile_cont(l_extendedprice, 0.25)), 6) AS hi
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT li.l_returnflag,
               CAST(count(*) AS BIGINT) AS n_rows,
               min(lo) AS lo,
               min(hi) AS hi,
               CAST(sum(CASE WHEN l_extendedprice < lo
                               OR l_extendedprice > hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers,
               sum(CASE WHEN l_extendedprice < lo
                          OR l_extendedprice > hi THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE) AS outlier_rate
        FROM lineitem li JOIN q USING (l_returnflag)
        GROUP BY li.l_returnflag
    """,
    # same two-level aggregate; entropy sums' order ulps absorbed by the
    # 9-sig normalization; norm_entropy NULL for constant columns both ways
    "x6_entropy_profile": """
        WITH u AS (
            SELECT 'o_orderstatus' AS col, o_orderstatus AS val FROM orders
            UNION ALL
            SELECT 'o_orderpriority' AS col, o_orderpriority AS val FROM orders
        ), per AS (
            SELECT col, val, count(*) AS c FROM u GROUP BY col, val
        ), tot AS (
            SELECT col, CAST(sum(c) AS DOUBLE) AS n, count(*) AS nd
            FROM per GROUP BY col
        ), ent AS (
            SELECT per.col, min(nd) AS nd,
                   -sum((c / n) * ln(c / n)) AS entropy
            FROM per JOIN tot USING (col)
            GROUP BY per.col
        )
        SELECT col,
               CAST(nd AS BIGINT) AS n_distinct,
               entropy,
               entropy / nullif(ln(CAST(nd AS DOUBLE)), CAST(0 AS DOUBLE))
                   AS norm_entropy
        FROM ent
    """,
    # n_total is the unfiltered row count (all totals are >= 1 in the data;
    # the filter guards the engine against degenerate inputs — (0,1) values
    # would yield digit '0' and an Inf-vs-NULL expected_share divergence —
    # the share denominator matches Spark's driver literal)
    "x6_benford_digits": """
        WITH per AS (
            SELECT substr(printf('%.2f', o_totalprice), 1, 1) AS digit,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders WHERE o_totalprice >= 1
            GROUP BY 1
        ), nn AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_total FROM orders
        )
        SELECT digit, n,
               log10(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(digit AS DOUBLE)) AS expected_share,
               n / nn.n_total AS observed_share,
               pow(n / nn.n_total
                   - log10(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(digit AS DOUBLE)), 2)
                 / log10(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(digit AS DOUBLE))
                 * nn.n_total AS chi2_term
        FROM per, nn
    """,
    "x6_dq_audit": """
        SELECT 'orders.o_orderkey.unique' AS "check",
               CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) AS violations,
               CAST(count(*) AS BIGINT) AS n_checked,
               count(o_orderkey) = count(DISTINCT o_orderkey) AS passed
        FROM orders
        UNION ALL
        SELECT 'orders.o_custkey.not_null',
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(*) AS BIGINT),
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'orders.o_totalprice.positive',
               CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(*) AS BIGINT),
               sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'lineitem.l_orderkey.referential',
               CAST((SELECT count(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
               CAST((SELECT count(*) FROM lineitem) AS BIGINT),
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)) = 0
        UNION ALL
        SELECT 'orders.o_custkey.referential',
               CAST((SELECT count(*) FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
               CAST((SELECT count(*) FROM orders) AS BIGINT),
               (SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey)) = 0
    """,
    "x6_equiwidth_histogram": """
        WITH b AS (
            SELECT min(o_totalprice) AS vmin, max(o_totalprice) AS vmax
            FROM orders
        ), binned AS (
            SELECT CAST(least(coalesce(floor((o_totalprice - vmin)
                                    / nullif((vmax - vmin) / 20.0, 0)), 0), 19)
                        AS BIGINT) AS bin,
                   vmin, (vmax - vmin) / 20.0 AS w
            FROM orders CROSS JOIN b
        )
        SELECT bin,
               round(min(vmin) + bin * min(w), 6) AS lo,
               round(min(vmin) + (bin + 1) * min(w), 6) AS hi,
               CAST(count(*) AS BIGINT) AS cnt
        FROM binned GROUP BY bin
    """,
    "x5_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "x5_string_agg": """
        SELECT o_orderstatus,
               string_agg(DISTINCT o_orderpriority, ','
                          ORDER BY o_orderpriority) AS priorities,
               count(DISTINCT o_orderpriority) AS n_priorities
        FROM orders GROUP BY o_orderstatus
    """,
    "x6_median_disc": """
        SELECT l_returnflag,
               round(median(l_quantity), 6) AS qty_median,
               quantile_disc(l_quantity, 0.5) AS qty_p50_disc,
               quantile_disc(l_quantity, 0.9) AS qty_p90_disc
        FROM lineitem GROUP BY l_returnflag
    """,
    "x6_stratified_split": """
        SELECT lang,
               CASE WHEN strpos('0123456789abcdef', substr(md5(text), 32, 1)) - 1 < 8
                    THEN 'train'
                    WHEN strpos('0123456789abcdef', substr(md5(text), 32, 1)) - 1 < 10
                    THEN 'eval'
                    ELSE 'holdout' END AS split,
               count(*) AS n_docs
        FROM documents GROUP BY 1, 2
    """,
    "x5_grouping_id": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "x6_distinct_profile": """
        SELECT count(DISTINCT l_orderkey) AS n_orders,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps,
               count(DISTINCT l_returnflag) AS n_flags
        FROM lineitem
    """,
    "x6_quantiles": """
        SELECT round(quantile_cont(l_quantity, 0.25), 6) AS qty_p25,
               round(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
               round(quantile_cont(l_quantity, 0.75), 6) AS qty_p75,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS price_p50,
               round(quantile_cont(l_extendedprice, 0.99), 6) AS price_p99
        FROM lineitem
    """,
    "x6_group_quantiles": """
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.25), 6) AS q25,
               round(quantile_cont(l_quantity, 0.5), 6) AS q50,
               round(quantile_cont(l_quantity, 0.75), 6) AS q75,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    "x6_deterministic_sample": """
        SELECT doc_id, lang, n_chars FROM documents
        WHERE substr(md5(text), 32, 1) = '7'
    """,
    # Tolerance-row oracles: the Spark side emits (metric, exact_value,
    # within_tol); DuckDB reproduces the exact value and asserts the
    # boolean is TRUE — so a sketch drifting out of tolerance is a hash
    # MISMATCH, not an untestable rows-only row.
    "x6_quantiles_approx": """
        WITH e AS (
            SELECT quantile_cont(l_quantity, 0.25) AS q25,
                   quantile_cont(l_quantity, 0.5)  AS q50,
                   quantile_cont(l_quantity, 0.75) AS q75,
                   quantile_cont(l_extendedprice, 0.5)  AS p50,
                   quantile_cont(l_extendedprice, 0.99) AS p99
            FROM lineitem
        )
        SELECT 'qty_p25' AS metric, round(q25, 6) AS exact_value, TRUE AS within_tol FROM e
        UNION ALL SELECT 'qty_p50', round(q50, 6), TRUE FROM e
        UNION ALL SELECT 'qty_p75', round(q75, 6), TRUE FROM e
        UNION ALL SELECT 'price_p50', round(p50, 6), TRUE FROM e
        UNION ALL SELECT 'price_p99', round(p99, 6), TRUE FROM e
    """,
    "x6_approx_profile": """
        WITH e AS (
            SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS o,
                   CAST(count(DISTINCT l_partkey) AS DOUBLE) AS p,
                   quantile_cont(l_extendedprice, 0.5) AS p50,
                   quantile_cont(l_quantity, 0.95) AS q95
            FROM lineitem
        )
        SELECT 'n_orders' AS metric, round(o, 6) AS exact_value, TRUE AS within_tol FROM e
        UNION ALL SELECT 'n_parts', round(p, 6), TRUE FROM e
        UNION ALL SELECT 'price_p50', round(p50, 6), TRUE FROM e
        UNION ALL SELECT 'qty_p95', round(q95, 6), TRUE FROM e
    """,
    "x6_hll_mergeable": """
        SELECT l_returnflag,
               count(*) AS n_rows,
               count(DISTINCT l_orderkey) AS exact_orders,
               TRUE AS est_ok,
               TRUE AS global_ok
        FROM lineitem GROUP BY l_returnflag
    """,
}


CM_DEPTH = 4
CM_WIDTH = 1024
CM_TOPN = 10


def x6_countmin_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation (Cormode & Muthukrishnan
    2005) over the corpus token stream, validated in place against exact
    counts: build the d=4 x w=1024 sketch, then read back estimates for
    the exact top-10 tokens and report the (always >= 0) overestimate.

    Why it earns a slot next to HLL/GK/approx_top_k: CM is the MERGEABLE
    fixed-size answer to "how often does token X occur in 100 TB" — the
    sketch is d*w counters regardless of corpus size, partial aggregation
    builds it map-side (cell counts are plain sums), and two shards' maps
    merge by addition. The estimate min_j(cell[j][h_j(x)]) only ever
    OVER-counts (collisions add), which the overestimate column exhibits.

    Determinism + oracle: row hashes are the engine-replayable md5-prefix
    family h_j(t) = int(md5(j || ':' || t)[:8]) % w (the DSIR/CDC gear);
    everything downstream is integer, so the DuckDB replay is hash-exact
    (no tolerance rows needed — unlike the library HLL/GK sketches, this
    sketch IS engine-reproducible).

    Shape: one token explode fanned x4 (one row per hash function), ONE
    map-side-combined groupBy to the <= d*w-row sketch, exact top-10 via
    the same explode + TakeOrdered, then a broadcast join of the 10-row
    probe set against the bounded sketch. At 100 TB the only corpus-sized
    stage is the token scan; every shuffle output is bounded by d*w."""
    from swiftbulkuploader_spark.functions.text import normalize_ws

    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(normalize_ws(F.col("text")))
    toks = (
        spread(docs)
        .filter(F.length(F.trim(norm)) > 0)
        .select(F.explode(F.split(norm, " ")).alias("t"))
    )
    cells = toks.select(
        "t",
        F.explode(F.sequence(F.lit(0), F.lit(CM_DEPTH - 1))).alias("j"),
    ).select(
        "j",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("t"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long")
            % CM_WIDTH
        ).alias("pos"),
    )
    sketch = cells.groupBy("j", "pos").agg(F.count(F.lit(1)).alias("c"))
    exact = (
        toks.groupBy("t").agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("t").asc())
        .limit(CM_TOPN)
    )
    probes = exact.select(
        "t", "exact_n",
        F.explode(F.sequence(F.lit(0), F.lit(CM_DEPTH - 1))).alias("j"),
    ).select(
        "t", "exact_n", "j",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("t"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long")
            % CM_WIDTH
        ).alias("pos"),
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "pos"])  # bounded: <= d*w rows
        .groupBy("t", "exact_n")
        .agg(F.min("c").alias("cm_est"))
        .select(
            F.col("t").alias("token"),
            "exact_n",
            "cm_est",
            (F.col("cm_est") - F.col("exact_n")).alias("overestimate"),
        )
    )


QUERIES["x6_countmin_est"] = x6_countmin_est

_CM_HASH = ("CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || t), 1, 8))"
            f" AS BIGINT) % {CM_WIDTH}")

ORACLES["x6_countmin_est"] = f"""
    WITH toks AS (
        SELECT unnest(string_split(trim(regexp_replace(lower(text),
                   '\\s+', ' ', 'g')), ' ')) AS t
        FROM documents
        WHERE length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) > 0
    ), cells AS (
        SELECT {_CM_HASH} AS pos, j
        FROM toks, unnest(range(0, {CM_DEPTH})) AS u(j)
    ), sketch AS (
        SELECT j, pos, count(*) AS c FROM cells GROUP BY j, pos
    ), exact AS (
        SELECT t, count(*) AS exact_n FROM toks GROUP BY t
        ORDER BY exact_n DESC, t LIMIT {CM_TOPN}
    ), probes AS (
        SELECT t, exact_n, j, {_CM_HASH} AS pos
        FROM exact, unnest(range(0, {CM_DEPTH})) AS u(j)
    )
    SELECT p.t AS token,
           CAST(p.exact_n AS BIGINT) AS exact_n,
           CAST(min(s.c) AS BIGINT) AS cm_est,
           CAST(min(s.c) - p.exact_n AS BIGINT) AS overestimate
    FROM probes p JOIN sketch s USING (j, pos)
    GROUP BY p.t, p.exact_n
"""


# ---------------------------------------------------------------------------
# X6 — KMV (k-minimum-values) distinct sketch
# ---------------------------------------------------------------------------

KMV_K = 256


def x6_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002;
    Beyer et al. 2007) over the corpus's word-trigram vocabulary: hash
    every distinct trigram to a uniform [0,1) fraction (md5 top 60 bits,
    engine-portable), keep the k=256 smallest, and estimate distinct =
    (k-1)/u_k from the k-th smallest. Unlike the engine-seeded HLL
    (``x6_hll_mergeable``), the md5-keyed KMV is deterministic across
    engines, so the sketch VALUE — not just a tolerance band — is
    oracle-checked, alongside the exact count and the realized relative
    error.

    Scale shape: trigrams form row-locally; distinct-ing them is one
    map-side-combined shuffle on the gram; the bottom-k is a
    TakeOrderedAndProject (per-partition top-k, then a k*partitions
    merge — never a global sort), so the driver touches exactly k rows.
    The bottom-k set is also the sketch's merge state: union two runs'
    sets and re-take the k smallest — the mergeability HLL is prized for,
    with exact cross-engine replay."""
    from swiftbulkuploader_spark.functions.text import normalize_ws

    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(normalize_ws(F.col("text")))
    toks = docs.filter(F.length(F.trim(norm)) > 0).select(
        F.split(norm, " ").alias("t")
    )
    m = F.size("t") - 2
    pair = F.zip_with(
        F.slice("t", 1, m), F.slice("t", 2, m),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    tri = F.zip_with(
        pair, F.slice("t", 3, m),
        lambda p, c: F.concat_ws(" ", p, c),
    )
    grams = (
        toks.filter(F.size("t") >= 3)
        .select(F.explode(tri).alias("g"))
        .distinct()
    )
    u = (
        F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long")
        / F.lit(float(1 << 60))
    )
    bottom = grams.select(u.alias("u")).orderBy("u").limit(KMV_K)
    est = bottom.agg(
        F.count(F.lit(1)).alias("k_used"), F.max("u").alias("u_k")
    )
    exact = grams.agg(F.count(F.lit(1)).alias("exact_distinct"))
    # 1-row x 1-row crossJoin: bounded scalar combine (BOUNDED_BNLJ_OK)
    kmv = F.when(
        F.col("k_used") < KMV_K, F.col("k_used").cast("double")
    ).otherwise((F.col("k_used") - 1).cast("double") / F.col("u_k"))
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            "exact_distinct",
            F.col("k_used").cast("long").alias("k_used"),
            kmv.alias("kmv_estimate"),
            (kmv / F.col("exact_distinct") - 1).alias("rel_error"),
        )
    )


QUERIES["x6_kmv_distinct"] = x6_kmv_distinct

ORACLES["x6_kmv_distinct"] = f"""
    WITH t AS (
        SELECT string_split(trim(regexp_replace(lower(text),
                   '\\s+', ' ', 'g')), ' ') AS toks
        FROM documents
        WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0
    ), grams AS (
        SELECT DISTINCT toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                   AS g
        FROM t, unnest(range(1, len(toks) - 1)) AS r(i)
        WHERE len(toks) >= 3
    ), hashed AS (
        SELECT CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT)
                   / CAST(1152921504606846976 AS DOUBLE) AS u
        FROM grams
    ), bottom AS (
        SELECT u FROM hashed ORDER BY u LIMIT {KMV_K}
    ), est AS (
        SELECT count(*) AS k_used, max(u) AS u_k FROM bottom
    ), exact AS (
        SELECT count(*) AS exact_distinct FROM grams
    ), joined AS (
        SELECT exact.exact_distinct, est.k_used, est.u_k,
               CASE WHEN est.k_used < {KMV_K}
                    THEN CAST(est.k_used AS DOUBLE)
                    ELSE CAST(est.k_used - 1 AS DOUBLE) / est.u_k
               END AS kmv
        FROM est CROSS JOIN exact
    )
    SELECT CAST(exact_distinct AS BIGINT) AS exact_distinct,
           CAST(k_used AS BIGINT) AS k_used,
           kmv AS kmv_estimate,
           kmv / exact_distinct - 1 AS rel_error
    FROM joined
"""


# ---------------------------------------------------------------------------
# X6 — Lorenz/Gini concentration of token mass
# ---------------------------------------------------------------------------


def x6_lorenz_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass concentration per source: the Gini coefficient of the
    per-document token-count distribution (via the sorted-rank identity
    G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n) plus the share of token mass
    held by the top decile of documents — the "is this source a few huge
    documents or many small ones" datasheet number that drives chunking
    and sampling decisions (a G~1 source needs document splitting before
    uniform sampling makes sense).

    Exact and rounding-free: ranks and token counts are integers, so
    sum(i*x) is exact 64-bit arithmetic and the only doubles are two
    final divisions — identical expressions on both engines, no float
    summation anywhere. Shape: ONE shuffle on source feeds all three
    windows (asc rank, desc rank, partition count) and the final
    aggregate; at 100 TB each source's rank sort is the per-partition
    sort a 1000-executor cluster does locally after the one exchange."""
    from swiftbulkuploader_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "doc_id",
        token_count(F.col("text")).cast("long").alias("x"),
    )
    wasc = Window.partitionBy("source").orderBy(
        F.col("x").asc(), F.col("doc_id").asc()
    )
    wdesc = Window.partitionBy("source").orderBy(
        F.col("x").desc(), F.col("doc_id").desc()
    )
    wall = Window.partitionBy("source")
    r = base.select(
        "source",
        "x",
        F.row_number().over(wasc).cast("long").alias("i"),
        F.row_number().over(wdesc).cast("long").alias("rd"),
        F.count(F.lit(1)).over(wall).alias("cnt"),
    )
    agg = r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("x").alias("total_tokens"),
        F.sum(F.col("i") * F.col("x")).alias("swx"),
        F.sum(
            F.when(F.col("rd") <= F.expr("cnt div 10"), F.col("x")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("top_tokens"),
    )
    nd = F.col("n_docs").cast("double")
    gini = (
        F.lit(2.0) * F.col("swx") / (nd * F.col("total_tokens"))
        - (F.col("n_docs") + 1).cast("double") / F.col("n_docs")
    )
    return agg.select(
        "source",
        "n_docs",
        "total_tokens",
        F.when(F.col("total_tokens") > 0, gini).alias("gini"),
        F.when(
            F.col("total_tokens") > 0,
            F.col("top_tokens").cast("double") / F.col("total_tokens"),
        ).alias("top_decile_share"),
    )


QUERIES["x6_lorenz_gini"] = x6_lorenz_gini

ORACLES["x6_lorenz_gini"] = """
    WITH d AS (
        SELECT source, doc_id,
               CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0
                    THEN 0
                    ELSE len(string_split(
                        trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))
               END AS x
        FROM documents
    ), r AS (
        SELECT source, x,
               row_number() OVER (PARTITION BY source
                                  ORDER BY x ASC, doc_id ASC) AS i,
               row_number() OVER (PARTITION BY source
                                  ORDER BY x DESC, doc_id DESC) AS rd,
               count(*) OVER (PARTITION BY source) AS cnt
        FROM d
    ), agg AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(x) AS BIGINT) AS total_tokens,
               CAST(sum(i * x) AS BIGINT) AS swx,
               CAST(sum(CASE WHEN rd <= cnt // 10 THEN x ELSE 0 END)
                    AS BIGINT) AS top_tokens
        FROM r GROUP BY source
    )
    SELECT source, n_docs, total_tokens,
           CASE WHEN total_tokens > 0
                THEN CAST(2 AS DOUBLE) * swx
                         / (CAST(n_docs AS DOUBLE) * total_tokens)
                     - CAST(n_docs + 1 AS DOUBLE) / n_docs
           END AS gini,
           CASE WHEN total_tokens > 0
                THEN CAST(top_tokens AS DOUBLE) / total_tokens
           END AS top_decile_share
    FROM agg
"""


HILL_K = 100


def x6_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the document-length tail index: over the top
    k=100 order statistics of n_chars, alpha = k / sum ln(x_i / x_(k+1)) —
    the standard answer to 'how heavy is the length tail' that the Zipf
    fit (rank-frequency) and Gini (mass concentration) don't give:
    alpha < 2 means infinite variance (a single mega-document can dominate
    any mean-based budget), alpha > 2 means length-based packing
    estimates are stable. The flag is decided on the 6-dp-rounded alpha
    (round-before-boolean).

    Shape: one TakeOrderedAndProject of k+1 rows (n_chars desc, doc_id
    tie-break) — no global sort — then a 1-row aggregate over the bounded
    list; ln() operands are exact integers shared by both engines."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    top = (
        docs.select("doc_id", F.col("n_chars").cast("double").alias("x"))
        .where(F.col("x") > 0)
        .orderBy(F.col("x").desc(), F.col("doc_id").asc())
        .limit(HILL_K + 1)
    )
    w = Window.orderBy(F.col("x").desc(), F.col("doc_id").asc())
    ranked = top.withColumn("rk", F.row_number().over(w))
    floor_x = F.max(F.when(F.col("rk") == HILL_K + 1, F.col("x")))
    agg = ranked.agg(
        F.count(F.when(F.col("rk") <= HILL_K, 1)).cast("long").alias("k"),
        floor_x.alias("x_floor"),
        F.sum(
            F.when(F.col("rk") <= HILL_K, F.log(F.col("x")))
        ).alias("sum_ln_top"),
    )
    sum_ratio = F.col("sum_ln_top") - F.col("k").cast("double") * F.log("x_floor")
    alpha = F.col("k").cast("double") / F.nullif(sum_ratio, F.lit(0.0))
    return agg.select(
        "k",
        F.col("x_floor").alias("x_kplus1"),
        alpha.alias("alpha"),
        (F.round(alpha, 6) < F.lit(2.0)).alias("infinite_variance"),
    )


QUERIES["x6_hill_tail"] = x6_hill_tail

ORACLES["x6_hill_tail"] = f"""
    WITH top AS (
        SELECT doc_id, CAST(n_chars AS DOUBLE) AS x
        FROM documents WHERE n_chars > 0
        ORDER BY x DESC, doc_id ASC LIMIT {HILL_K + 1}
    ), ranked AS (
        SELECT x, row_number() OVER (ORDER BY x DESC, doc_id ASC) AS rk
        FROM top
    ), agg AS (
        SELECT CAST(count(CASE WHEN rk <= {HILL_K} THEN 1 END) AS BIGINT) AS k,
               max(CASE WHEN rk = {HILL_K + 1} THEN x END) AS x_floor,
               sum(CASE WHEN rk <= {HILL_K} THEN ln(x) END) AS sum_ln_top
        FROM ranked
    )
    SELECT k, x_floor AS x_kplus1,
           CAST(k AS DOUBLE)
               / nullif(sum_ln_top - CAST(k AS DOUBLE) * ln(x_floor),
                        CAST(0 AS DOUBLE)) AS alpha,
           round(CAST(k AS DOUBLE)
               / nullif(sum_ln_top - CAST(k AS DOUBLE) * ln(x_floor),
                        CAST(0 AS DOUBLE)), 6) < CAST(2 AS DOUBLE)
               AS infinite_variance
    FROM agg
"""


def x6_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group means — the outlier-resistant readout a metrics
    pipeline swaps in when raw means are tail-dominated: per return
    flag, the raw mean of extendedprice next to its WINSORIZED mean
    (values clamped to the group's [p05, p95]) and TRIMMED mean (tail
    rows dropped), plus the clamp accounting that shows how much tail
    each group carries.

    Determinism: the percentile bounds are 6-dp-ROUNDED before any
    clamp/trim decision (round-before-decision — Spark `percentile` and
    DuckDB `quantile_cont` agree to well past 6 dp, the x6_quantiles
    parity), so every row lands on the same side on both engines; means
    are fixed-shape sum/count divisions with summation-order ulps
    absorbed by the verifier's 9-significant-digit normalization.

    Shape: one grouped percentile aggregate (bounded group table) +
    one broadcast join back + one grouped fold — two passes over the
    scan, no corpus shuffle beyond the group key.

    Scale note (EXACT_PERCENTILE_OK contract, the x6_outlier_profile
    treatment): the clamp bounds use EXACT `percentile` so the DuckDB
    `quantile_cont` oracle stays bit-comparable after the 6-dp round;
    exact-percentile state grows with distinct values per group, so at
    100 TB swap `percentile_approx(l_extendedprice, array(0.05, 0.95),
    10000)` for the bounds — the winsorized/trimmed means downstream
    are insensitive to sketch-level bound error (SCALING.md)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    bounds = (
        li.groupBy("l_returnflag")
        .agg(F.expr(
            "percentile(l_extendedprice, array(0.05, 0.95))").alias("ps"))
        .select(
            "l_returnflag",
            F.round(F.element_at("ps", 1), 6).alias("p05"),
            F.round(F.element_at("ps", 2), 6).alias("p95"),
        )
    )
    j = li.join(F.broadcast(bounds), "l_returnflag")
    wins = F.least(F.greatest(x, F.col("p05")), F.col("p95"))
    in_core = (x >= F.col("p05")) & (x <= F.col("p95"))
    agg = j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.first("p05").alias("p05"),
        F.first("p95").alias("p95"),
        F.sum(x).alias("s_raw"),
        F.sum(wins).alias("s_wins"),
        F.sum(F.when(in_core, x)).alias("s_trim"),
        F.sum(F.when(in_core, 1).otherwise(0)).cast("long").alias("n_trim"),
        F.sum(F.when(x < F.col("p05"), 1).otherwise(0)).cast("long")
        .alias("n_clamped_low"),
        F.sum(F.when(x > F.col("p95"), 1).otherwise(0)).cast("long")
        .alias("n_clamped_high"),
    )
    return agg.select(
        "l_returnflag", "n", "p05", "p95",
        (F.col("s_raw") / F.col("n").cast("double")).alias("mean_raw"),
        (F.col("s_wins") / F.col("n").cast("double")).alias("mean_winsorized"),
        (F.col("s_trim") / F.col("n_trim").cast("double")).alias("mean_trimmed"),
        "n_trim", "n_clamped_low", "n_clamped_high",
    )


QUERIES["x6_winsorized_stats"] = x6_winsorized_stats

ORACLES["x6_winsorized_stats"] = """
    WITH bounds AS (
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.05), 6) AS p05,
               round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
        FROM lineitem GROUP BY 1
    ), agg AS (
        SELECT li.l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               any_value(b.p05) AS p05,
               any_value(b.p95) AS p95,
               sum(l_extendedprice) AS s_raw,
               sum(least(greatest(l_extendedprice, b.p05), b.p95)) AS s_wins,
               sum(CASE WHEN l_extendedprice >= b.p05
                         AND l_extendedprice <= b.p95
                        THEN l_extendedprice END) AS s_trim,
               CAST(sum(CASE WHEN l_extendedprice >= b.p05
                              AND l_extendedprice <= b.p95
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_trim,
               CAST(sum(CASE WHEN l_extendedprice < b.p05 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clamped_low,
               CAST(sum(CASE WHEN l_extendedprice > b.p95 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clamped_high
        FROM lineitem li JOIN bounds b ON li.l_returnflag = b.l_returnflag
        GROUP BY 1
    )
    SELECT l_returnflag, n, p05, p95,
           s_raw / CAST(n AS DOUBLE) AS mean_raw,
           s_wins / CAST(n AS DOUBLE) AS mean_winsorized,
           s_trim / CAST(n_trim AS DOUBLE) AS mean_trimmed,
           n_trim, n_clamped_low, n_clamped_high
    FROM agg
"""


# ---------------------------------------------------------------------------
# X6 — k-anonymity / l-diversity re-identification audit (round 13)
# ---------------------------------------------------------------------------

K_ANON = 10  # minimum safe equivalence-class size (Sweeney's k)
L_DIV = 2    # minimum sensitive-value diversity per class


def x6_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk audit over a generalization ladder —
    k-anonymity (Sweeney, IJUFKS'02) and l-diversity (Machanavajjhala
    et al., ICDE'06) for the customer table's quasi-identifiers. The
    x3_pii_scrub successor a data-governance pipeline actually needs:
    scrubbing direct identifiers is not enough when (segment, nation,
    balance-bucket) combinations single out individuals; this query
    measures HOW exposed each release candidate (generalization level)
    is, so the pipeline can pick the coarsest level that meets policy.

    Ladder (the Samarati/Sweeney lattice walk): level 0 = (segment,
    nation, balance_k-thousand-bucket), level 1 drops the balance
    bucket, level 2 keeps segment only. Sensitive attribute =
    delinquency (acctbal < 0): if every member of a class shares it,
    class membership discloses it (hence l-diversity). Per level:
    class count, k_min/k_max, records in classes below K_ANON as a
    share (pct_below_k), minimum sensitive diversity, and the two
    policy flags. Liveness (measured at every SF): level 0 is never
    k-anonymous (k_min 1-2), level 2 always is (k_min 23+), so both
    flag polarities occur; n_records is SF-invariantly the full table
    at every level (each level partitions all rows — pinned).

    Shape: ONE rollup shuffle computes every ladder level in a single
    pass (no per-level rescans; grand-total row filtered out), then an
    O(levels) fold. All counts exact integers; pct is one fixed-shape
    double division, 6-dp rounded. Scales: partial-aggregated rollup,
    output bounded by class cardinality.

    Reference parity: none (§2.9 governance extension)."""
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("int")
        .alias("bal_k"),
        (F.col("c_acctbal") < 0).cast("int").alias("delinquent"),
    )
    return k_anonymity_ladder(base)


def k_anonymity_ladder(
    base: DataFrame, k_anon: int = K_ANON, l_div: int = L_DIV
) -> DataFrame:
    """Core of x6_k_anonymity, factored for crafted-fixture tests:
    `base` carries (seg, nat, bal_k, delinquent); returns the 3-row
    per-generalization-level audit from ONE rollup pass."""
    classes = (
        base.rollup("seg", "nat", "bal_k")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).cast("long").alias("k"),
            F.countDistinct("delinquent").cast("long").alias("l"),
        )
        .filter(F.col("gid") < 7)  # drop the grand-total row
    )
    return (
        classes.groupBy("gid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum("k").cast("long").alias("n_records"),
            F.round(
                F.sum(
                    F.when(F.col("k") < F.lit(k_anon), F.col("k"))
                    .otherwise(0)
                ).cast("double")
                / F.sum("k").cast("double"),
                6,
            ).alias("pct_below_k"),
            F.min("l").alias("l_div_min"),
        )
        .select(
            F.when(F.col("gid") == 0, 0)
            .when(F.col("gid") == 1, 1)
            .otherwise(2).alias("level"),
            F.when(F.col("gid") == 0, "segment,nation,balance_k")
            .when(F.col("gid") == 1, "segment,nation")
            .otherwise("segment").alias("quasi_identifier"),
            "n_classes", "k_min", "k_max", "n_records", "pct_below_k",
            "l_div_min",
            (F.col("k_min") >= F.lit(k_anon)).alias("k_anonymous"),
            (F.col("l_div_min") >= F.lit(l_div)).alias("l_diverse"),
        )
        .orderBy("level")
    )


QUERIES["x6_k_anonymity"] = x6_k_anonymity

ORACLES["x6_k_anonymity"] = f"""
    WITH base AS (
        SELECT c_mktsegment AS seg, c_nationkey AS nat,
               CAST(floor(c_acctbal / 1000.0) AS INTEGER) AS bal_k,
               CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS delinquent
        FROM customer
    ), classes AS (
        SELECT GROUPING(seg, nat, bal_k) AS gid,
               CAST(count(*) AS BIGINT) AS k,
               CAST(count(DISTINCT delinquent) AS BIGINT) AS l
        FROM base GROUP BY ROLLUP(seg, nat, bal_k)
    )
    SELECT CASE WHEN gid = 0 THEN 0 WHEN gid = 1 THEN 1 ELSE 2 END AS level,
           CASE WHEN gid = 0 THEN 'segment,nation,balance_k'
                WHEN gid = 1 THEN 'segment,nation'
                ELSE 'segment' END AS quasi_identifier,
           CAST(count(*) AS BIGINT) AS n_classes,
           min(k) AS k_min,
           max(k) AS k_max,
           CAST(sum(k) AS BIGINT) AS n_records,
           round(CAST(sum(CASE WHEN k < {K_ANON} THEN k ELSE 0 END)
                      AS DOUBLE)
                 / CAST(sum(k) AS DOUBLE), 6) AS pct_below_k,
           min(l) AS l_div_min,
           min(k) >= {K_ANON} AS k_anonymous,
           min(l) >= {L_DIV} AS l_diverse
    FROM classes WHERE gid < 7
    GROUP BY gid ORDER BY level
"""
