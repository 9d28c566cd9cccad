"""Training-data preparation operators: sequence packing and embedding
quantization (north-star extensions, SURVEY.md §2.9).

Both are the set-oriented formulation of steps an LLM pretraining pipeline
runs over the whole corpus, designed so the expensive part is a single
window or map pass:

* **Sequence packing** (concat-and-chunk): documents are concatenated per
  shard (here: per language) in a deterministic order and cut into
  fixed-token-budget chunks; a document belongs to the chunk its first token
  lands in. One window cumulative sum + integer division — no iterative
  bin-packing loop, which is what makes it viable at 10^10 documents (the
  window is a single shuffle on the shard key; within-shard order is the
  sort the shuffle already does).
* **Int8 scalar quantization**: per-vector symmetric quantization
  (scale = max|x|/127), the standard 4x memory/IO shrink applied before
  similarity search over billions of embeddings. One `zip_with` pass per
  row; the scale is bound OUTSIDE the lambda (as an `array_repeat` argument,
  evaluated once per row) — an interpreted-HOF lambda re-evaluates captured
  subexpressions per element, which would make this O(d^2) per row.

Quantized outputs are integers, so the DuckDB oracle is hash-exact: both
engines perform the identical IEEE double ops (cast FLOAT[] -> DOUBLE[]
first; DuckDB list math is float32 otherwise) and the identical
round-half-away-from-zero convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swiftbulkuploader_spark.catalog import load_table
from swiftbulkuploader_spark.plans.layout import spread
from swiftbulkuploader_spark.functions.text import normalize_ws, token_count
from swiftbulkuploader_spark.operators.oracle_fragments import (
    QUALITY_SCORE_DUCK,
    TOKENS_DUCK,
)

TOKEN_BUDGET = 2048


def x3_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing plan: per language (the shard key), documents
    ordered by doc_id are packed into 2048-token chunks; returns one row per
    chunk with its document span and token load. Chunks can exceed the
    budget by at most one document's tail — the concat-and-chunk semantic,
    where a straddling document is attributed to its starting chunk."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = docs.select(
        "lang", "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    cum_excl = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    placed = toks.withColumn(
        "chunk_id", F.floor(cum_excl / F.lit(TOKEN_BUDGET)).cast("long")
    )
    return placed.groupBy("lang", "chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("chunk_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def x2_quantized_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of each embedding: scale = max|x|/127,
    code_i = round(x_i/scale). Emits integer summaries of the code vector
    (sum, L1, min/max, dims) — exact cross-engine, and enough to prove the
    codes are the right ones (max code = ±127 by construction)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("v"))
    scale = F.array_max(F.transform("v", F.abs)) / F.lit(127.0)
    # array_repeat binds `scale` as a per-row argument (evaluated once);
    # the zip_with lambda then touches only lambda variables.
    codes = F.zip_with(
        "v",
        F.array_repeat(scale, F.size("v")),
        lambda x, s: F.round(x / F.nullif(s, F.lit(0.0))).cast("long"),
    )
    zero = F.lit(0).cast("long")
    qdf = base.select(
        "vec_id",
        F.transform(codes, lambda c: F.coalesce(c, zero)).alias("q"),
    )
    return qdf.select(
        "vec_id",
        F.size("q").alias("n_dims"),
        F.aggregate("q", zero, lambda acc, x: acc + x).alias("sum_q"),
        F.aggregate("q", zero, lambda acc, x: acc + F.abs(x)).alias("l1_q"),
        F.array_max("q").alias("max_q"),
        F.array_min("q").alias("min_q"),
    )


MIX_ALPHA = 0.5          # sampling temperature: p^alpha flattens the source mix
MIX_TOKEN_BUDGET = 10**6  # training-token budget the mix is computed against


def x6_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixing — the sampling-weight computation a
    pretraining run does over its corpus manifest (cf. the multilingual
    p^alpha sampling of XLM-R/mT5): per source, token mass -> raw share ->
    alpha-tempered mixing weight -> target tokens and implied epochs for a
    fixed training budget.

    Scale shape: one partial+final aggregate over the corpus reduces to
    n_sources rows; the normalizing sum runs as a window over that tiny
    aggregate (never over raw rows), so the whole computation after the scan
    is O(n_sources). Low-resource sources get epochs > 1 (upsampled),
    high-resource < 1 — the monotone flattening alpha=0.5 promises."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = (
        docs.select("source", token_count(F.col("text")).cast("long").alias("n_tokens"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
    )
    # bounded input: these windows consume the ~n_sources-row aggregate
    # above, never raw docs — the single-partition WindowExec (and its
    # "No Partition Defined" log warning) is intentional and O(n_sources)
    w_all = Window.partitionBy()
    raw_share = F.col("n_tokens") / F.sum("n_tokens").over(w_all)
    tempered = F.pow(raw_share, F.lit(MIX_ALPHA))
    mix_w = tempered / F.sum(tempered).over(w_all)
    target = F.round(mix_w * F.lit(MIX_TOKEN_BUDGET)).cast("long")
    return per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(raw_share, 6).alias("raw_share"),
        F.round(mix_w, 6).alias("mix_weight"),
        target.alias("target_tokens"),
        F.round(target / F.col("n_tokens"), 4).alias("epochs"),
    )


N_SHARDS = 8


def x6_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding for training-data ordering:
    every document gets a pseudo-random but reproducible key (md5 of
    seed:doc_id), a shard from the key's top 32 bits, and its position
    within the shard ordered by key.

    This is the scalable formulation of "shuffle the corpus": shard
    assignment is row-local (hash mod — no global sort anywhere), and the
    position window sorts only WITHIN each shard, so the plan is one
    shuffle on shard_id + a per-shard sort — exactly what a 1000-executor
    writer wants (one output file per shard, ordered). The md5 key makes
    Spark and DuckDB agree byte-for-byte, unlike engine-seeded rand()."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("42:"), F.col("doc_id").cast("string")))
    keyed = docs.select("doc_id", key.alias("shuffle_key"))
    shard = (F.conv(F.substring("shuffle_key", 1, 8), 16, 10).cast("long")
             % F.lit(N_SHARDS)).cast("int")
    w = Window.partitionBy("shard_id").orderBy("shuffle_key")
    return (
        keyed.withColumn("shard_id", shard)
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shuffle_key", "shard_id", "pos")
    )


QUALITY_MIN = 0.5


def x10_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole pre-training data-prep pipeline as ONE declarative plan:
    quality filter -> exact-dedup survivors -> eval-set decontamination ->
    deterministic shuffle/shard -> token packing, ending in the per-chunk
    manifest a trainer reads. Every stage reuses the operator family's own
    building blocks, so this is the composition proof: the engine's dedup,
    contamination, shuffle and packing operators chain inside a single
    Catalyst plan (one explain, one optimizer pass — no intermediate
    materialization), and the whole thing stays DuckDB-oracle-checkable.

    Stage shapes (each analyzed separately in SCALING.md): quality filter is
    scan-speed projection; dedup one narrow shuffle on the fingerprint;
    decontamination the bounded-probe broadcast form (swap in the
    inverted-index form past broadcast scale); shard/pack one shuffle on
    shard_id + per-shard sort.

    spread() on the corpus (r14-opt, the plans/layout doctrine): BOTH
    expensive branches — quality_score + fingerprint, and the shingling
    + 8-probe array_intersect containment scan — are compute-dense
    per-row work that ran at the parquet split parallelism (one task on
    the single-file contract substrate; the 10x core-ratio probe
    measured the whole query serialized, 14.4 s at 32 cores == 13.3 at
    8, CORE_RATIO_r14.json). One round-robin repartition of the raw
    documents feeds both branches; every downstream decision is a
    partitioning-independent exact aggregate/window."""
    from swiftbulkuploader_spark.functions.text import (
        fingerprint,
        quality_score,
        shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = spread(docs.filter(F.col("doc_id") >= 8))

    # 1. quality floor (pretraining filter; threshold on the rounded score
    #    so both engines compare identical doubles)
    kept = corpus.filter(quality_score(F.col("text")) >= QUALITY_MIN)

    # 2. exact-dedup survivors (min doc_id per canonical fingerprint)
    w_fp = Window.partitionBy(fingerprint(F.col("text")))
    deduped = (
        kept.withColumn("_keep", F.min("doc_id").over(w_fp))
        .filter(F.col("doc_id") == F.col("_keep"))
        .drop("_keep")
    )

    # 3. decontamination: drop docs containing any eval probe (docs 0-7) at
    #    >= 0.5 shingle containment — broadcast form (bounded probe set)
    sh = F.array_distinct(shingles(F.col("text")))
    probes = (
        docs.filter(F.col("doc_id") < 8)
        .select(sh.alias("p_sh"), F.size(sh).alias("p_n"))
    )
    # r13-opt (guide §2.4): flag containment over CORPUS, not `deduped` —
    # referencing `deduped` here made the quality+window-dedup subtree a
    # second branch of the plan (re-executed in full; the before-plan shows
    # the fingerprint window twice). Flagging a superset is equivalent:
    # `flagged` is only anti-joined against `deduped`, and
    # flagged(corpus) ∩ deduped == flagged(deduped) ∩ deduped, so `clean`
    # is row-identical while the window/quality branch executes once.
    flagged = (
        corpus.select("doc_id", sh.alias("d_sh"))
        .join(F.broadcast(probes))
        .filter(F.size(F.array_intersect("d_sh", "p_sh")) / F.col("p_n") >= 0.5)
        .select("doc_id")
        .distinct()
    )
    # flagged is the contaminated subset — rare by construction (eval-probe
    # hits), so broadcast the anti-join build side instead of shuffling the
    # whole deduped corpus into a sort-merge
    clean = deduped.join(F.broadcast(flagged), "doc_id", "left_anti")

    # 4. deterministic shuffle + shard, 5. pack to token chunks per shard
    key = F.md5(F.concat(F.lit("42:"), F.col("doc_id").cast("string")))
    sharded = clean.select(
        "doc_id",
        key.alias("shuffle_key"),
        (F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
         % F.lit(N_SHARDS)).cast("int").alias("shard_id"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    w_pack = (
        Window.partitionBy("shard_id")
        .orderBy("shuffle_key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum("n_tokens").over(w_pack), F.lit(0).cast("long"))
    placed = sharded.withColumn(
        "chunk_id", F.floor(cum_excl / F.lit(TOKEN_BUDGET)).cast("long")
    )
    return placed.groupBy("shard_id", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("chunk_tokens"),
    )


DOMAIN_CAP = 15


def x1_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap — the domain-balancing pass a pretraining
    corpus runs so one prolific source (one crawl domain) cannot dominate
    the mixture: rank documents within each source by content hash
    (deterministic, engine-independent — NOT rand(), so the kept set is
    reproducible across engines, runs, and cluster sizes) and keep the
    first DOMAIN_CAP.

    Scale shape: one shuffle on source + a per-source sort bounded by
    per-source row counts; no global sort. Skewed mega-domains are the
    known hazard — at real scale the rank window runs after a per-source
    count prune (sources under the cap skip the sort entirely via AQE
    skew handling), and the hash order means any K-subset is an unbiased
    sample."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.md5("text"), "doc_id")
    return (
        docs.select(
            "doc_id", "source",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= DOMAIN_CAP)
    )


def _dataset_card(spark: SparkSession, sf_dir: str, p50_col) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(p50_col, 6).alias("p50_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
    # bounded input: the share window runs over the ~n_sources aggregate
    # rows (not raw data), so the single unpartitioned WindowExec is fine
    w_all = Window.partitionBy()
    return per.select(
        "source", "n_docs", "total_chars", "avg_chars", "p50_chars", "n_langs",
        F.round(F.col("total_chars") / F.sum("total_chars").over(w_all), 6)
        .alias("corpus_share"),
    )


def dataset_card_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEFAULT dataset datasheet — per-source docs, chars, length
    distribution, language spread, corpus share — with the p50 computed by
    the GK `percentile_approx` sketch: single pass, bounded memory,
    mergeable partials. This is the form composed pipelines call at corpus
    scale (exact `percentile` state grows with distinct values —
    profiling.py's documented 100x-memory risk). Same schema as the exact
    twin, so callers swap freely. Not a hash-compared contract query
    (sketch output is engine-specific); its correctness contract is
    `x6_dataset_card_approx`, which bounds the sketch against the exact
    percentile per source and IS oracled."""
    p50 = F.percentile_approx("n_chars", F.lit(0.5), F.lit(10000))
    return _dataset_card(spark, sf_dir, p50)


def x6_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset datasheet — the summary table a corpus release
    ships (docs, chars, length distribution, language spread, share of
    corpus). One partial+final aggregate over the scan; the corpus-share
    window runs over the ~n_sources aggregate rows, never raw data.

    TEST-SCALE form: p50 is the exact interpolated percentile so DuckDB
    hash-matches it. The scale default is `dataset_card_sketch` (GK
    sketch p50, same schema); `x6_dataset_card_approx` is the oracled
    guard that the sketch stays within tolerance of this exact form."""
    return _dataset_card(spark, sf_dir, F.expr("percentile(n_chars, 0.5)"))


def x6_dataset_card_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable validation of `dataset_card_sketch`: one aggregate
    computes BOTH the exact per-source p50 and the GK sketch p50 and emits
    (source, p50_exact, within_tol) — the same engine-independent
    tolerance-row discipline as profiling.py's x6_quantiles_approx, applied
    per group. DuckDB reproduces p50_exact with quantile_cont and asserts
    within_tol TRUE, so a sketch drifting out of tolerance is a loud hash
    mismatch, not an invisible rows-only pass."""
    from swiftbulkuploader_spark.operators.profiling import GK_REL_TOL

    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.5)").alias("ev"),
        F.percentile_approx("n_chars", F.lit(0.5), F.lit(10000))
        .cast("double")
        .alias("av"),
    )
    tol = F.lit(GK_REL_TOL) * F.greatest(F.abs(F.col("ev")), F.lit(1.0))
    return per.select(
        "source",
        F.round("ev", 6).alias("p50_exact"),
        (F.abs(F.col("av") - F.col("ev")) <= tol).alias("within_tol"),
    )


QUERIES = {
    "x1_domain_cap": x1_domain_cap,
    "x6_dataset_card": x6_dataset_card,
    "x6_dataset_card_approx": x6_dataset_card_approx,
    "x3_pack_sequences": x3_pack_sequences,
    "x2_quantized_codes": x2_quantized_codes,
    "x6_source_mixing": x6_source_mixing,
    "x6_global_shuffle": x6_global_shuffle,
    "x10_training_manifest": x10_training_manifest,
}

ORACLES = {
    "x1_domain_cap": """
        SELECT doc_id, source, rk FROM (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY md5(text), doc_id) AS rk
            FROM documents
        ) WHERE rk <= 15
    """,
    # per-source tolerance rows: exact value reproduced by quantile_cont,
    # the sketch-health boolean asserted TRUE (see x6_quantiles_approx)
    "x6_dataset_card_approx": """
        SELECT source,
               round(quantile_cont(n_chars, 0.5), 6) AS p50_exact,
               TRUE AS within_tol
        FROM documents
        GROUP BY source
    """,
    "x6_dataset_card": """
        WITH per AS (
            SELECT source,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   round(avg(n_chars), 6) AS avg_chars,
                   round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
                   count(DISTINCT lang) AS n_langs
            FROM documents GROUP BY source
        )
        SELECT source, n_docs, total_chars, avg_chars, p50_chars, n_langs,
               round(CAST(total_chars AS DOUBLE) / sum(total_chars) OVER (), 6)
                   AS corpus_share
        FROM per
    """,
    "x3_pack_sequences": f"""
        WITH t AS (
            SELECT lang, doc_id,
                   CAST({TOKENS_DUCK} AS BIGINT) AS n_tokens
            FROM documents
        ), placed AS (
            SELECT lang, doc_id, n_tokens,
                   coalesce(sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   // {TOKEN_BUDGET} AS chunk_id
            FROM t
        )
        SELECT lang, chunk_id, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM placed
        GROUP BY lang, chunk_id
    """,
    "x2_quantized_codes": """
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), s AS (
            SELECT vec_id, v,
                   list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
            FROM v
        ), q AS (
            SELECT vec_id,
                   list_transform(
                       v, x -> coalesce(
                           CAST(round(x / nullif(scale, 0.0)) AS BIGINT), 0)
                   ) AS qv
            FROM s
        )
        SELECT vec_id, CAST(len(qv) AS INT) AS n_dims,
               CAST(list_sum(qv) AS BIGINT) AS sum_q,
               CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS l1_q,
               list_max(qv) AS max_q, list_min(qv) AS min_q
        FROM q
    """,
}

ORACLES["x6_source_mixing"] = f"""
    WITH per_src AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(CAST({TOKENS_DUCK} AS BIGINT)) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ), shares AS (
        SELECT *,
               CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS raw_share,
               pow(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), {MIX_ALPHA})
                   AS tempered
        FROM per_src
    ), weights AS (
        SELECT *, tempered / sum(tempered) OVER () AS mix_w FROM shares
    )
    SELECT source, n_docs, n_tokens,
           round(raw_share, 6) AS raw_share,
           round(mix_w, 6) AS mix_weight,
           CAST(round(mix_w * {MIX_TOKEN_BUDGET}) AS BIGINT) AS target_tokens,
           round(CAST(round(mix_w * {MIX_TOKEN_BUDGET}) AS BIGINT) / n_tokens, 4)
               AS epochs
    FROM weights
"""

ORACLES["x6_global_shuffle"] = f"""
    WITH keyed AS (
        SELECT doc_id, md5('42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        FROM documents
    ), sharded AS (
        SELECT doc_id, shuffle_key,
               CAST(CAST(('0x' || substr(shuffle_key, 1, 8)) AS BIGINT)
                    % {N_SHARDS} AS INT) AS shard_id
        FROM keyed
    )
    SELECT doc_id, shuffle_key, shard_id,
           CAST(row_number() OVER (PARTITION BY shard_id ORDER BY shuffle_key)
                AS INT) AS pos
    FROM sharded
"""

ORACLES["x10_training_manifest"] = f"""
    WITH quality AS (
        SELECT doc_id, text,
               {QUALITY_SCORE_DUCK} AS q
        FROM documents WHERE doc_id >= 8
    ), kept AS (
        SELECT doc_id, text FROM quality WHERE q >= {QUALITY_MIN}
    ), deduped AS (
        SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   min(doc_id) OVER (
                       PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                   ) AS keep_id
            FROM kept
        ) WHERE doc_id = keep_id
    ), sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 4, 1)),
                   i -> array_to_string(t[i:least(i + 4, len(t))], ' ')
               )) AS s
        FROM (
            SELECT doc_id,
                   string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS t
            FROM documents
        )
    ), probes AS (
        SELECT s AS p_sh, len(s) AS p_n FROM sh WHERE doc_id < 8
    ), flagged AS (
        SELECT DISTINCT c.doc_id
        FROM (SELECT d.doc_id, s.s FROM deduped d JOIN sh s USING (doc_id)) c
        CROSS JOIN probes p
        WHERE CAST(len(list_intersect(c.s, p.p_sh)) AS DOUBLE) / p.p_n >= 0.5
    ), clean AS (
        SELECT d.doc_id, d.text FROM deduped d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM flagged)
    ), sharded AS (
        SELECT doc_id,
               md5('42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
               CAST(CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                    % {N_SHARDS} AS INT) AS shard_id,
               CAST({TOKENS_DUCK} AS BIGINT) AS n_tokens
        FROM clean
    ), placed AS (
        SELECT shard_id, n_tokens,
               coalesce(sum(n_tokens) OVER (
                   PARTITION BY shard_id ORDER BY shuffle_key
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {TOKEN_BUDGET} AS chunk_id
        FROM sharded
    )
    SELECT shard_id, chunk_id, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens
    FROM placed GROUP BY shard_id, chunk_id
"""


def x10_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END dedup funnel report — the per-stage survivor counts a
    corpus curator signs off before training: exact dedup (min-id
    survivor per md5 fingerprint), then MinHash-LSH near-dup removal
    (the engine-reproducible x1_minhash_exact pipeline run over the
    exact-dedup SURVIVORS; greedy id-ordered rule — the higher id of
    every verified pair drops), then the Bloom decontamination screen
    over what remains. One row per stage: (stage, n_docs).

    The point is COMPOSITION under one oracle: the stages reuse the
    factored operator bodies (`minhash_exact_pairs`,
    `bloom_screen_flags`), and the DuckDB oracle nests the SAME generated
    stage SQL (via their `src` parameters) inside the funnel's CTE chain
    — so the composed pipeline is value-checked end to end, not just its
    pieces in isolation. Stage frames are localCheckpointed: each feeds
    both the next stage AND its own count branch, and union branches
    re-execute their subtree without it (CLAUDE.md rule 4).

    Scale shape: stage 1 is one fingerprint shuffle; stage 2 is the
    banded LSH (never n^2) restricted to survivors; stage 3 is the
    constant-size Bloom screen — the funnel adds nothing beyond its
    stages' own documented costs."""
    from swiftbulkuploader_spark.functions.text import fingerprint
    from swiftbulkuploader_spark.operators.dedup import (
        bloom_screen_flags,
        minhash_exact_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    s1 = (
        docs.select("doc_id", fingerprint(F.col("text")).alias("f"))
        .groupBy("f")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    d1 = docs.join(s1, "doc_id").localCheckpoint(eager=True)
    drop2 = minhash_exact_pairs(d1).select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    d2 = d1.join(drop2, "doc_id", "left_anti").localCheckpoint(eager=True)
    flagged = bloom_screen_flags(d2).filter(F.col("flagged")).select("doc_id")
    d3 = d2.join(flagged, "doc_id", "left_anti")

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )

    return (
        stage("0_input", docs)
        .unionByName(stage("1_exact", d1))
        .unionByName(stage("2_neardup", d2))
        .unionByName(stage("3_decontam", d3))
    )


QUERIES["x10_dedup_funnel"] = x10_dedup_funnel


def _dedup_funnel_oracle_sql() -> str:
    """ASSEMBLED funnel oracle: nests the minhash-exact and bloom-screen
    generated SQL (src-parameterized) as derived tables inside the funnel
    CTE chain, so every stage boundary is the exact stage SQL already
    verified standalone."""
    from swiftbulkuploader_spark.operators.dedup import (
        _FP_DUCK,
        _contamination_bloom_oracle_sql,
        _minhash_exact_oracle_sql,
    )

    return f"""
        WITH d AS (
            SELECT * FROM documents
        ), fp AS (
            SELECT doc_id, {_FP_DUCK} AS f FROM d
        ), s1 AS (
            SELECT min(doc_id) AS doc_id FROM fp GROUP BY f
        ), d1 AS (
            SELECT d.* FROM d JOIN s1 USING (doc_id)
        ), pairs AS (
            SELECT * FROM ({_minhash_exact_oracle_sql(src="d1")}) mh
        ), d2 AS (
            SELECT * FROM d1
            WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
        ), flags AS (
            SELECT * FROM ({_contamination_bloom_oracle_sql(src="d2")}) bl
        ), d3 AS (
            SELECT * FROM d2
            WHERE doc_id NOT IN (SELECT doc_id FROM flags WHERE flagged)
        )
        SELECT '0_input' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM d
        UNION ALL
        SELECT '1_exact', CAST(count(*) AS BIGINT) FROM d1
        UNION ALL
        SELECT '2_neardup', CAST(count(*) AS BIGINT) FROM d2
        UNION ALL
        SELECT '3_decontam', CAST(count(*) AS BIGINT) FROM d3
    """


ORACLES["x10_dedup_funnel"] = _dedup_funnel_oracle_sql()


# ---------------------------------------------------------------------------
# DSIR importance weighting (round 7)

DSIR_B = 1024          # hashed feature buckets (the paper's hashed n-grams)
DSIR_TARGET = "src0"   # held-out exemplar domain standing in for the
                       # high-quality target corpus (e.g. Wikipedia in DSIR)


def x6_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection via hashed-feature importance weights
    (Xie et al., NeurIPS 2023, "Data Selection for Language Models via
    Importance Resampling"): score every raw document by how much more
    likely its tokens are under a TARGET distribution than under the raw
    corpus distribution, both estimated over B hashed buckets —
    log w(doc) = sum_tokens [ log p_tgt(b(tok)) - log p_raw(b(tok)) ]
    with add-one smoothing. Positive log_w = more target-like than the
    corpus average -> keep. The hashing is the whole trick: a sparse
    exemplar corpus (here the src0 domain) gives dense, overlapping
    estimates over B=1024 buckets where a raw unigram LM would be mostly
    zeros. (The paper's final Gumbel-noise resampling draw is a seeded
    RNG choice outside the deterministic contract; the threshold keep
    flag is the deterministic selection rule.)

    Shape, all linear: one token explode feeds the bucket hash
    (md5-prefix — engine-replayable, same gear as CDC/winnowing); the two
    distribution tables are (bucket) count shuffles collapsing to <= B
    rows; totals ride a 1-row broadcast (ScalarSubquery pattern); the
    per-token scorer is a B-row broadcast join + one per-doc map-side
    combined sum. At 100 TB this is strictly lighter than the unigram-LM
    scorer (x3_unigram_logprob, same probe family): the lookup table is
    FIXED-SIZE (B rows) instead of vocab-sized. log_w ships UNROUNDED
    (summation-order ulps absorbed by the verifier's 9-significant-digit
    normalization); `keep` compares the unrounded sum to 0 — a knife-edge
    disagreement would need cancellation to within ~1e-13 of exactly
    zero, the same accepted residual class as the Lloyd rounding edge."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(normalize_ws(F.col("text")))
    tok = docs.filter(F.length(F.trim(norm)) > 0).select(
        "doc_id", "source", F.explode(F.split(norm, " ")).alias("t")
    )
    # persist: referenced 3x (raw counts, target counts, per-doc scorer) —
    # without it the token explode + per-token md5 executes three times per
    # action (guide §5; the x2_knn_accuracy in-query persist precedent)
    tokb = tok.select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long")
            % DSIR_B
        ).alias("b"),
    ).persist()
    raw = tokb.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        tokb.filter(F.col("source") == DSIR_TARGET)
        .groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    )
    dist = raw.join(tgt, "b", "left").select(
        "b", "cr", F.coalesce("ct", F.lit(0)).alias("ct")
    )
    totals = dist.agg(
        F.sum("cr").cast("double").alias("nr"),
        F.sum("ct").cast("double").alias("nt"),
    )
    lr_tab = dist.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("ct") + 1).cast("double")
                  / (F.col("nt") + F.lit(float(DSIR_B))))
            - F.log((F.col("cr") + 1).cast("double")
                    / (F.col("nr") + F.lit(float(DSIR_B))))
        ).alias("lr"),
    )
    per = (
        tokb.join(F.broadcast(lr_tab), "b")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("lr").alias("log_w"))
    )
    return (
        docs.select("doc_id", "source")
        .join(per, "doc_id")
        .select(
            "doc_id",
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "log_w",
            (F.col("log_w") > 0).alias("keep"),
        )
    )


QUERIES["x6_dsir_select"] = x6_dsir_select

ORACLES["x6_dsir_select"] = f"""
    WITH tk AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % {DSIR_B} AS b
        FROM (
            SELECT doc_id, source,
                   unnest(string_split(trim(regexp_replace(lower(text),
                       '\\s+', ' ', 'g')), ' ')) AS t
            FROM documents
            WHERE length(trim(regexp_replace(lower(text),
                       '\\s+', ' ', 'g'))) > 0
        )
    ), raw AS (
        SELECT b, count(*) AS cr FROM tk GROUP BY b
    ), tgt AS (
        SELECT b, count(*) AS ct FROM tk
        WHERE source = '{DSIR_TARGET}' GROUP BY b
    ), dist AS (
        SELECT raw.b AS b, cr, COALESCE(ct, 0) AS ct
        FROM raw LEFT JOIN tgt ON raw.b = tgt.b
    ), tot AS (
        SELECT CAST(sum(cr) AS DOUBLE) AS nr, CAST(sum(ct) AS DOUBLE) AS nt
        FROM dist
    ), lr AS (
        SELECT b,
               ln(CAST(ct + 1 AS DOUBLE) / (nt + {DSIR_B}.0))
             - ln(CAST(cr + 1 AS DOUBLE) / (nr + {DSIR_B}.0)) AS lr
        FROM dist CROSS JOIN tot
    ), per AS (
        SELECT tk.doc_id AS doc_id, count(*) AS n_tokens, sum(lr.lr) AS log_w
        FROM tk JOIN lr USING (b)
        GROUP BY tk.doc_id
    )
    SELECT d.doc_id, d.source,
           CAST(per.n_tokens AS BIGINT) AS n_tokens,
           per.log_w,
           per.log_w > 0 AS keep
    FROM per JOIN documents d USING (doc_id)
"""


WSAMPLE_N = 200


def x6_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential keys
    (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    reservoir"): draw a corpus subsample where a document's inclusion
    probability is proportional to its weight (here n_chars — standing in
    for any quality/importance weight), the standard one-pass trick for
    "sample 1B docs from 100B, quality-weighted" without ever materializing
    cumulative weights. Each doc gets key = -ln(u)/w with u uniform in
    (0,1); the n smallest keys ARE a weight-proportional sample without
    replacement (the exponential race: key ~ Exp(w), min of exponentials
    picks i with prob w_i / sum w).

    Determinism + oracle: u comes from the engine-replayable md5-prefix
    hash (the x6_global_shuffle gear), u = (h+1)/2^32+1 in (0,1) exactly;
    the key is rounded to 6 dp BEFORE the ordering decision with doc_id
    tie-breaks on both sides (the cosine-ranking discipline, CLAUDE.md
    rule 3).

    Shape & scale: row-local key computation at scan speed, then global
    top-n via orderBy+limit, which Spark plans as TakeOrderedAndProject —
    per-partition bounded heaps + a driver merge of n_partitions * n rows,
    NO global sort shuffle. At 100 TB this is one scan; the reservoir never
    exceeds n per task."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (h + 1).cast("double") / F.lit(4294967297.0)
    key = F.round(-F.log(u) / F.col("n_chars").cast("double"), 6)
    return (
        docs.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("weight"),
            key.alias("es_key"),
        )
        .orderBy("es_key", "doc_id")
        .limit(WSAMPLE_N)
    )


QUERIES["x6_weighted_sample"] = x6_weighted_sample

ORACLES["x6_weighted_sample"] = f"""
    SELECT doc_id, source,
           CAST(n_chars AS BIGINT) AS weight,
           round(
               -ln((CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)),
                          1, 8)) AS BIGINT) + 1.0) / 4294967297.0)
               / CAST(n_chars AS DOUBLE), 6) AS es_key
    FROM documents
    WHERE n_chars > 0
    ORDER BY es_key, doc_id
    LIMIT {WSAMPLE_N}
"""


# ---------------------------------------------------------------------------
# X6 — DoReMi-style excess-loss domain reweighting
# ---------------------------------------------------------------------------

DOREMI_TEMP = 1.0  # excess-loss temperature (exp(excess / T))


def x6_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-loss domain reweighting in the DoReMi spirit (Xie et al.
    NeurIPS'23 "Doremi: Optimizing Data Mixtures"): domains where the
    reference model's loss exceeds the best-achieved loss get UPWEIGHTED
    proportionally to exp(excess_loss / T), multiplied into the baseline
    (token-share) mixture and renormalized. The full method iterates this
    with proxy-model training; this operator is the single reweighting
    step with the corpus's own add-one unigram LM standing in as the
    frozen reference scorer (the same self-contained-LM substitution as
    ``x3_unigram_logprob`` / ``x3_ccnet_bucket``).

    Per source: token mass, baseline share, token-weighted cross-entropy
    under the corpus LM, excess over the best source, and the final
    normalized domain weight — upweighted sources are exactly the
    high-excess-loss ones (pinned by the unit test's easy-vs-hard
    corpus).

    Scale shape: the posting-table join of the unigram scorer (token-
    keyed, map-side combined) collapses straight to an n_sources-row
    aggregate; min/normalize run as windows over that tiny aggregate
    (the x6_source_mixing bounded-window pattern); nothing after the
    scan is larger than n_sources rows."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(normalize_ws(F.col("text")))
    tok = docs.filter(F.length(F.trim(norm)) > 0).select(
        "source", F.explode(F.split(norm, " ")).alias("t")
    )
    tf = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    totals = tf.agg(
        F.sum("c").cast("double").alias("corpus_n"),
        F.count(F.lit(1)).cast("double").alias("vocab_v"),
    )
    per_src = (
        tok.join(tf, "t")
        .crossJoin(F.broadcast(totals))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.log(
                    (F.col("c") + F.lit(1)).cast("double")
                    / (F.col("corpus_n") + F.col("vocab_v"))
                )
            ).alias("s"),
        )
    )
    # bounded windows: consume the n_sources-row aggregate, never raw rows
    w_all = Window.partitionBy()
    xent = -F.col("s") / F.col("n_tokens")
    base = per_src.select(
        "source",
        "n_tokens",
        (F.col("n_tokens") / F.sum("n_tokens").over(w_all)).alias("base_share"),
        xent.alias("xent"),
    )
    excess = F.col("xent") - F.min("xent").over(w_all)
    scored = base.select(
        "source", "n_tokens", "base_share", "xent", excess.alias("excess")
    )
    raw = F.col("base_share") * F.exp(F.col("excess") / F.lit(DOREMI_TEMP))
    return scored.select(
        "source",
        "n_tokens",
        "base_share",
        "xent",
        "excess",
        (raw / F.sum(raw).over(w_all)).alias("domain_weight"),
    )


QUERIES["x6_doremi_weights"] = x6_doremi_weights

ORACLES["x6_doremi_weights"] = f"""
    WITH tk AS (
        SELECT source,
               unnest(string_split(trim(regexp_replace(lower(text),
                   '\\s+', ' ', 'g')), ' ')) AS t
        FROM documents
        WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0
    ), tf AS (
        SELECT t, count(*) AS c FROM tk GROUP BY t
    ), tot AS (
        SELECT CAST(sum(c) AS DOUBLE) AS corpus_n,
               CAST(count(*) AS DOUBLE) AS vocab_v
        FROM tf
    ), per_src AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_tokens,
               sum(ln(CAST(tf.c + 1 AS DOUBLE) / (tot.corpus_n + tot.vocab_v)))
                   AS s
        FROM tk JOIN tf USING (t) CROSS JOIN tot
        GROUP BY source
    ), base AS (
        SELECT source, n_tokens,
               n_tokens / sum(n_tokens) OVER () AS base_share,
               -s / n_tokens AS xent
        FROM per_src
    ), scored AS (
        SELECT source, n_tokens, base_share, xent,
               xent - min(xent) OVER () AS excess
        FROM base
    )
    SELECT source, n_tokens, base_share, xent, excess,
           base_share * exp(excess / CAST({DOREMI_TEMP} AS DOUBLE))
               / sum(base_share * exp(excess / CAST({DOREMI_TEMP} AS DOUBLE)))
                     OVER () AS domain_weight
    FROM scored
"""


def x10_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order: band every document into one of four
    difficulty phases by the frozen quality model's keep-probability
    (phase 1 = easiest quarter-band, phase 4 = hardest), then lay out a
    deterministic within-phase shuffle — md5 shuffle key, hash shard, and
    per-(phase, shard) position. The easy-to-hard schedule loader: training
    consumes phase 1's shards first, each internally shuffled.

    Composition of two verified primitives (x3_quality_model's scorer and
    x6_global_shuffle's sharded-shuffle layout) into the schedule a 100 TB
    run actually writes: phase banding is row-local on FIXED probability
    thresholds (0.25/0.5/0.75 of the 6-dp-rounded keep_prob — a data-free
    decision, unlike a global ntile which would need a full sort), shard
    assignment is hash-local, and the only shuffle is the per-(phase, shard)
    position sort — one exchange, one output file per (phase, shard).

    Round-before-band: keep_prob is sigmoid(exp) whose ulps differ across
    engines, so the band is decided on round(keep_prob, 6) (CLAUDE.md
    rule 3 — booleans/buckets on rounded inputs only)."""
    from swiftbulkuploader_spark.operators.textops import x3_quality_model

    qm = x3_quality_model(spark, sf_dir).select("doc_id", "keep_prob")
    rp = F.round(F.col("keep_prob"), 6)
    phase = (F.lit(4) - F.least(F.floor(rp * F.lit(4.0)).cast("int"), F.lit(3))).cast(
        "int"
    )
    key = F.md5(F.concat(F.lit("42:"), F.col("doc_id").cast("string")))
    keyed = qm.select(
        "doc_id", "keep_prob", phase.alias("phase"), key.alias("shuffle_key")
    )
    shard = (
        F.conv(F.substring("shuffle_key", 1, 8), 16, 10).cast("long")
        % F.lit(N_SHARDS)
    ).cast("int")
    w = Window.partitionBy("phase", "shard_id").orderBy("shuffle_key")
    return (
        keyed.withColumn("shard_id", shard)
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "keep_prob", "phase", "shard_id", "pos")
    )


QUERIES["x10_curriculum_order"] = x10_curriculum_order

ORACLES["x10_curriculum_order"] = f"""
    WITH f AS (
        SELECT doc_id, n_chars,
               string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks,
               CASE WHEN length(text) > 0
                    THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text)
                    ELSE 0.0 END AS alpha_ratio
        FROM documents
    ), z AS (
        SELECT doc_id,
               CAST(-2.0 AS DOUBLE)
               + CAST(0.35 AS DOUBLE) * ln(CAST(1 AS DOUBLE) + CAST(n_chars AS DOUBLE))
               + CAST(1.5 AS DOUBLE) * alpha_ratio
               + CAST(2.0 AS DOUBLE)
                 * (len(list_filter(toks, t -> t IN ('the','and','of','to','is')))::DOUBLE
                    / greatest(len(toks), 1)) AS z
        FROM f
    ), q AS (
        SELECT doc_id,
               CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-round(z, 6))) AS keep_prob
        FROM z
    ), ph AS (
        SELECT doc_id, keep_prob,
               CAST(4 - least(CAST(floor(round(keep_prob, 6) * CAST(4 AS DOUBLE))
                                   AS INT), 3) AS INT) AS phase,
               md5('42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        FROM q
    ), sh AS (
        SELECT *,
               CAST(CAST(('0x' || substr(shuffle_key, 1, 8)) AS BIGINT)
                    % {N_SHARDS} AS INT) AS shard_id
        FROM ph
    )
    SELECT doc_id, keep_prob, phase, shard_id,
           CAST(row_number() OVER (PARTITION BY phase, shard_id
                                   ORDER BY shuffle_key) AS INT) AS pos
    FROM sh
"""


CB_BETA = 0.999


def x6_class_balanced_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced source weights by EFFECTIVE NUMBER of samples (Cui et
    al. CVPR'19): E_n = (1 - beta^n)/(1 - beta) counts how many
    NON-REDUNDANT samples n draws contribute (saturating at 1/(1-beta) =
    1000 — past that, more data from a source adds almost nothing), and the
    loss/sampling weight is 1/E_n renormalized. The principled alternative
    to inverse-frequency reweighting when sources overlap internally:
    single-doc sources get E_n = 1 exactly, huge sources converge to the
    same ceiling instead of being crushed to ~0.

    Shape: one corpus aggregate to n_sources rows, the normalizing sum as
    a window over that tiny aggregate (the x6_source_mixing pattern).
    beta^n = pow() carries engine ulps absorbed by the verifier's 9-digit
    normalization; everything else is exact divisions."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    one_minus_b = F.lit(1.0) - F.lit(CB_BETA)
    en = (F.lit(1.0) - F.pow(F.lit(CB_BETA), F.col("n_docs").cast("double"))) / one_minus_b
    w_all = Window.partitionBy()
    raw = F.lit(1.0) / F.col("effective_num")
    out = per.select(
        "source", F.col("n_docs").cast("long").alias("n_docs"), en.alias("effective_num")
    )
    return out.select(
        "source",
        "n_docs",
        "effective_num",
        (raw / F.sum(raw).over(w_all)).alias("weight"),
    )


QUERIES["x6_class_balanced_weights"] = x6_class_balanced_weights

ORACLES["x6_class_balanced_weights"] = f"""
    WITH per AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1
    ), en AS (
        SELECT source, n_docs,
               (CAST(1 AS DOUBLE) - pow(CAST({CB_BETA} AS DOUBLE),
                                        CAST(n_docs AS DOUBLE)))
                   / (CAST(1 AS DOUBLE) - CAST({CB_BETA} AS DOUBLE))
                   AS effective_num
        FROM per
    )
    SELECT source, n_docs, effective_num,
           (CAST(1 AS DOUBLE) / effective_num)
               / sum(CAST(1 AS DOUBLE) / effective_num) OVER () AS weight
    FROM en
"""


KFOLD_K = 5


def x6_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment + balance audit:
    every doc hashes to one of KFOLD_K folds (md5 of doc_id — the same
    engine-shared hash family as the stratified split and DSIR buckets),
    and the report shows per-(fold, lang) counts with each fold's share
    of that language — the table that certifies the folds are exchangeable
    BEFORE any cross-validated quality-model number is trusted (a fold
    that over-draws one language biases its round's eval).

    Shape: one row-local hash + a (fold, lang) aggregate + a broadcast
    join of the bounded lang totals. All outputs exact integers or
    integer ratios. The assignment is reproducible on any engine — the
    property that matters when train/eval splits outlive the cluster
    that made them."""
    docs = load_table(spark, sf_dir, "documents")
    fold = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
               16, 10).cast("long"),
        F.lit(KFOLD_K),
    ).cast("int")
    per = (
        docs.select(fold.alias("fold"), "lang")
        .groupBy("fold", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    lang_tot = per.groupBy("lang").agg(
        F.sum("n_docs").cast("long").alias("lang_total")
    )
    return per.join(F.broadcast(lang_tot), "lang").select(
        "fold",
        "lang",
        "n_docs",
        "lang_total",
        (
            F.col("n_docs").cast("double")
            / F.col("lang_total").cast("double")
        ).alias("fold_share"),
    )


QUERIES["x6_kfold_assignment"] = x6_kfold_assignment

ORACLES["x6_kfold_assignment"] = f"""
    WITH f AS (
        SELECT CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                         AS BIGINT) % {KFOLD_K} AS INT) AS fold,
               lang
        FROM documents
    ), per AS (
        SELECT fold, lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM f GROUP BY fold, lang
    ), lt AS (
        SELECT lang, CAST(sum(n_docs) AS BIGINT) AS lang_total
        FROM per GROUP BY lang
    )
    SELECT per.fold, per.lang, per.n_docs, lt.lang_total,
           CAST(per.n_docs AS DOUBLE) / CAST(lt.lang_total AS DOUBLE)
               AS fold_share
    FROM per JOIN lt ON per.lang = lt.lang
"""


def x10_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report over the x3_pack_sequences plan — the
    one-row-per-shard health table a training run reads before launching:
    chunks, docs and token mass per language shard, mean fill rate
    against the 2048-token budget, the overflow count (concat-and-chunk
    lets a straddling doc spill its tail), and the padding waste a
    non-overflowing chunk would pay. A shard whose fill rate sags means
    its doc-length mix fights the budget (re-shard or raise the budget
    before burning accelerator hours).

    Shape: the same per-shard window cumsum as the packing plan (no
    bin-packing loop), then one per-shard aggregate. Integer masses and
    ratios-of-integers only — bit-identical across engines; the fill
    rate uses each shard's FULL chunk count times the budget as the
    denominator (the accelerator's allocation, overflow or not)."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = docs.select(
        "lang", "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    cum_excl = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    placed = toks.withColumn(
        "chunk_id", F.floor(cum_excl / F.lit(TOKEN_BUDGET)).cast("long")
    )
    chunks = placed.groupBy("lang", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("chunk_tokens"),
    )
    budget = F.lit(TOKEN_BUDGET).cast("long")
    return chunks.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("chunk_tokens").cast("long").alias("total_tokens"),
        (
            F.sum("chunk_tokens").cast("double")
            / (F.count(F.lit(1)) * budget).cast("double")
        ).alias("fill_rate"),
        F.sum(F.when(F.col("chunk_tokens") > budget, 1).otherwise(0))
        .cast("long")
        .alias("n_overflow_chunks"),
        F.sum(
            F.when(
                F.col("chunk_tokens") <= budget,
                budget - F.col("chunk_tokens"),
            ).otherwise(0)
        ).cast("long").alias("padding_waste_tokens"),
    )


QUERIES["x10_packing_efficiency"] = x10_packing_efficiency

ORACLES["x10_packing_efficiency"] = f"""
    WITH t AS (
        SELECT lang, doc_id,
               CAST({TOKENS_DUCK} AS BIGINT) AS n_tokens
        FROM documents
    ), placed AS (
        SELECT lang, doc_id, n_tokens,
               coalesce(sum(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {TOKEN_BUDGET} AS chunk_id
        FROM t
    ), chunks AS (
        SELECT lang, chunk_id, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens
        FROM placed GROUP BY lang, chunk_id
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(chunk_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(chunk_tokens) AS DOUBLE)
               / CAST(count(*) * {TOKEN_BUDGET} AS DOUBLE) AS fill_rate,
           CAST(sum(CASE WHEN chunk_tokens > {TOKEN_BUDGET} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overflow_chunks,
           CAST(sum(CASE WHEN chunk_tokens <= {TOKEN_BUDGET}
                         THEN {TOKEN_BUDGET} - chunk_tokens ELSE 0 END)
                AS BIGINT) AS padding_waste_tokens
    FROM chunks GROUP BY lang
"""


EPOCH_BUDGET = 16384  # training tokens per epoch slice


def x10_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch plan over the packed corpus: the x3_pack_sequences chunks,
    laid out in (lang, chunk_id) order, are sliced into
    EPOCH_BUDGET-token epochs by cumulative chunk tokens — the schedule
    a dataloader walks, with per-epoch chunk/doc/token totals and the
    language span each epoch touches (an epoch pinned inside one
    language flags curriculum-order risk before the run starts).

    Scale shape: the chunk cumsum is TWO-LEVEL (the x7_kaplan_meier
    pattern) — within-lang windows PARTITIONED by lang, lang-level
    offsets from a bounded window over the per-lang totals — so no
    chunk-proportional single-task window exists (chunks grow with the
    corpus). All masses are exact integers; epoch assignment is integer
    division."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = docs.select(
        "lang", "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    cum_excl = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    placed = toks.withColumn(
        "chunk_id", F.floor(cum_excl / F.lit(TOKEN_BUDGET)).cast("long")
    )
    chunks = placed.groupBy("lang", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("chunk_tokens"),
    )
    # lang-level offsets (bounded: one row per language)
    l_tot = chunks.groupBy("lang").agg(
        F.sum("chunk_tokens").alias("l_tokens")
    )
    w_l = Window.orderBy("lang").rowsBetween(Window.unboundedPreceding, -1)
    l_off = l_tot.select(
        "lang",
        F.coalesce(F.sum("l_tokens").over(w_l), F.lit(0).cast("long"))
        .alias("tok_before_lang"),
    )
    w_in = Window.partitionBy("lang").orderBy("chunk_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    placed_chunks = chunks.join(F.broadcast(l_off), "lang").select(
        "lang",
        "chunk_id",
        "n_docs",
        "chunk_tokens",
        F.floor(
            (
                F.col("tok_before_lang")
                + F.coalesce(F.sum("chunk_tokens").over(w_in),
                             F.lit(0).cast("long"))
            )
            / F.lit(EPOCH_BUDGET)
        ).cast("long").alias("epoch"),
    )
    return placed_chunks.groupBy("epoch").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("chunk_tokens").cast("long").alias("epoch_tokens"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.min("lang").alias("first_lang"),
        F.max("lang").alias("last_lang"),
    )


QUERIES["x10_epoch_plan"] = x10_epoch_plan

ORACLES["x10_epoch_plan"] = f"""
    WITH t AS (
        SELECT lang, doc_id,
               CAST({TOKENS_DUCK} AS BIGINT) AS n_tokens
        FROM documents
    ), placed AS (
        SELECT lang, doc_id, n_tokens,
               coalesce(sum(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {TOKEN_BUDGET} AS chunk_id
        FROM t
    ), chunks AS (
        SELECT lang, chunk_id, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens
        FROM placed GROUP BY lang, chunk_id
    ), l_off AS (
        SELECT lang,
               coalesce(sum(l_tokens) OVER (ORDER BY lang
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS tok_before_lang
        FROM (SELECT lang, sum(chunk_tokens) AS l_tokens
              FROM chunks GROUP BY lang)
    ), pc AS (
        SELECT c.lang, c.chunk_id, c.n_docs, c.chunk_tokens,
               (o.tok_before_lang
                + coalesce(sum(c.chunk_tokens) OVER (
                      PARTITION BY c.lang ORDER BY c.chunk_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
               // {EPOCH_BUDGET} AS epoch
        FROM chunks c JOIN l_off o ON c.lang = o.lang
    )
    SELECT CAST(epoch AS BIGINT) AS epoch,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(chunk_tokens) AS BIGINT) AS epoch_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           min(lang) AS first_lang,
           max(lang) AS last_lang
    FROM pc GROUP BY epoch
"""


MIX_EPOCHS = 4           # annealed schedule length
EPOCH_TOKEN_BUDGET = 10**6  # per-epoch training-token budget


def x10_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-ANNEALED multi-epoch mixing schedule — the curriculum
    extension of x6_source_mixing (one static alpha) that modern
    pretraining recipes actually run: early epochs sample flattened
    (alpha = 0.5, low-resource sources upsampled for coverage), the
    final epoch samples proportionally (alpha = 1.0, the corpus speaks
    with its real distribution). alpha_e = 0.5 + 0.5*(e-1)/(E-1) anneals
    linearly over MIX_EPOCHS epochs; per (epoch, source): tempered mix
    weight, target tokens against the per-epoch budget, and the
    upsampling factor vs raw share.

    Scale shape: ONE corpus aggregate reduces to n_sources rows, then a
    bounded cross join with the MIX_EPOCHS-row epoch frame and windows
    PARTITIONED BY epoch over that n_sources x E table — everything
    after the scan is O(sources x epochs). pow ulp differences between
    engines sit below the 6-dp rounds (the x6_source_mixing precedent).

    Reference parity: none (reference uploads files); §2.9
    training-manifest family."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = (
        docs.select(
            "source",
            token_count(F.col("text")).cast("long").alias("n_tokens"),
        )
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("n_tokens"))
    )
    epochs = spark.range(1, MIX_EPOCHS + 1).select(
        F.col("id").cast("int").alias("epoch"),
        (
            F.lit(0.5)
            + F.lit(0.5)
            * (F.col("id") - F.lit(1)).cast("double")
            / F.lit(float(MIX_EPOCHS - 1))
        ).alias("alpha"),
    )
    grid = per_src.crossJoin(F.broadcast(epochs))  # bounded: sources x E
    w_ep = Window.partitionBy("epoch")
    raw_share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(
        w_ep
    ).cast("double")
    tempered = F.pow(raw_share, F.col("alpha"))
    mix_w = tempered / F.sum(tempered).over(w_ep)
    target = F.round(mix_w * F.lit(EPOCH_TOKEN_BUDGET)).cast("long")
    return grid.select(
        "epoch",
        "source",
        F.round("alpha", 6).alias("alpha"),
        "n_tokens",
        F.round(raw_share, 6).alias("raw_share"),
        F.round(mix_w, 6).alias("mix_weight"),
        target.alias("target_tokens"),
        F.round(mix_w / raw_share, 4).alias("upsample_x"),
    )


QUERIES["x10_mixture_schedule"] = x10_mixture_schedule

_TOKCNT_DUCK = (
    "CAST(CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0 "
    "THEN 0 ELSE len(string_split(trim(regexp_replace(text, '\\s+', ' ', "
    "'g')), ' ')) END AS BIGINT)"
)

ORACLES["x10_mixture_schedule"] = f"""
    WITH per_src AS (
        SELECT source, CAST(sum({_TOKCNT_DUCK}) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ), ep AS (
        SELECT CAST(e AS INT) AS epoch,
               CAST(0.5 AS DOUBLE)
                   + CAST(0.5 AS DOUBLE) * CAST(e - 1 AS DOUBLE)
                     / CAST({MIX_EPOCHS - 1} AS DOUBLE) AS alpha
        FROM unnest(range(1, {MIX_EPOCHS + 1})) AS t(e)
    ), grid AS (
        SELECT * FROM per_src CROSS JOIN ep
    ), shares AS (
        SELECT *,
               CAST(n_tokens AS DOUBLE)
                   / CAST(sum(n_tokens) OVER (PARTITION BY epoch) AS DOUBLE)
                   AS raw_share,
               pow(CAST(n_tokens AS DOUBLE)
                   / CAST(sum(n_tokens) OVER (PARTITION BY epoch) AS DOUBLE),
                   alpha) AS tempered
        FROM grid
    ), weights AS (
        SELECT *, tempered / sum(tempered) OVER (PARTITION BY epoch) AS mix_w
        FROM shares
    )
    SELECT epoch, source,
           round(alpha, 6) AS alpha,
           n_tokens,
           round(raw_share, 6) AS raw_share,
           round(mix_w, 6) AS mix_weight,
           CAST(round(mix_w * {EPOCH_TOKEN_BUDGET}) AS BIGINT)
               AS target_tokens,
           round(mix_w / raw_share, 4) AS upsample_x
    FROM weights
"""


RESUME_DONE_MOD = 3  # shards with shard_id % 3 == 0 are already trained


def x10_resume_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-run RESUME plan — the reference's core semantic (resume
    skips already-uploaded paths, readme.md `WHERE uploaded=0`) promoted
    to the training-shard level: given the deterministic shard layout
    (x6_global_shuffle's md5 assignment) and a completed-shard set (a
    deterministic fixture: shard_id % RESUME_DONE_MOD == 0, standing in
    for the trainer's checkpoint manifest), emit per shard its status,
    size, and for PENDING shards the resume order plus how many tokens
    precede them in the remaining schedule — what a restarted trainer
    reads to continue without reprocessing.

    Shape: one doc scan -> row-local shard assignment -> 8-row shard
    aggregate; the ordering windows run PARTITIONED BY status over that
    N_SHARDS-row table. Sentinels -1 keep done rows NULL-free.

    Reference parity: readme.md:42 resume semantics (bulkupload.py's
    uploaded=0 re-run), generalized from file rows to training shards."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("42:"), F.col("doc_id").cast("string")))
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
        % F.lit(N_SHARDS)
    ).cast("int")
    per_shard = (
        docs.select(
            shard.alias("shard_id"),
            token_count(F.col("text")).cast("long").alias("n_tok"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .withColumn(
            "status",
            F.when(
                F.col("shard_id") % RESUME_DONE_MOD == 0, F.lit("done")
            ).otherwise(F.lit("pending")),
        )
    )
    w_ord = Window.partitionBy("status").orderBy("shard_id")
    w_cum = (
        Window.partitionBy("status")
        .orderBy("shard_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pending = F.col("status") == "pending"
    return per_shard.select(
        F.col("shard_id").cast("int").alias("shard_id"),
        "status",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.when(pending, F.row_number().over(w_ord))
        .otherwise(F.lit(-1)).cast("int").alias("resume_order"),
        F.when(
            pending, F.coalesce(F.sum("n_tokens").over(w_cum), F.lit(0))
        ).otherwise(F.lit(-1)).cast("long").alias("tokens_before"),
    )


QUERIES["x10_resume_plan"] = x10_resume_plan

ORACLES["x10_resume_plan"] = f"""
    WITH per_shard AS (
        SELECT CAST(CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) % {N_SHARDS} AS INT) AS shard_id,
               count(*) AS n_docs,
               sum({_TOKCNT_DUCK}) AS n_tokens
        FROM documents
        GROUP BY 1
    ), st AS (
        SELECT *,
               CASE WHEN shard_id % {RESUME_DONE_MOD} = 0
                    THEN 'done' ELSE 'pending' END AS status
        FROM per_shard
    )
    SELECT shard_id, status,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(CASE WHEN status = 'pending'
                THEN row_number() OVER (PARTITION BY status
                                        ORDER BY shard_id)
                ELSE -1 END AS INT) AS resume_order,
           CAST(CASE WHEN status = 'pending'
                THEN coalesce(sum(n_tokens) OVER (
                         PARTITION BY status ORDER BY shard_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0)
                ELSE -1 END AS BIGINT) AS tokens_before
    FROM st
"""


def x10_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff — the CDC primitive for TRAINING-SET
    versioning (round 12 widening; the doc-level complement to
    x4_json_diff's field-level diff): given two epochs of the corpus,
    classify every doc_id as added / removed / changed / unchanged by
    CONTENT fingerprint, so an epoch-over-epoch manifest records exactly
    what a retrain will see differently. This is the audit a 100 TB
    recrawl publishes next to its manifest: counts by status gate the
    retrain decision (a 40% 'changed' epoch needs a different learning
    schedule than a 2% one).

    Deterministic two-epoch fixture from one corpus:
    A = docs with doc_id % 5 != 0, B = docs with doc_id % 7 != 0 with
    text rewritten for doc_id % 11 == 0 (recrawl edits). A-only ids
    (doc_id % 7 == 0, % 5 != 0) classify 'removed', B-only ids
    (doc_id % 5 == 0, % 7 != 0) 'added', and ids in both classify by
    fingerprint equality ('changed' iff doc_id % 11 == 0 via the edit)
    — all four statuses live at every SF.

    Shape: one scan builds both epoch fingerprint frames (md5 of
    ws-normalized lowercased text — the x1_exact_dedup identity), one
    full outer join on doc_id, a CASE. At scale both sides hash-shuffle
    once on doc_id; with both manifests bucketed by doc_id the join is
    co-located and shuffle-free."""
    from swiftbulkuploader_spark.functions.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id", fingerprint(F.col("text")).alias("fp_a")
    )
    edited = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(F.col("text"), F.lit(" recrawl-edit")),
    ).otherwise(F.col("text"))
    b = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id", fingerprint(edited).alias("fp_b")
    )
    j = a.join(b, "doc_id", "full_outer")
    status = (
        F.when(F.col("fp_a").isNull(), F.lit("added"))
        .when(F.col("fp_b").isNull(), F.lit("removed"))
        .when(F.col("fp_a") == F.col("fp_b"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("doc_id", status.alias("status"))


QUERIES["x10_dataset_diff"] = x10_dataset_diff

ORACLES["x10_dataset_diff"] = """
    WITH a AS (
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                   AS fp_a
        FROM documents WHERE doc_id % 5 <> 0
    ), b AS (
        SELECT doc_id,
               md5(lower(trim(regexp_replace(
                   CASE WHEN doc_id % 11 = 0
                        THEN text || ' recrawl-edit' ELSE text END,
                   '\\s+', ' ', 'g')))) AS fp_b
        FROM documents WHERE doc_id % 7 <> 0
    )
    SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                WHEN fp_a = fp_b THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
"""


# ---------------------------------------------------------------------------
# X10 — dataset integrity manifest (round 13)
# ---------------------------------------------------------------------------

INTEGRITY_SHARDS = 8  # manifest granularity: one checksum row per shard


def x10_integrity_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent shard checksums + root for the documents
    corpus — the tamper-evidence manifest a served training dataset
    ships with (the artifact-manifest discipline of ann_index /
    model_store, extended to the DATA itself): any single-byte change
    to any document flips its 60-bit content hash, which propagates to
    its shard checksum and the root. The consumer re-derives the
    manifest and diffs — a mismatch names the shard, x10_dataset_diff
    then names the row.

    Checksums are SUMS of per-row md5-prefix hashes, so they are
    ORDER- and PARTITIONING-independent: at 100 TB the recompute runs
    on whatever partitioning the cluster has, no sort required, and
    shard checksums combine into the root by the same addition
    (mergeable, like every sketch in the x6 family). Integrity, not
    cryptography: a 60-bit additive hash detects corruption and drift,
    not a deliberate collision-crafting adversary (document, don't
    oversell).

    Shape: one scan, one rollup on an 8-value key (map-side combined),
    O(shards) output. The grand-total rollup row IS the root (shard
    -1) — per-shard and root come from the same single pass.

    Reference parity: none (§2.9 lifecycle extension)."""
    docs = load_table(spark, sf_dir, "documents")
    return integrity_manifest_from_docs(docs)


def integrity_base(
    docs: DataFrame, n_shards: int = INTEGRITY_SHARDS
) -> DataFrame:
    """Per-row integrity derivation (shard, row_hash, n_bytes) — shared
    by the batch manifest and the streaming partials so stream == batch
    holds by construction."""
    return docs.select(
        (F.col("doc_id") % n_shards).alias("shard"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("text"),
                    )
                ),
                1, 15,
            ),
            16, 10,
        ).cast("long").alias("row_hash"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )


def integrity_manifest_from_docs(
    docs: DataFrame, n_shards: int = INTEGRITY_SHARDS
) -> DataFrame:
    """Core of x10_integrity_manifest, factored for crafted tamper
    tests: `docs` carries (doc_id, text); returns per-shard rows plus
    the root (shard -1) from ONE rollup pass."""
    return (
        integrity_base(docs, n_shards).rollup("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bytes").cast("long").alias("n_bytes"),
            F.sum(F.col("row_hash").cast("decimal(38,0)"))
            .cast("string").alias("checksum"),
        )
        .select(
            F.coalesce(F.col("shard"), F.lit(-1)).alias("shard"),
            "n_docs", "n_bytes", "checksum",
        )
        .orderBy("shard")
    )


QUERIES["x10_integrity_manifest"] = x10_integrity_manifest

ORACLES["x10_integrity_manifest"] = f"""
    WITH base AS (
        SELECT doc_id % {INTEGRITY_SHARDS} AS shard,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text),
                                    1, 15)) AS BIGINT) AS row_hash,
               CAST(strlen(text) AS BIGINT) AS n_bytes
        FROM documents
    )
    SELECT COALESCE(shard, -1) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_bytes) AS BIGINT) AS n_bytes,
           CAST(sum(row_hash) AS VARCHAR) AS checksum
    FROM base GROUP BY ROLLUP(shard)
    ORDER BY shard
"""
