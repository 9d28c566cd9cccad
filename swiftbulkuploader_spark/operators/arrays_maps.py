"""Array higher-order functions, map columns, and inverted-index search.

The reference has no array/map surface at all (SURVEY.md §2.6: "no array/map/
json functions exist"); a training-data pipeline lives on them — token
arrays, metadata maps, posting lists. Everything here is a pure Column
expression (whole-stage codegen, no Python) and DuckDB-oracled.

Lambda discipline (see functions/text.py): HOF lambda bodies touch ONLY
lambda variables — interpreted lambdas re-evaluate captured subexpressions
per element, which turns linear scans quadratic (the O(n^2) shingle bug).

Scale notes:
* x3_array_hof_suite / x4_map_ops are single codegen'd projections — scan-
  bound, embarrassingly parallel at any size.
* x3_doc_frequency / x3_tfidf_search explode tokens once and aggregate:
  shuffle volume is (doc_id, term) pairs, partial-aggregated map-side; the
  100 TB form partitions the posting list by term (uniform by hashing).
* tf-idf joins a tiny per-term df table — broadcast by construction (the
  query vocabulary is bounded), so the fact side never re-shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from swiftbulkuploader_spark.catalog import load_table
from swiftbulkuploader_spark.functions.text import normalize_ws

# Fixed query vocabulary for the search shapes: static, so the df-side of the
# tf-idf join is bounded and broadcastable regardless of corpus size.
SEARCH_TERMS = ("data", "scan", "join")


def _tokens(text: F.Column) -> F.Column:
    """Whitespace tokens of normalized text (matches textops' tokenizer)."""
    return F.split(normalize_ws(text), " ")


def x3_array_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array HOF coverage over token arrays: filter, aggregate, transform,
    sort/distinct/slice, min — per-document token profile."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    first3 = F.slice(F.array_sort(F.array_distinct(toks)), 1, 3)
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 6)).cast("long").alias("n_long_tokens"),
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).alias("total_token_chars"),
        F.array_min(toks).alias("min_token"),
        F.transform(first3, lambda t: F.concat_ws(":", t, F.length(t).cast("string"))).alias("first3_tagged"),
    )


def x4_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-column ops over event props: parse once to map<string,int>, then
    key lookup / cardinality / sorted key list (vs repeated get_json_object,
    which re-parses the JSON per extraction)."""
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return events.select(
        "event_id",
        F.element_at(m, "k").cast("long").alias("k_value"),
        F.size(m).cast("long").alias("n_keys"),
        F.array_sort(F.map_keys(m)).alias("keys_sorted"),
    )


def x3_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list statistics (the inverted-index build): for every token
    seen in >= 10 documents, its document frequency and total term count.
    One explode + one partial-aggregated shuffle on term."""
    docs = load_table(spark, sf_dir, "documents")
    posting = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    return (
        posting.groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("tf_total"),
        )
        .filter(F.col("df") >= 10)
    )


VOCAB_BUCKET = 50  # docs per growth-curve sample point


def x3_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve: cumulative distinct-token count
    (and cumulative token count) as the corpus grows in doc_id order — the
    tokenizer-sizing diagnostic (how fast does vocabulary saturate?).

    Scale shape: "cumulative distinct" is NOT a running dropDuplicates —
    each term contributes at its FIRST document (one groupBy(term) min),
    new-term counts roll up per doc-bucket, and the prefix sum runs over
    the BUCKETED curve (corpus_size/50 rows), not per-doc — so the only
    unpartitioned ordered window in the plan operates on a frame that is
    ~5 orders of magnitude smaller than the corpus. A per-doc curve at
    100 TB would funnel every row through one ordered window partition;
    sampling the curve at bucket granularity is what makes it computable.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") / VOCAB_BUCKET).cast("long").alias("bucket")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(_tokens(F.col("text")))).alias("term")
    )
    new_terms = (
        toks.groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
        .select((F.col("first_doc") / VOCAB_BUCKET).cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("new_terms"))
    )
    per_bucket = (
        docs.select(bucket, F.size(_tokens(F.col("text"))).cast("long").alias("n_toks"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_toks").alias("bucket_tokens"))
        .join(new_terms, "bucket", "left")
        .na.fill({"new_terms": 0})
    )
    # bounded input: the cumulative window runs over one row per bucket
    # (a handful), so the unpartitioned WindowExec warning is intentional
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return per_bucket.select(
        "bucket",
        "n_docs",
        "bucket_tokens",
        F.col("new_terms").alias("bucket_new_terms"),
        F.sum("bucket_tokens").over(w).alias("cum_tokens"),
        F.sum("new_terms").over(w).alias("cum_vocab"),
    )


def x3_tfidf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scored keyword search: docs containing ALL query terms, ranked by
    tf-idf (sum over terms of tf * ln(N/df)).

    Spark shape = the scalable inverted-index probe: explode -> per-(doc,term)
    tf -> broadcast-join the (tiny, bounded-vocabulary) df table -> aggregate.
    N is a driver literal (metadata-only count) so no 1-row join appears.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # parquet row-count metadata; no scan
    terms = list(SEARCH_TERMS)

    posting = (
        docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
        .filter(F.col("term").isin(terms))
    )
    tf = posting.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.round(F.sum(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))), 6).alias("score"),
        )
        .filter(F.col("n_terms_hit") == len(terms))
        .select("doc_id", "score")
    )
    return scored


BM25_K1 = 1.2
BM25_B = 0.75


def x3_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson-Spärck Jones; the Lucene/
    Elasticsearch default) over the same inverted-index probe shape as
    x3_tfidf_search: per-term idf = ln((N - df + 0.5)/(df + 0.5) + 1),
    tf saturation k1=1.2, length normalization b=0.75 against the corpus
    average doc length. Docs matching ANY query term are scored (BM25 is
    a disjunctive ranker; the conjunctive form is tf-idf's twin above).

    Scale shape: explode -> term-filtered postings -> per-(doc,term) tf ->
    broadcast df table -> join per-doc lengths (co-keyed on doc_id) ->
    1-row broadcast of avgdl (ScalarSubquery pattern). N is a driver
    literal (parquet metadata count). Score ships UNROUNDED; ln/division
    ulps are absorbed by the verifier's 9-sig-digit normalization."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # parquet row-count metadata; no scan
    terms = list(SEARCH_TERMS)

    dl = docs.select("doc_id", F.size(_tokens(F.col("text"))).alias("dl"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    tf = (
        docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    norm = F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
    )
    per_term = idf * (
        F.col("tf") * F.lit(BM25_K1 + 1.0) / (F.col("tf") + norm)
    )
    return (
        tf.join(F.broadcast(df_tbl), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.sum(per_term).alias("score"),
        )
    )


def x3_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra per document: union/intersect/except of the token
    set against a fixed probe vocabulary, plus overlap predicate — the
    vocabulary-membership shape (stopword coverage, blocklist hits) as
    codegen'd array ops instead of an explode+join."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(_tokens(F.col("text")))
    probe = F.array(*[F.lit(t) for t in ("data", "scan", "join", "zzz")])
    return docs.select(
        "doc_id",
        F.array_sort(F.array_intersect(toks, probe)).alias("hits"),
        F.size(F.array_except(probe, toks)).cast("long").alias("n_missing"),
        F.size(F.array_union(toks, probe)).cast("long").alias("n_union"),
        F.arrays_overlap(toks, probe).alias("any_hit"),
    )


def x3_char_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram frequency profile per language (the classic lang-ID
    feature table): bigrams from each doc's first 64 chars, aggregated to
    (lang, bigram) counts, kept where count >= 50.

    The bigram build is transform over an index sequence reading substrings
    of a BOUNDED prefix — per-element cost is constant, so no O(n^2) HOF
    trap (see functions/text.py); the aggregation is one partial-agg
    shuffle on (lang, bigram)."""
    docs = load_table(spark, sf_dir, "documents")
    # sequence(1, 0) would step BACKWARD ([1, 0]), so guard the <2-char case
    grams = F.expr(
        "CASE WHEN length(substring(text, 1, 64)) >= 2 THEN "
        "transform(sequence(1, length(substring(text, 1, 64)) - 1), "
        "i -> substring(substring(text, 1, 64), i, 2)) "
        "ELSE array() END"
    )
    return (
        docs.select("lang", F.explode(grams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 50)
    )


QUERIES = {
    "x3_array_set_ops": x3_array_set_ops,
    "x3_char_ngrams": x3_char_ngrams,
    "x3_array_hof_suite": x3_array_hof_suite,
    "x4_map_ops": x4_map_ops,
    "x3_doc_frequency": x3_doc_frequency,
    "x3_vocab_growth": x3_vocab_growth,
    "x3_tfidf_search": x3_tfidf_search,
    "x3_bm25_search": x3_bm25_search,
}

_TOKS = "string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')"
_TERMS_SQL = ", ".join(f"'{t}'" for t in SEARCH_TERMS)

ORACLES = {
    "x3_array_set_ops": f"""
        WITH t AS (
            SELECT doc_id, list_distinct({_TOKS}) AS toks,
                   ['data', 'scan', 'join', 'zzz'] AS probe
            FROM documents
        )
        SELECT doc_id,
               list_sort(list_intersect(toks, probe)) AS hits,
               CAST(len(list_filter(probe, p -> NOT list_contains(toks, p))) AS BIGINT) AS n_missing,
               CAST(len(list_distinct(list_concat(toks, probe))) AS BIGINT) AS n_union,
               len(list_intersect(toks, probe)) > 0 AS any_hit
        FROM t
    """,
    "x3_char_ngrams": """
        WITH grams AS (
            SELECT lang,
                   substr(substr(text, 1, 64), ord, 2) AS bigram
            FROM (
                SELECT lang, text,
                       unnest(generate_series(1, greatest(length(substr(text, 1, 64)) - 1, 1))) AS ord
                FROM documents
                WHERE length(substr(text, 1, 64)) >= 2
            )
        )
        SELECT lang, bigram, count(*) AS n
        FROM grams GROUP BY lang, bigram HAVING count(*) >= 50
    """,
    "x3_array_hof_suite": f"""
        SELECT doc_id,
               CAST(len(list_filter({_TOKS}, t -> length(t) > 6)) AS BIGINT) AS n_long_tokens,
               CAST(coalesce(list_sum(list_transform({_TOKS}, t -> length(t))), 0) AS BIGINT) AS total_token_chars,
               list_min({_TOKS}) AS min_token,
               list_transform(list_sort(list_distinct({_TOKS}))[1:3],
                              t -> concat(t, ':', CAST(length(t) AS VARCHAR))) AS first3_tagged
        FROM documents
    """,
    "x4_map_ops": """
        SELECT event_id,
               CAST(props->>'k' AS BIGINT) AS k_value,
               CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
               list_sort(json_keys(props)) AS keys_sorted
        FROM events
    """,
    "x3_doc_frequency": f"""
        SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf_total
        FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
        GROUP BY term HAVING count(DISTINCT doc_id) >= 10
    """,
    "x3_vocab_growth": f"""
        WITH firsts AS (
            SELECT term, min(doc_id) AS first_doc
            FROM (SELECT doc_id, unnest(list_distinct({_TOKS})) AS term FROM documents)
            GROUP BY term
        ), nt AS (
            SELECT CAST(first_doc // 50 AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS new_terms
            FROM firsts GROUP BY 1
        ), pb AS (
            SELECT CAST(doc_id // 50 AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len({_TOKS})) AS BIGINT) AS bucket_tokens
            FROM documents GROUP BY 1
        )
        SELECT pb.bucket, pb.n_docs, pb.bucket_tokens,
               coalesce(nt.new_terms, 0) AS bucket_new_terms,
               CAST(sum(pb.bucket_tokens) OVER (ORDER BY pb.bucket) AS BIGINT) AS cum_tokens,
               CAST(sum(coalesce(nt.new_terms, 0)) OVER (ORDER BY pb.bucket) AS BIGINT) AS cum_vocab
        FROM pb LEFT JOIN nt ON pb.bucket = nt.bucket
    """,
    # same disjunctive BM25; every scalar forced to DOUBLE (k1/b/0.5
    # literals would fold as DECIMAL otherwise); score unrounded
    "x3_bm25_search": f"""
        WITH posting AS (
            SELECT doc_id, unnest({_TOKS}) AS term FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM posting WHERE term IN ({_TERMS_SQL})
            GROUP BY doc_id, term
        ), dfreq AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
        ), dl AS (
            SELECT doc_id, len({_TOKS}) AS dl FROM documents
        ), stats AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
        ), avg_l AS (
            SELECT avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl
        )
        SELECT tf.doc_id,
               CAST(count(*) AS BIGINT) AS n_terms_hit,
               sum(
                   ln((stats.n_docs - dfreq.df + CAST(0.5 AS DOUBLE))
                      / (dfreq.df + CAST(0.5 AS DOUBLE)) + CAST(1 AS DOUBLE))
                   * (tf.tf * CAST({BM25_K1 + 1.0} AS DOUBLE)
                      / (tf.tf + CAST({BM25_K1} AS DOUBLE)
                         * (CAST({1.0 - BM25_B} AS DOUBLE)
                            + CAST({BM25_B} AS DOUBLE)
                              * CAST(dl.dl AS DOUBLE) / avg_l.avgdl)))
               ) AS score
        FROM tf
        JOIN dfreq USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats CROSS JOIN avg_l
        GROUP BY tf.doc_id
    """,
    "x3_tfidf_search": f"""
        WITH posting AS (
            SELECT doc_id, unnest({_TOKS}) AS term FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM posting WHERE term IN ({_TERMS_SQL})
            GROUP BY doc_id, term
        ), dfreq AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
        ), n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id,
               round(sum(tf * ln(CAST(n_docs AS DOUBLE) / df)), 6) AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
        GROUP BY doc_id
        HAVING count(*) = {len(SEARCH_TERMS)}
    """,
}
