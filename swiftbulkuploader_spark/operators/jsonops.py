"""JSON column operators over `events.props` (SURVEY.md §2.9 X4).

The reference has no JSON surface; this covers the semi-structured column
shape every event pipeline has. `get_json_object` / `from_json` are JVM-side;
at scale prefer `from_json` with an explicit schema once per query (single
parse) over repeated `get_json_object` calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from swiftbulkuploader_spark.catalog import load_table
from swiftbulkuploader_spark.plans.layout import spread

PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


def x4_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar JSON path extraction with cast (`get_json_object` path)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def x4_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse once with an explicit schema (`from_json`), then aggregate the
    extracted field per event_type — the scale-correct single-parse shape."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.withColumn("p", F.from_json("props", PROPS_SCHEMA))
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("p.k")).alias("sum_k"),
            F.round(F.avg(F.col("p.k")), 6).alias("avg_k"),
            F.min(F.col("p.k")).alias("min_k"),
            F.max(F.col("p.k")).alias("max_k"),
        )
    )


def x4_variant_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-schema semi-structured access via the VARIANT type (Spark 4):
    `parse_json` once into a variant, then typed path extraction with
    `variant_get` / null-safe `try_variant_get`.

    Variant is the scale answer when the JSON schema is NOT known up front
    (from_json needs one): a binary-encoded document, parsed once at ingest,
    with per-path typed access and no re-parse per extraction."""
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return events.select(
        "event_id",
        F.variant_get(v, "$.k", "long").alias("k"),
        F.try_variant_get(v, "$.missing", "long").alias("missing_is_null"),
        F.is_variant_null(F.variant_get(v, "$.k", "variant")).alias("k_is_json_null"),
        F.try_variant_get(v, "$.k", "string").alias("k_as_string"),
    )


def x4_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: build a map from parsed JSON, then
    transform_values / map_filter / transform_keys — plus str_to_map on a
    synthesized k=v string (the log-line shape). All codegen'd."""
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,long>")
    kv = F.concat(F.lit("type="), F.col("event_type"), F.lit(",id="),
                  F.col("event_id").cast("string"))
    parsed = F.str_to_map(kv, F.lit(","), F.lit("="))
    # maps are serialized with to_json for the oracle compare (DuckDB's
    # client has no canonical MAP text form); the HOFs themselves run on
    # real map values
    return events.select(
        "event_id",
        # doubled values, then keep only entries >= 100
        F.to_json(
            F.map_filter(
                F.transform_values(m, lambda k, v: v * 2), lambda k, v: v >= 100
            )
        ).alias("doubled_big"),
        F.to_json(F.transform_keys(m, lambda k, v: F.upper(k))).alias("upper_keys"),
        F.element_at(parsed, "type").alias("type_from_kv"),
        F.element_at(parsed, "id").cast("long").alias("id_from_kv"),
    )


QUERIES = {
    "x4_json_extract": x4_json_extract,
    "x4_json_agg": x4_json_agg,
    "x4_variant_ops": x4_variant_ops,
    "x4_map_hof": x4_map_hof,
}

ORACLES = {
    "x4_json_extract": """
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
    "x4_json_agg": """
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
               min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY event_type
    """,
    "x4_variant_ops": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               CAST(NULL AS BIGINT) AS missing_is_null,
               coalesce(json_type(props, '$.k') = 'NULL', false) AS k_is_json_null,
               json_extract_string(props, '$.k') AS k_as_string
        FROM events
    """,
    "x4_map_hof": """
        SELECT event_id,
               CASE WHEN 2 * CAST(props->>'k' AS BIGINT) >= 100
                    THEN CAST(json_object('k', 2 * CAST(props->>'k' AS BIGINT)) AS VARCHAR)
                    ELSE '{}' END AS doubled_big,
               CAST(json_object('K', CAST(props->>'k' AS BIGINT)) AS VARCHAR) AS upper_keys,
               event_type AS type_from_kv,
               event_id AS id_from_kv
        FROM events
    """,
}


def x4_json_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON ARRAY parse + positional explode: each event's scalar k is
    widened into a 3-element JSON array (built with IDENTICAL string
    concatenation on both engines), parsed ONCE with an explicit
    array<bigint> schema, positionally exploded, and profiled per
    position — the repeated-measure / sensor-array shape (one JSON array
    per record, stats per slot) that a single-parse `from_json` +
    `posexplode` handles without one get_json_object call per index.

    All outputs are exact integers. At scale: one parse per row, explode
    fan-out is the fixed array length, map-side combine to |positions|
    groups."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    # Spark's `%` keeps the dividend's sign exactly like DuckDB's `%`
    # (pmod would be non-negative and silently diverge the array
    # contents if a feed ever carried a negative k).
    arr = F.concat(
        F.lit("["), k.cast("string"),
        F.lit(","), (k % F.lit(7)).cast("string"),
        F.lit(","), (k % F.lit(13)).cast("string"),
        F.lit("]"),
    )
    parsed = events.select(
        F.posexplode(
            F.from_json(arr, "array<bigint>")
        ).alias("pos", "v")
    )
    return parsed.groupBy("pos").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("sum_v"),
        F.min("v").cast("long").alias("min_v"),
        F.max("v").cast("long").alias("max_v"),
        F.countDistinct("v").cast("long").alias("n_distinct"),
    )


def x4_json_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-inference profile of a SEMI-STRUCTURED JSON column: per key,
    how often it is present and the value range — the first artifact a
    data engineer derives from an unknown event feed before writing
    `from_json` schemas. The substrate is a VARIED JSON document (built
    with identical concatenation on both engines: k always, v only on
    purchases, u only when k % 3 = 0) so presence rates genuinely differ
    per key.

    Generic machinery, not per-key expressions: Spark parses once as
    map<string,string> and explodes entries (any key set, no literal
    paths); DuckDB replays with json_keys + computed-path
    json_extract_string. Value min/max compare as strings on both
    engines (lexicographic, engine-identical); presence_rate is an
    integer ratio against the 1-row broadcast total.

    spread() on the parse branch (r14-opt, the plans/layout doctrine):
    the get_json_object + from_json double parse per row ran at the
    parquet split parallelism — the 10x core-ratio probe measured it
    serialized (10.0 s at 32 cores == 10.1 at 8, CORE_RATIO_r14.json);
    only the four parsed columns are shuffled (guide §2.3 project-
    early), and the 1-row count stays on the un-spread scan."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    vi = F.round(F.col("value") * F.lit(100.0), 0).cast("long")
    j = F.concat(
        F.lit('{"k":'), k.cast("string"),
        F.when(F.col("event_type") == "purchase",
               F.concat(F.lit(',"v":'), vi.cast("string"))).otherwise(F.lit("")),
        F.when(F.pmod(k, F.lit(3)) == 0,
               F.concat(F.lit(',"u":'), F.col("user_id").cast("string"))
               ).otherwise(F.lit("")),
        F.lit("}"),
    )
    kv = spread(
        events.select("props", "value", "event_type", "user_id")
    ).select(
        F.explode(F.from_json(j, "map<string,string>")).alias("key", "val")
    )
    total = events.select(F.count(F.lit(1)).alias("n_rows"))  # 1-row bcast
    per_key = kv.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.countDistinct("val").cast("long").alias("n_distinct_vals"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )
    return per_key.crossJoin(F.broadcast(total)).select(
        "key",
        "n_present",
        (
            F.col("n_present").cast("double")
            / F.col("n_rows").cast("double")
        ).alias("presence_rate"),
        "n_distinct_vals",
        "min_val",
        "max_val",
    )


QUERIES["x4_json_array_stats"] = x4_json_array_stats
QUERIES["x4_json_schema_profile"] = x4_json_schema_profile

ORACLES["x4_json_array_stats"] = """
    WITH base AS (
        SELECT '[' || CAST(CAST(json_extract(props, '$.k') AS BIGINT)
                           AS VARCHAR)
               || ',' || CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 7
                              AS VARCHAR)
               || ',' || CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 13
                              AS VARCHAR)
               || ']' AS arr
        FROM events
    ), ex AS (
        SELECT CAST(i AS INT) AS pos,
               CAST(json_extract(arr, '$[' || i || ']') AS BIGINT) AS v
        FROM base,
             unnest(range(CAST(json_array_length(arr) AS BIGINT))) AS t(i)
    )
    SELECT pos,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(v) AS BIGINT) AS sum_v,
           CAST(min(v) AS BIGINT) AS min_v,
           CAST(max(v) AS BIGINT) AS max_v,
           CAST(count(DISTINCT v) AS BIGINT) AS n_distinct
    FROM ex GROUP BY pos
"""

ORACLES["x4_json_schema_profile"] = """
    WITH j AS (
        SELECT '{"k":' || CAST(CAST(json_extract(props, '$.k') AS BIGINT)
                               AS VARCHAR)
               || CASE WHEN event_type = 'purchase'
                       THEN ',"v":' || CAST(CAST(round(value * CAST(100 AS DOUBLE), 0)
                                                 AS BIGINT) AS VARCHAR)
                       ELSE '' END
               || CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) % 3 = 0
                       THEN ',"u":' || CAST(user_id AS VARCHAR)
                       ELSE '' END
               || '}' AS doc
        FROM events
    ), kv AS (
        SELECT k AS key, json_extract_string(doc, '$.' || k) AS val
        FROM j, unnest(json_keys(doc)) AS t(k)
    ), tot AS (
        SELECT count(*) AS n_rows FROM j
    ), per_key AS (
        SELECT key,
               CAST(count(*) AS BIGINT) AS n_present,
               CAST(count(DISTINCT val) AS BIGINT) AS n_distinct_vals,
               min(val) AS min_val,
               max(val) AS max_val
        FROM kv GROUP BY key
    )
    SELECT key, n_present,
           CAST(n_present AS DOUBLE) / CAST(t.n_rows AS DOUBLE)
               AS presence_rate,
           n_distinct_vals, min_val, max_val
    FROM per_key CROSS JOIN tot t
"""


def x4_json_nested_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY-OF-OBJECTS parse — the nested shape the x4 family lacked:
    each event carries a JSON array of tagged measurements (built with
    IDENTICAL string concatenation on both engines: the event's type
    with its integer cents value, plus a 'k' entry with the k-derived
    reading), parsed ONCE with an explicit array<struct<t,v>> schema and
    inline-exploded — the from_json + inline idiom that replaces one
    get_json_object call per field per index. Per tag: row count, value
    sum/min/max and distinct readings, all exact integers.

    At scale: one parse per row, fan-out = fixed array length, map-side
    combine to the bounded tag alphabet. DuckDB replays with computed
    json_extract paths over range(json_array_length) (CAST to BIGINT —
    the UBIGINT-overload gap, CLAUDE.md round-8).

    spread() (r14-opt): get_json_object + from_json per row at scan
    parallelism — the x4_json_schema_profile probe-measured
    serialization class; only the three needed columns shuffle."""
    events = spread(load_table(spark, sf_dir, "events")
                    .select("props", "value", "event_type"))
    k = F.get_json_object("props", "$.k").cast("long")
    vi = F.round(F.col("value") * F.lit(100.0), 0).cast("long")
    arr = F.concat(
        F.lit('[{"t":"'), F.col("event_type"), F.lit('","v":'),
        vi.cast("string"),
        F.lit('},{"t":"k","v":'), (k % F.lit(100)).cast("string"),
        F.lit("}]"),
    )
    parsed = events.select(
        F.inline(F.from_json(arr, "array<struct<t: string, v: bigint>>"))
    )
    return parsed.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("sum_v"),
        F.min("v").cast("long").alias("min_v"),
        F.max("v").cast("long").alias("max_v"),
        F.countDistinct("v").cast("long").alias("n_distinct"),
    )


QUERIES["x4_json_nested_explode"] = x4_json_nested_explode

ORACLES["x4_json_nested_explode"] = """
    WITH base AS (
        SELECT '[{"t":"' || event_type || '","v":'
               || CAST(CAST(round(value * CAST(100 AS DOUBLE), 0) AS BIGINT)
                       AS VARCHAR)
               || '},{"t":"k","v":'
               || CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 100
                       AS VARCHAR)
               || '}]' AS arr
        FROM events
    ), ex AS (
        SELECT json_extract_string(arr, '$[' || i || '].t') AS t,
               CAST(json_extract(arr, '$[' || i || '].v') AS BIGINT) AS v
        FROM base,
             unnest(range(CAST(json_array_length(arr) AS BIGINT))) AS u(i)
    )
    SELECT t,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(v) AS BIGINT) AS sum_v,
           CAST(min(v) AS BIGINT) AS min_v,
           CAST(max(v) AS BIGINT) AS max_v,
           CAST(count(DISTINCT v) AS BIGINT) AS n_distinct
    FROM ex GROUP BY t
"""


def x4_json_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-level JSON DIFF between two metadata snapshots — the CDC /
    schema-drift primitive for semi-structured columns: per doc, which
    keys were added, removed, or changed between revision v1 and v2.
    Snapshots are built deterministically from the row (the
    x4_json_nested_explode generator discipline; every value is a quoted
    STRING so no cross-engine number formatting is in play): v2 bumps
    `rev` always, rewrites `lang` on d%3=0, bumps `n` on d%5=0, and on
    d%4=0 swaps the `tag` key for a new `fmt` key — so added/removed
    fire on the %4 class, and n_changed varies 1..3 (all output columns
    live at every SF, no value in the corpus collides with the injected
    'xx').

    Spark: one from_json to map<string,string> per side, then pure array
    HOFs (array_except / array_intersect / filter on value inequality /
    array_sort) — row-local, zero shuffles, the scan-bound mapper shape.
    DuckDB replays with json_keys + list_filter lambdas + list_sort."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    v1 = F.concat(
        F.lit('{"lang":"'), F.col("lang"),
        F.lit('","n":"'), F.col("n_chars").cast("string"),
        F.lit('","rev":"'), (d % 7).cast("string"), F.lit('"'),
        F.when(d % 4 == 0, F.lit(',"tag":"old"')).otherwise(F.lit("")),
        F.lit("}"),
    )
    v2 = F.concat(
        F.lit('{"lang":"'),
        F.when(d % 3 == 0, F.lit("xx")).otherwise(F.col("lang")),
        F.lit('","n":"'),
        F.when(d % 5 == 0, F.col("n_chars") + 1).otherwise(F.col("n_chars"))
        .cast("string"),
        F.lit('","rev":"'), (d % 7 + 1).cast("string"), F.lit('"'),
        F.when(d % 4 == 0, F.lit(',"fmt":"md"')).otherwise(F.lit("")),
        F.lit("}"),
    )
    m1 = F.from_json(v1, "map<string,string>")
    m2 = F.from_json(v2, "map<string,string>")
    base = docs.select("doc_id", m1.alias("m1"), m2.alias("m2"))
    k1, k2 = F.map_keys(F.col("m1")), F.map_keys(F.col("m2"))
    added = F.array_sort(F.array_except(k2, k1))
    removed = F.array_sort(F.array_except(k1, k2))
    changed = F.array_sort(
        F.filter(
            F.array_intersect(k1, k2),
            lambda k: F.element_at(F.col("m1"), k)
            != F.element_at(F.col("m2"), k),
        )
    )
    return base.select(
        "doc_id",
        F.size(added).cast("int").alias("n_added"),
        F.size(removed).cast("int").alias("n_removed"),
        F.size(changed).cast("int").alias("n_changed"),
        F.array_join(added, ",").alias("added_keys"),
        F.array_join(removed, ",").alias("removed_keys"),
        F.array_join(changed, ",").alias("changed_keys"),
    )


QUERIES["x4_json_diff"] = x4_json_diff

ORACLES["x4_json_diff"] = """
    WITH base AS (
        SELECT doc_id,
               '{"lang":"' || lang || '","n":"' || CAST(n_chars AS VARCHAR)
               || '","rev":"' || CAST(doc_id % 7 AS VARCHAR) || '"'
               || (CASE WHEN doc_id % 4 = 0 THEN ',"tag":"old"' ELSE '' END)
               || '}' AS v1,
               '{"lang":"'
               || (CASE WHEN doc_id % 3 = 0 THEN 'xx' ELSE lang END)
               || '","n":"'
               || CAST(CASE WHEN doc_id % 5 = 0 THEN n_chars + 1
                            ELSE n_chars END AS VARCHAR)
               || '","rev":"' || CAST(doc_id % 7 + 1 AS VARCHAR) || '"'
               || (CASE WHEN doc_id % 4 = 0 THEN ',"fmt":"md"' ELSE '' END)
               || '}' AS v2
        FROM documents
    ), diffs AS (
        SELECT doc_id,
               list_sort(list_filter(json_keys(v2),
                   k -> NOT list_contains(json_keys(v1), k))) AS added,
               list_sort(list_filter(json_keys(v1),
                   k -> NOT list_contains(json_keys(v2), k))) AS removed,
               list_sort(list_filter(json_keys(v1),
                   k -> list_contains(json_keys(v2), k)
                        AND json_extract_string(v1, '$.' || k)
                            <> json_extract_string(v2, '$.' || k))) AS changed
        FROM base
    )
    SELECT doc_id,
           CAST(len(added) AS INT) AS n_added,
           CAST(len(removed) AS INT) AS n_removed,
           CAST(len(changed) AS INT) AS n_changed,
           coalesce(array_to_string(added, ','), '') AS added_keys,
           coalesce(array_to_string(removed, ','), '') AS removed_keys,
           coalesce(array_to_string(changed, ','), '') AS changed_keys
    FROM diffs
"""
