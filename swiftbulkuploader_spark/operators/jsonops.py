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
