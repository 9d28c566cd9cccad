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


QUERIES = {
    "x4_json_extract": x4_json_extract,
    "x4_json_agg": x4_json_agg,
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
}
