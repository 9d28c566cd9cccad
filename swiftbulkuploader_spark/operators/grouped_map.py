"""Grouped-map Pandas UDF surface (`applyInPandas`) — the custom-operator
escape hatch for semantics built-ins can't express (SURVEY.md §2.8).

The showcase operator: per-label z-score normalization of embedding norms.
Chosen deliberately because it IS SQL-expressible (mean/std window), so the
Arrow path gets a DuckDB oracle — proving the grouped-map plumbing is
numerically faithful, not just "runs".

Scale shape: groupBy(label).applyInPandas ships each group to one Python
worker as Arrow batches. Fine when groups are bounded (labels, languages,
shards); for unbounded/skewed groups pre-split with a salt column first —
see plans/skew.py.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from swiftbulkuploader_spark.catalog import load_table

NORM_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("label", T.IntegerType()),
    T.StructField("norm", T.DoubleType()),
    T.StructField("z", T.DoubleType()),
])


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # norms arrive pre-rounded (identical on both oracle sides); z rounded
    # to 4dp absorbs pandas-pairwise vs SQL-sequential accumulation drift
    mu = pdf["norm"].mean()
    # population std (ddof=0) — matches SQL stddev_pop on both engines
    sd = pdf["norm"].std(ddof=0)
    z = (pdf["norm"] - mu) / sd if sd > 0 else pdf["norm"] * 0.0
    return pd.DataFrame({
        "vec_id": pdf["vec_id"],
        "label": pdf["label"],
        "norm": pdf["norm"],
        "z": z.round(4),
    })


def x2_norm_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label z-score of embedding L2 norms via applyInPandas; the norm
    itself is computed JVM-side (higher-order aggregate) so only the scalar
    crosses into Python."""
    from swiftbulkuploader_spark.functions.vectors import l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select(
        "vec_id", "label",
        F.round(l2_norm(F.col("embedding").cast("array<double>")), 6).alias("norm"),
    )
    return norms.groupBy("label").applyInPandas(_zscore_group, NORM_SCHEMA)


def _zscore_group_arrow(table):
    """Arrow-native twin of _zscore_group: pyarrow.Table in/out, zero pandas
    conversion — the Spark 4 `applyInArrow` path (less memory, no
    pandas-specific type coercions on the boundary)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    norm = table.column("norm")
    mu = pc.mean(norm)
    # two-pass population variance (mean of squared deviations): the
    # E[x^2]-mean^2 form catastrophically cancels for unit-norm values
    dev = pc.subtract(norm, mu)
    var = pc.mean(pc.multiply(dev, dev))
    sd = pc.sqrt(pc.max_element_wise(var, pa.scalar(0.0)))
    if sd.as_py() and sd.as_py() > 0:
        z = pc.divide(pc.subtract(norm, mu), sd)
    else:
        z = pc.multiply(norm, pa.scalar(0.0))
    z = pc.round(z, ndigits=4)
    return pa.table({
        "vec_id": table.column("vec_id"),
        "label": table.column("label"),
        "norm": norm,
        "z": z,
    })


def x2_norm_zscore_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same per-label z-score, via `applyInArrow` — identical semantics to
    x2_norm_zscore (same DuckDB oracle), different ferry: grouped data
    stays in Arrow end-to-end."""
    from swiftbulkuploader_spark.functions.vectors import l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select(
        "vec_id", "label",
        F.round(l2_norm(F.col("embedding").cast("array<double>")), 6).alias("norm"),
    )
    return norms.groupBy("label").applyInArrow(_zscore_group_arrow, NORM_SCHEMA)


def x2_norm_zscore_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recommended-at-scale plan for the same z-score: pure window
    aggregates (`avg/stddev_pop over (partition by label)`) — no Python
    worker, no Arrow ferry, whole plan stays in codegen. The applyInPandas/
    applyInArrow twins above demonstrate the grouped-map API against the
    SAME oracle; this is the variant to deploy when the semantics fit
    built-ins (they do here)."""
    from pyspark.sql import Window

    from swiftbulkuploader_spark.functions.vectors import l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select(
        "vec_id", "label",
        F.round(l2_norm(F.col("embedding").cast("array<double>")), 6).alias("norm"),
    )
    w = Window.partitionBy("label")
    mu = F.avg("norm").over(w)
    sd = F.stddev_pop("norm").over(w)
    z = F.when(sd > 0, (F.col("norm") - mu) / sd).otherwise(F.lit(0.0))
    return norms.select("vec_id", "label", "norm", F.round(z, 4).alias("z"))


QUERIES = {
    "x2_norm_zscore": x2_norm_zscore,
    "x2_norm_zscore_arrow": x2_norm_zscore_arrow,
    "x2_norm_zscore_native": x2_norm_zscore_native,
}

ORACLES = {
    # same semantics, same oracle text, three implementations (pandas ferry,
    # arrow ferry, native window)
    "x2_norm_zscore_native": """
        WITH norms AS (
            SELECT vec_id, label,
                   round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                      x -> x * x))), 6) AS norm
            FROM embeddings
        )
        SELECT vec_id, label, norm,
               round(CASE WHEN stddev_pop(norm) OVER (PARTITION BY label) > 0
                          THEN (norm - avg(norm) OVER (PARTITION BY label))
                               / stddev_pop(norm) OVER (PARTITION BY label)
                          ELSE 0.0 END, 4) AS z
        FROM norms
    """,
    "x2_norm_zscore_arrow": """
        WITH norms AS (
            SELECT vec_id, label,
                   round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                      x -> x * x))), 6) AS norm
            FROM embeddings
        )
        SELECT vec_id, label, norm,
               round(CASE WHEN stddev_pop(norm) OVER (PARTITION BY label) > 0
                          THEN (norm - avg(norm) OVER (PARTITION BY label))
                               / stddev_pop(norm) OVER (PARTITION BY label)
                          ELSE 0.0 END, 4) AS z
        FROM norms
    """,
    "x2_norm_zscore": """
        WITH norms AS (
            SELECT vec_id, label,
                   round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                      x -> x * x))), 6) AS norm
            FROM embeddings
        )
        SELECT vec_id, label, norm,
               round(CASE WHEN stddev_pop(norm) OVER (PARTITION BY label) > 0
                          THEN (norm - avg(norm) OVER (PARTITION BY label))
                               / stddev_pop(norm) OVER (PARTITION BY label)
                          ELSE 0.0 END, 4) AS z
        FROM norms
    """,
}
