"""Fuzzy (edit-distance) string-similarity join with blocking — the
entity-resolution shape (north-star extension, SURVEY.md §2.9/X1).

The scale recipe, in order:
1. **Collapse to distinct values first.** A fuzzy join belongs on the value
   domain, not the row domain: `groupBy(name).count()` shrinks 10^10 rows to
   the distinct vocabulary (here 64; in a real catalog maybe 10^6) and keeps
   the occurrence counts for the broadcast-back step.
2. **Block before comparing.** Pairs are only generated inside a blocking
   key (here: the trailing noun token) — an equi-join Catalyst plans as a
   hash join, never a cartesian product. The O(n²) levenshtein lives only
   inside blocks.
3. **Broadcast back.** The distinct-domain result is small by construction,
   so re-attaching it to the full table is a broadcast join (not exercised
   here; the query returns the resolved pair domain with row counts).

Semantics are *defined* as "pairs sharing the blocking key with edit
distance <= 4" — the oracle runs the identical definition in DuckDB, so
parity covers blocking and distance both. (Blocking completeness vs an
unblocked join is a recall property of the chosen key, documented, not
asserted: a pair differing in the noun is out-of-scope by definition.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swiftbulkuploader_spark.catalog import load_table

MAX_EDIT_DISTANCE = 4


def x1_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant-product-name pairs: distinct p_name values blocked by their
    noun token, paired when levenshtein <= 4, with each side's row count
    (the weight a canonicalization step would use to pick the survivor)."""
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count("*").alias("n_rows"))
    t = names.withColumn("noun", F.element_at(F.split("p_name", " "), 2))
    a, b = t.alias("a"), t.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(dist <= MAX_EDIT_DISTANCE)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.cast("int").alias("dist"),
            F.col("a.n_rows").alias("n_rows_a"),
            F.col("b.n_rows").alias("n_rows_b"),
        )
    )


QUERIES = {"x1_fuzzy_name_pairs": x1_fuzzy_name_pairs}

ORACLES = {
    "x1_fuzzy_name_pairs": f"""
        WITH names AS (
            SELECT p_name, CAST(count(*) AS BIGINT) AS n_rows
            FROM part GROUP BY p_name
        ), t AS (
            SELECT p_name, n_rows, string_split(p_name, ' ')[2] AS noun
            FROM names
        )
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
               a.n_rows AS n_rows_a, b.n_rows AS n_rows_b
        FROM t a JOIN t b
          ON a.noun = b.noun AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= {MAX_EDIT_DISTANCE}
    """,
}
