"""Recursive-CTE hierarchy traversal (WITH RECURSIVE, Spark 4.x).

The reference's only recursion is the Python directory walk
(prepareupload.py:58-60) — a hierarchy traversal executed one `listdir` at a
time. The set-oriented equivalent is a recursive CTE: each iteration joins
the frontier to the child relation, so a whole *level* advances per step and
the number of iterations is the tree DEPTH, not the node count. That is the
scale story: a 100 TB catalog tree of depth ~12 costs 12 distributed
hash-join rounds (each a normal shuffle join Catalyst plans like any other),
versus millions of sequential driver round-trips.

The demo hierarchy is derived deterministically from `customer`:
node = c_custkey, parent = c_custkey div 10 (a decimal trie — roots are keys
1..9), which gives a real multi-level tree on every scale factor without
inventing fixture data. DuckDB runs the identical WITH RECURSIVE shape, so
the whole traversal is oracle-checked: per-node depth, root, and
materialized path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from swiftbulkuploader_spark.catalog import load_table

# Spark and DuckDB differ only in the integer-division operator spelling
# (`div` vs `//`); the CTE is otherwise the same ANSI shape.
_RECURSIVE_SQL = """
    WITH RECURSIVE walk (custkey, depth, root, path) AS (
        SELECT c_custkey, 0, c_custkey,
               CAST(c_custkey AS {str_t})
        FROM {tbl}
        WHERE c_custkey < 10
        UNION ALL
        SELECT c.c_custkey, w.depth + 1, w.root,
               concat(w.path, '/', CAST(c.c_custkey AS {str_t}))
        FROM {tbl} c
        JOIN walk w ON c.c_custkey {intdiv} 10 = w.custkey
        WHERE c.c_custkey >= 10
    )
    SELECT custkey, CAST(depth AS INT) AS depth, root, path
    FROM walk
"""


def x8_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth, root ancestor, and full materialized path for every node of
    the derived customer trie — one recursive CTE, level-synchronous
    evaluation (anchor = keys < 10, step = equi-join frontier→children)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_h")
    return spark.sql(
        _RECURSIVE_SQL.format(tbl="customer_h", intdiv="div", str_t="STRING")
    )


QUERIES = {"x8_recursive_hierarchy": x8_recursive_hierarchy}

ORACLES = {
    "x8_recursive_hierarchy": _RECURSIVE_SQL.format(
        tbl="customer", intdiv="//", str_t="VARCHAR"
    ),
}
