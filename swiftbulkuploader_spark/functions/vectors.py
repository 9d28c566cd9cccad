"""Vector math over ``array<float>`` columns as pure Column expressions.

Used by the similarity-search operators (SURVEY.md §2.9 X2). These compile to
Catalyst higher-order functions (``aggregate`` / ``zip_with``) so the hot path
stays JVM-side; at 100 TB the dot products run inside codegen, not Python.
A vectorized Pandas-UDF variant lives in operators/similarity.py for the
cases where numpy BLAS beats codegen (wide batches of candidates).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Elementwise product then sum, computed in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity in [-1, 1]; null-safe on zero vectors (returns null
    rather than dividing by zero)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)
