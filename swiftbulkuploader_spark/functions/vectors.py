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


def dot_product_unrolled(a: str, b: str, dim: int) -> Column:
    """`dot_product` for a STATICALLY-KNOWN dimension, unrolled into a
    left-associated chain of element multiplies. Bit-identical to the HOF
    fold ((0+x0)+x1+... == (x0+x1)+... exactly in IEEE, and SQL `+` parses
    left-associative), but the unrolled expression participates in
    whole-stage codegen while higher-order lambdas run interpreted —
    measured ~10x cheaper per pair in the semantic-dedup hot path.

    Takes SQL expression STRINGS (e.g. "vec", "l.vec") and builds ONE
    F.expr — composing ~dim Column objects via getItem would cost a py4j
    round-trip per node (~3 s of driver time at dim=64 across the uses in
    one query)."""
    return F.expr(" + ".join(f"({a}[{i}] * {b}[{i}])" for i in range(dim)))


def l2_norm_unrolled(a: str, dim: int) -> Column:
    """`l2_norm` unrolled for a static dimension (same IEEE-equality and
    single-expr-string arguments as dot_product_unrolled)."""
    return F.sqrt(F.expr(" + ".join(f"({a}[{i}] * {a}[{i}])" for i in range(dim))))
