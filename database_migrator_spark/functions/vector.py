"""Vector math over ``array<float>`` embedding columns, as pure column
expressions (JVM-side, whole-stage-codegen; no Python UDFs).

Determinism note: both Spark's ``aggregate`` (fold with 0.0 init) and
DuckDB's ``list_reduce`` (fold from the first element) add elements
left-to-right, and ``0.0 + x == x`` in IEEE 754, so dot products and norms
are bit-identical across engines when both cast elements to double first.
cosine = dot / sqrt(norm_a * norm_b) — keep this exact formula shape in any
oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i*b_i in double, sequential fold."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm_sq(a: Column | str) -> Column:
    """Σ a_i^2 in double."""
    return F.aggregate(
        _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / sqrt(||a||² * ||b||²); NULL when either norm is 0."""
    denom_sq = l2_norm_sq(a) * l2_norm_sq(b)
    return F.when(denom_sq > 0, dot(a, b) / F.sqrt(denom_sq))
