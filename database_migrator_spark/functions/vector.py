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


def l2_dist_sq(a: Column | str, b: Column | str) -> Column:
    """Σ (a_i-b_i)² in double, sequential fold — bit-identical to DuckDB's
    ``list_reduce(list_transform(range(1, len+1), i -> (a[i]-b[i])*(a[i]-b[i])), (x,y) -> x+y)``
    per the module-head determinism note."""
    diffs = F.zip_with(
        _c(a),
        _c(b),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize to ``array<double>``; NULL when the norm is 0.
    Normalized vectors turn cosine similarity into a plain dot product —
    normalize once at ingest, skip the per-pair norm forever after.

    PERF CAVEAT: as a single Column expression the norm fold sits INSIDE
    the transform lambda, and interpreted HOF lambdas cache nothing — the
    fold re-evaluates per element, O(d²) per vector. Fine for one-shot
    projections over small d; on a hot path, project ``sqrt(l2_norm_sq)``
    into its own column first and divide by that scalar in the lambda
    (see ``semantic_dedup_kept`` for the pattern)."""
    norm_sq = l2_norm_sq(a)
    return F.when(
        norm_sq > 0,
        F.transform(_c(a), lambda x: x.cast("double") / F.sqrt(norm_sq)),
    )


def quantize_int8(a: Column | str, scale: float) -> Column:
    """Symmetric int8 quantization: round(x/scale) clamped to [-127, 127],
    as ``array<tinyint>`` — 4× fewer bytes than float32 on disk and in
    every shuffle, the standard storage/transport format for embedding
    corpora at scale. ``scale`` ≈ max|x|/127 for the corpus; dequantize
    with :func:`dequantize_int8` using the same scale."""
    inv = 1.0 / scale
    return F.transform(
        _c(a),
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.round(x.cast("double") * inv).cast("int"))
        ).cast("tinyint"),
    )


def dequantize_int8(q: Column | str, scale: float) -> Column:
    """Inverse of :func:`quantize_int8`: ``array<double>`` ≈ original."""
    return F.transform(_c(q), lambda x: x.cast("double") * scale)
