"""Exact money arithmetic for cross-engine reproducible aggregates.

Why: a double-precision SUM over 10^4..10^6 rows of ~1e4-magnitude values
carries an order-dependent error of roughly sqrt(n)*eps*sum ≈ 1e-5. Spark's
partial/final (tree) aggregation and DuckDB's sequential aggregation sum in
different orders, so the two engines disagree in the 6th decimal — exactly
where the correctness hash rounds. Rounding each row to integer "cents"
(deterministic: both engines round the *same* IEEE double) and summing
BIGINTs is exact and order-independent; dividing the exact integer by 100.0
at the end produces bit-identical doubles on both engines.

The DuckDB-side mirror of ``cents_sum(c)`` is::

    SUM(CAST(ROUND(c * 100) AS BIGINT)) / 100.0

At 100 TB the same trick also removes float-summation nondeterminism
*between runs* (AQE can change partial-agg grouping), which matters for
auditable pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_cents(col: Column | str) -> Column:
    """Row-level exact cents: ROUND(col*100) as BIGINT (map-side, codegen)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100, 0).cast("long")


def cents_sum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM for money-scale doubles; exact in int64 up to
    ~9e16 cents (9e14 currency units) per group — far beyond 100 TB sums."""
    out = F.sum(to_cents(col)) / F.lit(100.0)
    return out.alias(alias) if alias else out


def sql_cents_sum(expr: str) -> str:
    """The DuckDB oracle mirror for cents_sum over SQL expression ``expr``."""
    return f"SUM(CAST(ROUND(({expr}) * 100) AS BIGINT)) / 100.0"


def int_div(num: Column, den: Column | int) -> Column:
    """Exact FLOOR division of BIGINT columns, usable inside higher-order-
    function lambdas where ``F.expr`` text cannot bind the lambda's
    variables.

    ``(num - pmod(num, den)) / den`` is bit-exact for ANY divisor (not
    just powers of two): the numerator is an exact multiple of ``den``
    and IEEE division of an exact multiple is the exact quotient
    whenever the quotient is under 2^53.

    Semantics caveat (measured, not assumed): for NEGATIVE numerators
    this is floor division, while BOTH Spark SQL ``DIV`` and DuckDB
    ``//`` truncate toward zero (``-7 // 2 = -3`` in DuckDB 1.0). The
    three agree on non-negative operands — every current call site
    (q162 prefix length, q172 EWMA) is non-negative by construction;
    signed fixed-point slopes (q183) use ``DIV``/``//`` on both engines
    instead."""
    d = F.lit(den) if isinstance(den, int) else den
    return ((num - F.pmod(num, d)) / d).cast("long")


#: largest integer a DOUBLE represents exactly — BIGINT values past this
#: silently round when cast to double, so fixed-point ratios lose ulps.
EXACT_DOUBLE_BOUND = float(2**53)


def exactness_guard(condition: Column, msg: str) -> Column:
    """A row-level guard that fails the JOB (loudly, with ``msg``) the
    moment ``condition`` is false, instead of letting a fixed-point
    computation silently lose precision past the 2^53 double-exactness
    bound.

    Usage: ``df.where(exactness_guard(cond, "..."))``.  Spark's
    ``assert_true`` returns NULL when the condition holds, so
    ``.isNull()`` makes the filter keep every row while still forcing
    per-row evaluation inside codegen (a plain unused column would be
    pruned away).  Compare operands as DOUBLE so the check itself cannot
    wrap in int64 before it runs."""
    return F.assert_true(condition, F.lit(msg)).isNull()
