"""Skew-handling join: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the explicit
fallback when one *key* (not partition) is pathologically hot — e.g. a
null-ish default user owning 1% of a 100 TB fact table: the hot side gets
a random salt in [0, n), the small side is replicated n× with every salt,
and the join key becomes (key, salt), spreading the hot key over n tasks.

The salt must be *deterministic per row* (hash-based, not rand()) so
retries and speculative tasks agree — the same reproducibility rule as
q19's deterministic sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    salt_by: str | None = None,
) -> DataFrame:
    """Join ``big`` (skewed on ``key``) with ``small`` by salting.

    ``salt_by`` names a column whose hash spreads the hot key's rows
    (defaults to all of big's columns via xxhash64) — deterministic, so
    task retries produce identical partitioning.

    Only inner/left joins are salting-correct: under right/full outer,
    each of the n_salts small-side replicas that finds no match survives
    as its own null-extended row.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    salt_src = F.col(salt_by) if salt_by else F.struct(*[F.col(c) for c in big.columns])
    salted_big = big.withColumn("__salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts)))
    exploded_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return salted_big.join(exploded_small, [key, "__salt"], how).drop("__salt")
