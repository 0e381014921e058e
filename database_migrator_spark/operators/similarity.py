"""Similarity search over embedding columns (SURVEY.md §2B E16).

Two tiers:
- brute-force top-k cosine — exact baseline; the query vector is a
  broadcast single row, so the scan side streams with zero shuffle and
  top-k is a TakeOrderedAndProject (per-partition heap), never a full sort.
- random-hyperplane LSH (SimHash-for-vectors) — the 100 TB path: bucket
  vectors by sign-pattern against fixed hyperplanes; a query probes its own
  bucket plus hamming-1 neighbors, turning O(N) scans into O(N/2^bits)
  bucket reads. Recall is verified against brute force in
  tests/test_similarity.py.

Hyperplanes are generated from a fixed seed and inlined as literal arrays
— data-independent, reproducible, no fitting step.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from database_migrator_spark.functions.vector import cosine_similarity, dot
from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import table

_DIM = 64
# SRP bucket-count tradeoff: 2^n_planes buckets should be ~N/100 so each
# bucket holds enough candidates; 4 planes suits the 500-row test corpus,
# 16+ planes (with more probes) a 100 TB one. On unclustered random
# vectors recall is modest by nature; real embedding corpora cluster,
# which is exactly what SRP exploits.
_N_PLANES = 4
_SEED = 42


def _hyperplanes(n_planes: int = _N_PLANES, dim: int = _DIM, seed: int = _SEED) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to the row with ``query_vec_id``."""
    q = embeddings.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__query_vec")
    )
    return (
        embeddings.where(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col), F.col("__query_vec")).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: one bit per hyperplane
    (sign of the dot product), packed into a BIGINT."""
    bits = [
        (
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(w) for w in plane]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0
        ).cast("long")
        * (1 << i)
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = _N_PLANES,
) -> DataFrame:
    """Approximate top-k: restrict the exact cosine scan to the query's SRP
    bucket and its hamming-1 neighbor buckets (multi-probe)."""
    planes = _hyperplanes(n_planes)
    bucketed = embeddings.withColumn("__bucket", srp_bucket(F.col(vec_col), planes))
    q = bucketed.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__query_vec"), F.col("__bucket").alias("__qb")
    )
    probes = F.array(
        F.col("__qb"), *[F.col("__qb").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
    )
    return (
        bucketed.where(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .where(F.array_contains(probes, F.col("__bucket")))
        .select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col), F.col("__query_vec")).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


@query(
    "q34_cosine_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1)
    SELECT e.vec_id,
           list_reduce(list_transform(range(1, len(e.embedding) + 1),
                         i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)),
                       (a, b) -> a + b)
           / sqrt(
               list_reduce(list_transform(range(1, len(e.embedding) + 1),
                             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                           (a, b) -> a + b)
               * list_reduce(list_transform(range(1, len(q.qe) + 1),
                             i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)),
                           (a, b) -> a + b)
             ) AS sim
    FROM embeddings e, q
    WHERE e.vec_id <> 1
    ORDER BY sim DESC, e.vec_id
    LIMIT 10
    """,
    tags=("similarity", "ann", "E16"),
)
def q34_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 around vec_id=1. The oracle mirrors the
    exact fold order (left-to-right double adds, dot/sqrt(na*nb)) so sims
    are bit-identical across engines."""
    e = table(spark, sf_dir, "embeddings")
    return cosine_topk(e, query_vec_id=1, k=10)


@query(
    "q35_ann_lsh_topk",
    oracle=None,  # approximate by construction; recall vs brute force is
    # asserted in tests/test_similarity.py
    tags=("similarity", "ann", "lsh", "E16"),
)
def q35_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return ann_lsh_topk(e, query_vec_id=1, k=10)
