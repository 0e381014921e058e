"""ANN quality: the SRP-LSH approximate top-k must (a) only return
true-similarity values (it computes exact cosine on candidates) and
(b) achieve reasonable recall vs the brute-force baseline."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from database_migrator_spark.functions.vector import cosine_similarity
from database_migrator_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    embedding_near_duplicates,
)
from database_migrator_spark.sources import table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def embeddings(spark):
    return table(spark, SF_SMOKE, "embeddings").cache()


def test_brute_force_topk_is_sorted_and_exact(spark, embeddings):
    rows = cosine_topk(embeddings, query_vec_id=1, k=10).collect()
    assert len(rows) == 10
    sims = [r.sim for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)


def test_ann_lsh_recall(spark, embeddings):
    exact = [r.vec_id for r in cosine_topk(embeddings, query_vec_id=1, k=10).collect()]
    approx_rows = ann_lsh_topk(embeddings, query_vec_id=1, k=10).collect()
    approx = [r.vec_id for r in approx_rows]
    # sims on returned candidates are exact → any returned id must rank
    # consistently; recall@10 against brute force should be non-trivial
    recall = len(set(exact) & set(approx)) / 10
    # deterministic under the fixed seed/data; modest by nature on
    # unclustered random vectors (see similarity.py note)
    assert recall >= 0.3, f"recall@10 = {recall}"
    sims = [r.sim for r in approx_rows]
    assert sims == sorted(sims, reverse=True)


def test_ivf_topk_recall(spark, embeddings):
    from database_migrator_spark.operators.similarity import ivf_topk

    exact = [r.vec_id for r in cosine_topk(embeddings, query_vec_id=1, k=10).collect()]
    approx_rows = ivf_topk(embeddings, query_vec_id=1, k=10, n_clusters=16, n_probe=4).collect()
    approx = [r.vec_id for r in approx_rows]
    recall = len(set(exact) & set(approx)) / 10
    # probing 4/16 clusters scans ~25% of vectors; deterministic seed
    assert recall >= 0.3, f"IVF recall@10 = {recall}"
    sims = [r.sim for r in approx_rows]
    assert sims == sorted(sims, reverse=True)


def test_embedding_near_duplicates_subset_of_truth(spark, embeddings):
    threshold = 0.4
    a = embeddings.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"))
    b = embeddings.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"))
    # epsilon guard: the verify stage uses numpy (pairwise summation),
    # truth uses the sequential fold — last-bit differences at the exact
    # threshold boundary are not false positives
    truth = {
        (r.a_id, r.b_id)
        for r in a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("c", cosine_similarity(F.col("a_vec"), F.col("b_vec")))
        .where(F.col("c") >= threshold - 1e-9)
        .collect()
    }
    found = {
        (r.a_id, r.b_id)
        for r in embedding_near_duplicates(embeddings, threshold=threshold).collect()
    }
    # exact-cosine verify ⇒ no false positives; multi-probe SRP must catch
    # a solid majority of the true high-cosine pairs
    assert found <= truth
    assert truth, "corpus has no pairs at this threshold — test is vacuous"
    recall = len(found) / len(truth)
    assert recall >= 0.5, f"recall {recall:.2f} over {len(truth)} true pairs"
