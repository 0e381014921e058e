"""End-to-end corpus-preparation pipeline: the guarantees a user relies
on after running prepare_training_corpus — no surviving exact duplicate,
no surviving near-duplicate pair above the threshold (checked by brute
force), no benchmark contamination, every survivor carries a split, and
the stage report is monotone non-increasing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database_migrator_spark.operators.dedup import tokens_of, word_shingles
from database_migrator_spark.operators.pipeline import prepare_training_corpus
from database_migrator_spark.sources import table

from .conftest import SF_SMOKE

# thresholds chosen so every stage actually removes something on sf0.001
_KW = dict(min_tokens=40, max_tokens=10_000, max_dup3=0.9, neardup_threshold=0.6)


@pytest.fixture(scope="module")
def prepared(spark):
    docs = table(spark, SF_SMOKE, "documents")
    bench = docs.where(F.col("doc_id") % 23 == 0)
    train = docs.where(F.col("doc_id") % 23 != 0)
    kept, report = prepare_training_corpus(train, bench_docs=bench, **_KW)
    return docs, bench, kept.cache(), report


def test_report_is_monotone_and_ordered(prepared):
    _, _, kept, report = prepared
    rows = sorted(report.collect(), key=lambda r: r["stage"])
    counts = [r["n_docs"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[-1]["n_docs"] == kept.count()
    assert counts[-1] > 0  # pipeline didn't nuke the corpus


def test_no_exact_duplicates_survive(prepared):
    _, _, kept, _ = prepared
    dups = (
        kept.groupBy(F.md5(F.encode("text", "UTF-8")).alias("d"))
        .count()
        .where(F.col("count") > 1)
    )
    assert dups.isEmpty()


def test_no_near_duplicate_pair_survives_brute_force(prepared):
    """The actual dedup guarantee, verified by exhaustive shingle-Jaccard
    over the kept set (feasible at sf0.001)."""
    _, _, kept, _ = prepared
    sh = kept.select(
        F.col("doc_id").alias("id"),
        F.array_distinct(word_shingles(tokens_of("text"))).alias("s"),
    )
    a = sh.select(F.col("id").alias("a"), F.col("s").alias("sa"))
    b = sh.select(F.col("id").alias("b"), F.col("s").alias("sb"))
    jac = F.size(F.array_intersect("sa", "sb")).cast("double") / F.size(
        F.array_union("sa", "sb")
    ).cast("double")
    offenders = (
        a.join(b, F.col("a") < F.col("b")).withColumn("j", jac).where(F.col("j") >= 0.6)
    )
    assert offenders.isEmpty()


def test_no_benchmark_contamination_survives(prepared):
    _, bench, kept, _ = prepared
    from database_migrator_spark.operators.textops import benchmark_decontamination

    assert benchmark_decontamination(kept, bench, k=8).isEmpty()


def test_every_survivor_has_a_split_and_original_columns(prepared):
    docs, _, kept, _ = prepared
    assert set(docs.columns) | {"split"} == set(kept.columns)
    assert kept.where(~F.col("split").isin("train", "val", "test")).isEmpty()
