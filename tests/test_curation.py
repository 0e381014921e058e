"""Invariant tests for the curation operators (q118-q123): CDC chunking
reconstruction + shift-robustness, Bloom filter no-false-negatives,
novelty conservation, overlap-matrix bounds, and mixing-budget algebra.
The cross-engine value checks live in test_oracle.py; these lock the
semantic properties an oracle hash alone would not explain."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from database_migrator_spark.operators.curation import (
    cdc_chunks,
    q118_ngram_novelty,
    q119_cross_source_overlap,
    q121_bloom_ingest_filter,
    q122_mixture_epochs,
)
from database_migrator_spark.sources import table

from .conftest import SF_SMOKE


def test_cdc_chunks_reassemble_to_original_text(spark):
    """Chunks are a partition of the document: concatenating them in order
    must reproduce the text exactly (no character lost or duplicated)."""
    docs = table(spark, SF_SMOKE, "documents")
    rebuilt = (
        cdc_chunks(docs)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk"))
                    ),
                    lambda s: s["chunk"],
                ),
            ).alias("rebuilt")
        )
        .join(docs.select("doc_id", "text"), "doc_id")
    )
    n_docs = docs.count()
    assert rebuilt.where(F.col("rebuilt") == F.col("text")).count() == n_docs


def test_cdc_boundaries_are_content_defined(spark):
    """The FastCDC property fixed-size blocking lacks: a shared span keeps
    its interior chunks when its byte OFFSET changes. Two synthetic docs
    share a long body behind different-length prefixes; their interior
    chunks must intersect heavily."""
    body = " ".join(f"w{i}q{i * 7}z{i * 13}" for i in range(120))
    df = spark.createDataFrame(
        [(1, "A " + body, "s"), (2, "a much longer unrelated prefix " + body, "s")],
        ["doc_id", "text", "source"],
    )
    ch = cdc_chunks(df).collect()
    chunks1 = {r.chunk for r in ch if r.doc_id == 1}
    chunks2 = {r.chunk for r in ch if r.doc_id == 2}
    shared = chunks1 & chunks2
    # everything but the first chunk (which contains the differing prefix)
    # and the boundary-straddling chunk should be shared
    assert len(shared) >= max(len(chunks1), len(chunks2)) - 2
    assert len(shared) >= 3  # the span is long enough for several chunks


def test_bloom_has_no_false_negatives_and_bounded_fp(spark):
    rows = q121_bloom_ingest_filter(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    false_neg = [r for r in rows if r.is_dup == 1 and r.flagged == 0]
    assert false_neg == []  # the Bloom guarantee
    true_dups = [r for r in rows if r.is_dup == 1]
    assert true_dups  # the recrawl slice must exercise the dup path
    clean = [r for r in rows if r.is_dup == 0]
    fp_rate = sum(r.flagged for r in clean) / max(len(clean), 1)
    # m=65536, k=4, n a few hundred keys => expected FP rate ~1e-7
    assert fp_rate < 0.05


def test_novelty_conserves_distinct_grams(spark):
    """Every distinct gram is novel in exactly one document (its first),
    so Σ n_novel over docs == corpus-wide distinct-gram count, and each
    document's novelty_frac is n_novel/n_distinct_grams in [0, 1]."""
    from database_migrator_spark.operators.dedup import tokens_of, word_shingles

    out = q118_ngram_novelty(spark, SF_SMOKE)
    agg = out.agg(F.sum("n_novel").alias("novel")).first()
    d = table(spark, SF_SMOKE, "documents")
    toks = tokens_of("text")
    total_distinct = (
        d.where(F.size(toks) >= 8)
        .select(F.explode(word_shingles(toks, 8)).alias("g"))
        .distinct()
        .count()
    )
    assert agg["novel"] == total_distinct
    bad = out.where(
        (F.col("novelty_frac") < 0)
        | (F.col("novelty_frac") > 1)
        | (F.col("n_novel") > F.col("n_distinct_grams"))
    )
    assert bad.count() == 0


def test_overlap_matrix_bounds_and_orientation(spark):
    rows = q119_cross_source_overlap(spark, SF_SMOKE).collect()
    for r in rows:
        assert r.source_a < r.source_b  # upper triangle only
        assert r.n_shared >= 1
        assert 0.0 < r.jaccard <= 1.0


def test_mixture_epochs_algebra(spark):
    rows = q122_mixture_epochs(spark, SF_SMOKE).collect()
    assert rows
    assert sum(r.weight for r in rows) == pytest.approx(1.0, abs=1e-9)
    # budget is 2x corpus: token-weighted mean of epochs must be 2
    total_tokens = sum(r.n_tokens for r in rows)
    sampled = sum(r.epochs * r.n_tokens for r in rows)
    assert sampled / total_tokens == pytest.approx(2.0, rel=1e-9)
    from database_migrator_spark.operators.curation import _EPOCH_CAP

    for r in rows:
        assert r.capped_epochs <= _EPOCH_CAP + 1e-12
        assert (r.over_cap == 1) == (r.epochs > _EPOCH_CAP)


def test_curriculum_stages_are_balanced_and_monotone(spark):
    """q125's distributed bucket math must reproduce ntile semantics:
    5 stages whose sizes differ by at most 1 (larger first), and stage
    boundaries monotone in token length."""
    from database_migrator_spark.operators.curation import q125_curriculum_order

    rows = q125_curriculum_order(spark, SF_SMOKE).collect()
    by_stage: dict[int, list] = {}
    for r in rows:
        by_stage.setdefault(r.stage, []).append(r.n_tokens)
    assert sorted(by_stage) == [1, 2, 3, 4, 5]
    sizes = [len(by_stage[s]) for s in sorted(by_stage)]
    assert max(sizes) - min(sizes) <= 1
    assert sizes == sorted(sizes, reverse=True)  # remainder rows go early
    for s in range(1, 5):
        assert max(by_stage[s]) <= min(by_stage[s + 1])


def test_cdc_reassembly_on_adversarial_strings(spark):
    """CDC partition invariant on hand-picked adversarial texts: empty
    (zero chunks — the document vanishes from the chunk stream), shorter
    than the hash window, exactly the window, repeated characters (every
    window identical ⇒ either no boundary or a boundary at every
    position), multi-byte unicode, and whitespace runs. Concatenating
    chunks in chunk_idx order must reproduce the text byte-for-byte."""
    texts = [
        "",
        "a",
        "1234567",
        "12345678",
        "x" * 400,
        "ab" * 200,
        "héllo wörld ünïcode " * 20,
        "  leading and   trailing   spaces  " * 10,
        "\t tabs\tand\nnewlines \n" * 15,
    ]
    df = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)], ["doc_id", "text", "source"]
    )
    from database_migrator_spark.operators.curation import cdc_chunks

    got = {}
    for r in cdc_chunks(df).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk))
    for i, t in enumerate(texts):
        rebuilt = "".join(c for _, c in sorted(got.get(i, [])))
        assert rebuilt == t, f"doc {i}: {rebuilt!r} != {t!r}"
    assert 0 not in got  # empty text yields no chunks


def test_mixture_materialize_copy_bounds(spark):
    """n_copies ∈ [floor(rate), 4]: the fractional coin adds at most one
    copy and the 4-epoch cap bounds everything."""
    from database_migrator_spark.operators.curation import q128_mixture_materialize

    rows = q128_mixture_materialize(spark, SF_SMOKE).collect()
    assert rows
    assert all(0 <= r.n_copies <= 4 for r in rows)
    # the coin must actually split some source (not all-integer rates)
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, set()).add(r.n_copies)
    assert any(len(v) > 1 for v in by_src.values())


def test_countmin_one_sided_error_all_keys(spark):
    """CMS contract: est >= true for EVERY key (not just the top-20 the
    query returns) — min over d counters can only over-count."""
    from database_migrator_spark.operators.curation import _cms_positions

    e = table(spark, SF_SMOKE, "events")
    keyed = e.groupBy("user_id").agg(F.count("*").alias("c"))
    hk = keyed.select(
        "user_id", "c",
        F.md5(F.encode(F.col("user_id").cast("string"), "UTF-8")).alias("h"),
    )
    pos = hk.select(
        "user_id", "c", F.explode(_cms_positions(F.col("h"))).alias("jp")
    ).select("user_id", "c", F.col("jp.j").alias("j"), F.col("jp.p").alias("p"))
    counters = pos.groupBy("j", "p").agg(F.sum("c").alias("cnt"))
    est = (
        pos.join(counters, ["j", "p"])
        .groupBy("user_id", "c")
        .agg(F.min("cnt").alias("est"))
    )
    bad = est.where(F.col("est") < F.col("c")).count()
    assert bad == 0


def test_countmin_sketch_is_mergeable(spark):
    """CMS linearity: the sketch of two disjoint event halves, merged by
    cell-wise addition, equals the sketch of the whole — the property
    that lets 100 TB build per-partition/per-day sketches and fold them."""
    from database_migrator_spark.operators.curation import _cms_positions

    e = table(spark, SF_SMOKE, "events")

    def sketch(df):
        keyed = df.groupBy("user_id").agg(F.count("*").alias("c"))
        hk = keyed.select(
            "c", F.md5(F.encode(F.col("user_id").cast("string"), "UTF-8")).alias("h")
        )
        pos = hk.select("c", F.explode(_cms_positions(F.col("h"))).alias("jp"))
        return (
            pos.groupBy(F.col("jp.j").alias("j"), F.col("jp.p").alias("p"))
            .agg(F.sum("c").alias("cnt"))
        )

    full = {(r.j, r.p): r.cnt for r in sketch(e).collect()}
    h1 = sketch(e.where(F.col("event_id") % 2 == 0)).collect()
    h2 = sketch(e.where(F.col("event_id") % 2 == 1)).collect()
    merged: dict = {}
    for r in list(h1) + list(h2):
        merged[(r.j, r.p)] = merged.get((r.j, r.p), 0) + r.cnt
    assert merged == full


def test_shuffle_shard_is_dense_permutation_and_interleaves(spark):
    """q249: the manifest must be a PERMUTATION — every doc exactly once,
    positions dense 0..n_k−1 within each shard — the within-shard order
    must equal the md5-slice order (two-level prefix sum == the direct
    single-window answer), and the shuffle must actually decorrelate:
    every shard mixes several sources and, unlike ingest order, adjacent
    positions are not source-runs."""
    import hashlib
    from collections import defaultdict

    from database_migrator_spark.plans.registry import all_queries

    rows = (
        all_queries()["q249_training_shuffle_shard"]
        .build(spark, SF_SMOKE)
        .collect()
    )
    docs = {r.doc_id: r.source for r in table(spark, SF_SMOKE, "documents").collect()}
    assert sorted(r.doc_id for r in rows) == sorted(docs)
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r)
    assert set(by_shard) <= set(range(8))
    for shard, rs in by_shard.items():
        assert sorted(r.pos for r in rs) == list(range(len(rs)))
        # two-level prefix sum == direct order by (md5 slice, doc_id)
        def key(r):
            h = hashlib.md5(str(r.doc_id).encode()).hexdigest()
            assert int(h[:4], 16) % 8 == shard
            return (h[4:16], r.doc_id)

        assert [r.doc_id for r in sorted(rs, key=lambda r: r.pos)] == [
            r.doc_id for r in sorted(rs, key=key)
        ]
        assert len({r.source for r in rs}) >= 3  # shards interleave sources
