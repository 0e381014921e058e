"""Liveness pins for the r14 semantic-integrity wave.

The r14 constant-column audit (tools/degeneracy_audit.py) found seven
hash-green queries whose core machinery never fired at ANY scale factor
— the q304 failure class, one layer subtler than emptiness.  Each fix
landed with a probe at all three SFs; these tests pin the live signal at
smoke scale so a refactor (or a testdata regeneration) that re-deadens a
query goes red instead of staying hash-green.

Also holds the planted-trend proof for q183's Theil-Sen core: its
full-corpus median slope is LEGITIMATELY 0.0 at every SF (stationary
synthetic series), which would mask a sign or ordering bug — the planted
series pins a known nonzero slope and the outlier-immunity property.
"""

from __future__ import annotations

import pytest

from database_migrator_spark.plans.registry import all_queries

from .conftest import SF_SMOKE

_QS = all_queries()


def _run(spark, name):
    return _QS[name].build(spark, SF_SMOKE).toPandas()


def test_q266_kappa_not_identically_zero(spark):
    """Both labelers fire and kappa spreads (the shipped 1/4 stopword
    threshold left labeler B dead: n11 = n01 = 0, kappa ≡ 0.0)."""
    out = _run(spark, "q266_cohens_kappa_labelers")
    assert (out["n11"] > 0).any() or (out["n01"] > 0).any()
    assert (out["kappa"] != 0.0).sum() >= 10
    assert out["kappa"].nunique() > 5


def test_q191_top_docs_hit_multiple_query_terms(spark):
    """Under the r14 Lucene idf clamp the BM25 top-20 rewards query-term
    mass — every top doc hits all 3 terms on this corpus (the Robertson
    form went negative on ~77%-df terms and ranked ANTI-relevance:
    n_terms_hit was identically 1 in every top-20 at every SF)."""
    out = _run(spark, "q191_bm25_topk")
    assert int(out["n_terms_hit"].max()) > 1
    assert (out["score"] > 0).all()


def test_q197_fusion_actually_fuses(spark):
    """At least one fused doc is ranked by BOTH scorers (under the
    negative Robertson idf the BM25 and QLD top-100s were disjoint, so
    every RRF row carried exactly one nonzero rank and the fusion sum
    never combined anything; post-clamp all 20 fused docs sit in both
    top-100s at sf0.001 and sf0.01 — pinned loosely at >= 1)."""
    out = _run(spark, "q197_rrf_fusion")
    assert ((out["bm25_rank"] > 0) & (out["qld_rank"] > 0)).any()


def test_q245_expansion_terms_contribute(spark):
    """RM3's expansion terms actually hit the reranked docs: the
    original query has 3 terms, so n_terms_hit > 3 proves the >= 1
    expansion term joined the rescore (probed: every top-20 doc hits
    up to 8 of the 11 weighted terms at sf0.001/0.01).  A dead
    expansion (empty rm model / zero weights) collapses this to <= 3
    while staying hash-green on both engines."""
    out = _run(spark, "q245_rm3_expansion_rescore")
    assert int(out["n_terms_hit"].max()) > 3
    assert (out["score"] > 0).all()


def test_q256_mmr_diversification_fires(spark):
    """The MMR penalty both FIRES (some pick has a positive
    max-similarity to the already-picked set — 9 of 10 do at smoke
    scale) and REORDERS (the greedy order is not the pure-relevance
    order: a later pick beats an earlier one on relevance).  With a
    dead redundancy term MMR degenerates to plain BM25 order and both
    assertions fail while the hash stays green."""
    out = _run(spark, "q256_mmr_diversified_topk").sort_values("rank")
    assert (out["max_sim_prior"] > 0).any()
    rel = out["rel_norm"].tolist()
    assert any(
        rel[i] < rel[j] for i in range(len(rel)) for j in range(i + 1, len(rel))
    )


def test_q298_rankings_genuinely_meet(spark):
    """The BM25 and QLD top-50s overlap (the shared all-ubiquitous query
    terms made them provably disjoint — RBO ≡ 0 at every SF)."""
    out = _run(spark, "q298_rank_biased_overlap")
    assert int(out["overlap"].max()) > 0
    assert float(out["rbo_cum"].max()) > 0.0


def test_q288_remainder_machinery_fires(spark):
    """Some sources get a remainder unit and some don't (doc-count
    weights were exactly uniform: every remainder was 0)."""
    out = _run(spark, "q288_largest_remainder_allocation")
    assert out["extra"].nunique() == 2
    assert (out["remainder_units"] > 0).any()
    assert int(out["allocation"].sum()) == 9_973


def test_q122_cap_binds_and_splits(spark):
    """The repetition ceiling genuinely splits the sources (the 4-epoch
    ceiling under a 2x budget never bound: over_cap ≡ 0)."""
    out = _run(spark, "q122_mixture_epochs")
    assert out["over_cap"].nunique() == 2
    assert (out["capped_epochs"] < out["epochs"]).any()


def test_q175_negative_condition_fires(spark):
    """Some funnels are blocked by an intervening error (the 5-minute
    window never contained both a purchase and an earlier error)."""
    out = _run(spark, "q175_uninterrupted_funnel")
    assert int(out["n_blocked"].sum()) > 0
    assert int(out["n_matched"].sum()) > int(out["n_blocked"].sum())


def test_q213_fences_detect_something(spark):
    """The Tukey fences flag real customers (single-order values were
    too light-tailed: zero outliers at every SF, both fences)."""
    out = _run(spark, "q213_order_value_outliers")
    assert int((out["n_low_outliers"] + out["n_high_outliers"]).sum()) > 0


def test_q206_cosines_spread_below_one(spark):
    """The reported cosines are a real similarity spectrum (the unigram
    df band kept exactly one term: every cosine was identically 1.0,
    and the band was empty at sf0.1)."""
    out = _run(spark, "q206_sparse_cosine_pairs")
    assert len(out) == 20
    assert out["cosine"].nunique() >= 15
    assert (out["cosine"] < 1.0).any()


def test_theil_sen_planted_trend_and_robustness(spark):
    """q183's core on a planted series: slope 3/hour plus one absurd
    spike — the median pairwise slope must recover exactly 3.0 (the
    fixed-point 3e9), proving sign, ordering and outlier-immunity the
    always-zero corpus median cannot."""
    from database_migrator_spark.operators.temporal import (
        theil_sen_median_slopes,
    )

    rows = [("a", t, 10 + 3 * t) for t in range(30)]
    rows[17] = ("a", 17, 1_000_000)  # one spike cannot move the median
    series = spark.createDataFrame(rows, "event_type string, t long, c long")
    got = theil_sen_median_slopes(series).collect()
    assert len(got) == 1
    assert got[0]["s9"] == 3_000_000_000
    # and a falling series recovers a negative slope (sign check)
    down = spark.createDataFrame(
        [("d", t, 500 - 7 * t) for t in range(20)],
        "event_type string, t long, c long",
    )
    got2 = theil_sen_median_slopes(down).collect()
    assert got2[0]["s9"] == -7_000_000_000


def test_audit_tool_reports_no_all_null_columns(spark):
    """tools/degeneracy_audit.py at smoke scale: no oracle may emit an
    entirely-NULL column (the q305-draft failure mode).  Constant
    columns are report-only — uniform synthetic data makes many benign
    — but all-NULL is always a bug."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        from degeneracy_audit import audit
    finally:
        sys.path.pop(0)
    report = audit(SF_SMOKE)
    assert report["errors"] == []
    assert report["all_null"] == []


def test_q58_exact_duplicates_exist_in_testdata():
    """Data-liveness pin for q58 exact text dedup: the synthetic corpus
    carries real exact duplicates ONLY at sf0.1 (8 texts x 2 copies —
    probed via DuckDB in the r14 final audit; sf0.001/0.01 are
    duplicate-free, so n_copies is identically 1 there and the audit
    flags it).  The detector arm (n_copies >= 2) is therefore exercised
    at the sweep SF; if a testdata regeneration drops the duplicates,
    q58 goes q304-class dead at EVERY scale and this pin (DuckDB-side,
    cheap) goes red instead of staying hash-green."""
    import duckdb

    con = duckdb.connect()
    n = con.execute(
        "SELECT COUNT(*) FROM (SELECT text FROM "
        "read_parquet('/root/testdata/sf0.1/documents.parquet') "
        "GROUP BY text HAVING COUNT(*) >= 2)"
    ).fetchone()[0]
    assert n > 0
