"""Known-truth tests for the round-12 additions — each query also
carries a DuckDB hash oracle in the registry; these pin the SEMANTICS
against an independent pandas replay or an algebraic invariant, the
same belt-and-suspenders the earlier families carry."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
import pytest

from database_migrator_spark.plans.registry import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def catalog():
    return all_queries()


def _run(catalog, spark, name, sf=SF):
    return catalog[name].build(spark, sf).toPandas()


# --- q294 exact-substring span boundaries ------------------------------------


def _replay_spans(sf):
    """Sequential replay of the ExactSubstr span cut: global 8-gram
    counts, per-doc repeated positions, maximal consecutive runs."""
    docs = pd.read_parquet(f"{sf}/documents.parquet")[["doc_id", "text"]]
    grams: dict[int, list[str]] = {}
    counts: Counter[str] = Counter()
    for doc_id, text in docs.itertuples(index=False):
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        if len(toks) < 8:
            continue
        gs = [" ".join(toks[i : i + 8]) for i in range(len(toks) - 7)]
        grams[doc_id] = gs
        counts.update(gs)
    rows = []
    for doc_id, gs in grams.items():
        hit = [i + 1 for i, g in enumerate(gs) if counts[g] > 1]  # 1-based
        run: list[int] = []
        for p in hit + [None]:
            if run and (p is None or p != run[-1] + 1):
                rows.append(
                    (doc_id, run[0], run[-1] + 7, run[-1] + 8 - run[0], len(run))
                )
                run = []
            if p is not None:
                run.append(p)
    return pd.DataFrame(
        rows, columns=["doc_id", "span_start", "span_end", "span_tokens", "n_windows"]
    ).sort_values(["doc_id", "span_start"]).reset_index(drop=True)


def test_q294_matches_sequential_replay(catalog, spark):
    out = _run(catalog, spark, "q294_exact_substring_spans").reset_index(drop=True)
    exp = _replay_spans(SF)
    assert len(out) == len(exp) > 0
    pd.testing.assert_frame_equal(
        out.astype("int64"), exp.astype("int64"), check_dtype=False
    )


def test_q294_windows_sum_to_q113_repeated_counts(catalog, spark):
    """Algebraic tie to q113: every repeated 8-gram window position lies
    in exactly one maximal span, so per-doc Σ n_windows over spans must
    equal q113's n_repeated."""
    spans = _run(catalog, spark, "q294_exact_substring_spans")
    frac = _run(catalog, spark, "q113_repeated_ngram_spans")
    per_doc = spans.groupby("doc_id")["n_windows"].sum()
    q113 = frac.set_index("doc_id")["n_repeated"]
    q113_pos = q113[q113 > 0]
    assert per_doc.sort_index().equals(q113_pos.sort_index().astype(per_doc.dtype))
    # spans are disjoint, in-order, and genuinely maximal (no two
    # adjacent spans touch — they would have merged)
    for _, g in spans.groupby("doc_id"):
        starts, ends = g["span_start"].tolist(), g["span_end"].tolist()
        assert all(s2 > e1 - 7 + 1 for e1, s2 in zip(ends, starts[1:]))
        assert all(e - s + 1 == t for s, e, t in zip(starts, ends, g["span_tokens"]))
