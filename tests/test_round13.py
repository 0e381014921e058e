"""Known-truth tests for the round-13 additions — each query also
carries a DuckDB hash oracle in the registry; these pin the SEMANTICS
against planted inputs or an independent replay, the same
belt-and-suspenders the earlier families carry."""

from __future__ import annotations

import math
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


# --- q307 char-n-gram Naive-Bayes language ID ---------------------------------


def test_q307_recovers_planted_disjoint_alphabets(spark):
    """Known-truth: two planted 'languages' with DISJOINT alphabets must
    be classified perfectly on the held-out split — every test doc's
    grams were seen only under its own class, so the smoothed log-odds
    argmax cannot lose."""
    from database_migrator_spark.operators.textops import nb_charngram_confusion

    rows = []
    # ids 0..9: even ids include the %5==0 held-out docs (0 and 5)
    for i in range(10):
        lang = "aaa" if i % 2 == 0 else "zzz"
        word = "abba" if lang == "aaa" else "zyyz"
        rows.append((i, lang, " ".join([word] * 6)))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = (
        nb_charngram_confusion(docs)
        .toPandas()
        .sort_values(["true_lang", "pred_lang"])
        .reset_index(drop=True)
    )
    # held-out docs: 0 (aaa), 5 (zzz) — one of each, both must be correct
    assert out.to_dict("records") == [
        {"true_lang": "aaa", "pred_lang": "aaa", "n_docs": 1},
        {"true_lang": "zzz", "pred_lang": "zzz", "n_docs": 1},
    ]


def test_q307_replays_sklearn_style_nb(catalog, spark):
    """Independent replay: multinomial NB with +1 smoothing and log-prior
    on char-3-grams (pure Python floats, no fixed point) predicts the
    same confusion matrix — the 1e-9 fixed-point rounding never flips an
    argmax at this scale."""
    out = _run(catalog, spark, "q307_charngram_naive_bayes_langid")
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "lang", "text"]]

    def grams(text):
        gs = []
        for w in re.split(r"\s+", text.lower()):
            if not w:
                continue
            p = f"_{w}_"
            gs.extend(p[i : i + 3] for i in range(len(p) - 2))
        return gs

    train = docs[docs.doc_id % 5 != 0]
    test = docs[docs.doc_id % 5 == 0]
    cnt: dict[str, Counter] = {}
    ndocs: Counter = Counter()
    for _, r in train.iterrows():
        gs = grams(r.text)
        if not gs:
            continue
        cnt.setdefault(r.lang, Counter()).update(gs)
        ndocs[r.lang] += 1
    vocab = {g for c in cnt.values() for g in c}
    v = len(vocab)
    nd_all = sum(ndocs.values())
    pred_rows = []
    for _, r in test.iterrows():
        gs = grams(r.text)
        if not gs:
            continue
        best = None
        for lang in sorted(cnt):
            tot = sum(cnt[lang].values())
            s = math.log(ndocs[lang] / nd_all) + sum(
                math.log((cnt[lang].get(g, 0) + 1) / (tot + v)) for g in gs
            )
            if best is None or s > best[0] + 1e-9:
                best = (s, lang)
        pred_rows.append((r.lang, best[1]))
    expect = (
        pd.DataFrame(pred_rows, columns=["true_lang", "pred_lang"])
        .groupby(["true_lang", "pred_lang"])
        .size()
        .reset_index(name="n_docs")
        .sort_values(["true_lang", "pred_lang"])
        .reset_index(drop=True)
    )
    got = out.sort_values(["true_lang", "pred_lang"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_docs": "int64"}), expect.astype({"n_docs": "int64"})
    )
