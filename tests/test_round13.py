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


# --- q306 unigram-LM tokenizer -------------------------------------------------


def _rnd(x):
    """half-away-from-zero, matching DuckDB/Spark ROUND (python round()
    is banker's)."""
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def _unigram_lm_reference(word_counts, n_rounds=2, topk_multi=20):
    """Pure-Python replay of the q306 trainer: seed substring counts,
    hard-EM Viterbi rounds on 1e-9 fixed-point log-probs, final encode."""
    subs: Counter = Counter()
    for w, n in word_counts.items():
        for i in range(len(w)):
            for j in range(1, min(4, len(w) - i) + 1):
                subs[w[i : i + j]] += n
    singles = {p: c for p, c in subs.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in subs.items() if len(p) >= 2),
        key=lambda x: (-x[1], x[0]),
    )[:topk_multi]
    vocab = dict(singles)
    vocab.update(dict(multi))
    v = len(vocab)
    tot = sum(vocab.values())
    w_fp = {p: _rnd(math.log((c + 1) / (tot + v)) * 1e9) for p, c in vocab.items()}

    def viterbi(word, wfp):
        dps = [0]
        segs = [[]]
        for pos in range(1, len(word) + 1):
            best = None
            for j in range(1, min(4, pos) + 1):
                piece = word[pos - j : pos]
                if piece in wfp:
                    s = dps[pos - j] + wfp[piece]
                    if best is None or (s, j) > best[:2]:
                        best = (s, j, piece)
            dps.append(best[0])
            segs.append(segs[pos - best[1]] + [best[2]])
        return segs[-1]

    for _ in range(n_rounds):
        cnt: Counter = Counter()
        for w, n in word_counts.items():
            for p in viterbi(w, w_fp):
                cnt[p] += n
        tot_k = sum(cnt.values())
        w_fp = {
            p: _rnd(math.log((cnt.get(p, 0) + 1) / (tot_k + v)) * 1e9) for p in vocab
        }
    final: Counter = Counter()
    for w, n in word_counts.items():
        for p in viterbi(w, w_fp):
            final[p] += n
    return final, w_fp


def test_q306_matches_python_trainer(catalog, spark):
    """The Spark trainer's top-20 pieces, counts AND fixed-point
    log-probs match a sequential pure-Python replay exactly."""
    out = _run(catalog, spark, "q306_unigram_lm_vocabulary")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    wc: Counter = Counter()
    for t in docs.text:
        for w in re.split(r"\s+", t.lower()):
            if w:
                wc[w] += 1
    final, w_fp = _unigram_lm_reference(wc)
    rows = sorted(((p, c) for p, c in final.items()), key=lambda x: (-x[1], x[0]))[:20]
    expect = pd.DataFrame(
        [(p, c, w_fp[p] / 1e9) for p, c in rows],
        columns=["piece", "cnt", "logprob"],
    )
    pd.testing.assert_frame_equal(out.reset_index(drop=True), expect)


def test_q306_viterbi_prefers_vocab_piece_over_chars(spark):
    """Known-truth: a corpus where one bigram dominates must produce a
    multi-char piece in the vocabulary whose Viterbi count equals the
    word count — i.e. the tokenizer actually LEARNS a unit, it doesn't
    degenerate to characters."""
    from database_migrator_spark.operators.bpe import unigram_lm_pieces

    docs = spark.createDataFrame(
        [(i, "abab " * 5) for i in range(8)], "doc_id long, text string"
    )
    out = unigram_lm_pieces(docs).toPandas().set_index("piece")
    # 'abab' is the most frequent multi-char substring; the whole word is
    # in the seed vocab and beats any char path under the learned probs
    assert "abab" in out.index
    assert out.loc["abab", "cnt"] == 40  # 8 docs x 5 repeats


def test_q306_second_em_round_changes_segmentation(spark):
    """Iteration-matters proof: on this planted corpus the round-1
    reweighting segments 'aaba' as a+aba, and the SECOND EM round flips
    it to the whole-word piece — r1 and r2 references disagree, and the
    Spark trainer (2 rounds) must match the r2 answer. Guards against a
    refactor that silently stops iterating (on the synthetic corpus the
    EM is at a fixed point after round 1, so the catalog oracle alone
    cannot catch that)."""
    from database_migrator_spark.operators.bpe import unigram_lm_pieces

    wc = {"babaaa": 1, "aaba": 2, "ababa": 12}
    f1, _ = _unigram_lm_reference(wc, n_rounds=1)
    f2, w2 = _unigram_lm_reference(wc, n_rounds=2)
    assert f1 != f2  # the planted corpus really exercises round 2
    rows = []
    i = 0
    for w, n in wc.items():
        for _ in range(n):
            rows.append((i, w))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        unigram_lm_pieces(docs)
        .toPandas()
        .sort_values("piece")
        .reset_index(drop=True)
    )
    expect = (
        pd.DataFrame(
            [(p, c, w2[p] / 1e9) for p, c in f2.items()],
            columns=["piece", "cnt", "logprob"],
        )
        .sort_values("piece")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, expect)
