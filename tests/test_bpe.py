"""BPE trainer: the Spark word-histogram implementation must reproduce a
pure-Python reference BPE (classic Sennrich-style merge loop) exactly —
merge order, pair identities, and corpus-weighted counts."""

from __future__ import annotations

from collections import Counter

from database_migrator_spark.operators.bpe import EOW, EOW_DISPLAY, bpe_train
from database_migrator_spark.plans.registry import all_queries
from database_migrator_spark.sources import table

from .conftest import SF_SMOKE


def _reference_bpe(texts: list[str], n_merges: int) -> list[tuple[int, str, str, int]]:
    words: Counter[str] = Counter()
    for t in texts:
        words.update(w for w in t.lower().split() if w)
    # mirror the collision guard: input chars equal to the sentinel drop
    vocab = {w: [c for c in w if c != EOW] + [EOW] for w in words}
    merges = []
    for rank in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for w, syms in vocab.items():
            n = words[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # max count, ties broken (a ASC, b ASC) — mirror the Spark orderBy
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, cnt))
        ab = a + b
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = ab
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def test_bpe_matches_reference_on_corpus(spark):
    d = table(spark, SF_SMOKE, "documents")
    texts = [r["text"] for r in d.select("text").collect()]
    want = _reference_bpe(texts, 12)
    got = bpe_train(d, n_merges=12)
    assert got == want


def test_bpe_merge_semantics_edge_cases(spark):
    """Overlapping runs ('aaa' under merge (a,a)) must merge greedily
    left-to-right without chaining into the just-produced token, and
    training stops early once the vocabulary is fully merged."""
    rows = [(0, "aaa aaa bb"), (1, "aaa bb bb")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    texts = [t for _, t in rows]
    # run far past exhaustion: both implementations must stop at the
    # same merge list (every word eventually collapses to one symbol)
    want = _reference_bpe(texts, 50)
    got = bpe_train(docs, n_merges=50)
    assert got == want
    assert len(got) < 50  # early-exit actually happened


def test_bpe_declared_query_shape(spark):
    out = all_queries()["q106_bpe_merges"].build(spark, SF_SMOKE)
    rows = out.collect()
    assert [r["rank"] for r in rows] == list(range(len(rows)))
    assert all(r["pair_count"] >= 1 for r in rows)
    assert dict(out.dtypes) == {
        "rank": "bigint",
        "sym_a": "string",
        "sym_b": "string",
        "pair_count": "bigint",
    }


def test_bpe_vocabulary_matches_reference(spark):
    """q107: applying the learned merges must yield the same top-20
    subword vocabulary (corpus-weighted) as the reference trainer's
    final segmentation."""
    d = table(spark, SF_SMOKE, "documents")
    texts = [r["text"] for r in d.select("text").collect()]
    words: Counter[str] = Counter()
    for t in texts:
        words.update(w for w in t.lower().split() if w)
    vocab = {w: [c for c in w if c != EOW] + [EOW] for w in words}
    for _, a, b, _cnt in _reference_bpe(texts, 10):
        ab = a + b
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = ab
                else:
                    out.append(s)
            vocab[w] = out
    counts: Counter[str] = Counter()
    for w, syms in vocab.items():
        for s in syms:
            counts[s.replace(EOW, EOW_DISPLAY)] += words[w]
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["token"], r["cnt"])
        for r in all_queries()["q107_bpe_vocabulary"].build(spark, SF_SMOKE).collect()
    ]
    assert got == want


def test_bpe_sentinel_cannot_collide_with_corpus_chars(spark):
    """A corpus word that literally contains the sentinel codepoint must
    not be conflated with a word boundary: the guard drops the codepoint
    before splitting, so every learned symbol containing EOW is strictly
    word-final (exactly one occurrence, at the end) — whatever bytes the
    corpus carries."""
    poisoned = "a" + EOW + "b"  # would conflate with the boundary marker unguarded
    rows = [(0, f"{poisoned} ab ab cd"), (1, "ab a b cd cd")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = bpe_train(docs, n_merges=50)
    want = _reference_bpe([t for _, t in rows], 50)
    assert got == want
    for _, a, b, _cnt in got:
        for sym in (a, b, a + b):
            if EOW in sym:
                assert sym.count(EOW) == 1 and sym.endswith(EOW)
