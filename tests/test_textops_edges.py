"""Edge-case invariants for the chunking/packing/split operators on a
synthetic corpus the driver testdata never exercises: empty and
whitespace-only documents, single-token docs, and exact chunk-boundary
lengths. q94's empty-doc clamp (Spark floor vs DuckDB toward-zero
division on offset-1) is regression-locked cross-engine here."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from database_migrator_spark.plans.registry import all_queries


_DOCS = [
    # (doc_id, text, lang, source)
    (0, "", "en", "web"),                      # empty
    (1, "   ", "en", "web"),                   # whitespace-only -> 0 tokens
    (2, "one", "en", "web"),                   # single token
    (3, " ".join(f"w{i}" for i in range(32)), "en", "web"),   # exactly one chunk
    (4, " ".join(f"w{i}" for i in range(33)), "en", "web"),   # boundary + 1
    (5, " ".join(f"w{i}" for i in range(512)), "en", "books"),  # exactly one sequence
    (6, " ".join(f"w{i}" for i in range(700)), "en", "books"),  # straddles sequences
    (7, "alpha beta", "de", "web"),
    (8, " ".join(["dup"] * 40), "de", "web"),  # maximal repetition
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("edge_docs")
    pdf = pd.DataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in _DOCS],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        str(base / "documents.parquet")
    )
    return str(base)


def _duck_on(edge_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_dir}/documents.parquet/*.parquet')"
    )
    return con


def test_chunking_partitions_tokens_exactly(spark, edge_dir):
    rows = all_queries()["q87_token_window_chunks"].build(spark, edge_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 0 not in by_doc and 1 not in by_doc  # token-less docs drop out
    n_toks = {2: 1, 3: 32, 4: 33, 5: 512, 6: 700, 7: 2, 8: 40}
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        assert all(1 <= c["n_chunk_tokens"] <= 32 for c in chunks)
        assert sum(c["n_chunk_tokens"] for c in chunks) == n_toks[doc]


def test_packing_matches_oracle_on_empty_docs(spark, edge_dir):
    """The exact scenario the q94 clamp fixed: zero-token docs at shard
    offsets — Spark and DuckDB must agree row-for-row."""
    dq = all_queries()["q94_sequence_packing"]
    got = [tuple(r) for r in dq.build(spark, edge_dir).collect()]
    want = [tuple(r) for r in _duck_on(edge_dir).execute(dq.oracle).fetchall()]
    assert got == want
    by_id = {r[0]: r for r in got}
    for doc_id in (0, 1):  # zero-token docs collapse to their own sequence
        assert by_id[doc_id][6] == by_id[doc_id][5]  # last_seq == first_seq


def test_packing_offsets_are_shard_cumulative(spark, edge_dir):
    rows = all_queries()["q94_sequence_packing"].build(spark, edge_dir).collect()
    shards: dict[tuple, list] = {}
    for r in rows:
        shards.setdefault((r["lang"], r["source"]), []).append(r)
    for members in shards.values():
        members.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in members:
            assert r["start_offset"] == offset
            assert r["last_seq"] >= r["first_seq"]
            offset += r["n_toks"]


def test_packing_two_level_matches_single_window(spark, edge_dir):
    """bucket_width=2 forces every shard across multiple buckets; the
    two-level prefix sum (within-bucket cumsum + broadcast bucket bases)
    must reproduce the single-window shard-cumulative offsets exactly."""
    from database_migrator_spark.operators.textops import sequence_packing

    docs = spark.read.parquet(f"{edge_dir}/documents.parquet")
    rows = sequence_packing(docs, seq_len=128, bucket_width=2).collect()
    shards: dict[tuple, list] = {}
    for r in rows:
        shards.setdefault((r["lang"], r["source"]), []).append(r)
    for members in shards.values():
        members.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in members:
            assert r["start_offset"] == offset
            offset += r["n_toks"]
    # and identical to the wide-bucket (single bucket) configuration
    wide = {
        r["doc_id"]: tuple(r)
        for r in sequence_packing(docs, seq_len=128, bucket_width=1 << 40).collect()
    }
    assert {r["doc_id"]: tuple(r) for r in rows} == wide


def test_split_deterministic_and_total(spark, edge_dir):
    dq = all_queries()["q93_train_val_test_split"]
    a = [tuple(r) for r in dq.build(spark, edge_dir).collect()]
    b = [tuple(r) for r in dq.build(spark, edge_dir).collect()]
    assert a == b  # reproducible across plans/runs
    assert len(a) == len(_DOCS)  # empty docs still get a split
    assert {s for _, s in a} <= {"train", "val", "test"}


def test_library_functions_accept_custom_params(spark, edge_dir):
    """The operators are reusable beyond their declared-query defaults:
    custom chunk size, sequence length, shingle width, and top-k."""
    from pyspark.sql import functions as F

    from database_migrator_spark.operators.textops import (
        benchmark_decontamination,
        heavy_hitters,
        sequence_packing,
        token_window_chunks,
        train_val_test_split,
    )
    from database_migrator_spark.sources import table

    docs = spark.read.parquet(f"{edge_dir}/documents.parquet")
    # chunk_size=16: the 33-token doc needs ceil(33/16)=3 chunks
    chunks = token_window_chunks(docs, chunk_size=16).collect()
    c4 = sorted(
        (r for r in chunks if r["doc_id"] == 4), key=lambda r: r["chunk_id"]
    )
    assert [r["n_chunk_tokens"] for r in c4] == [16, 16, 1]
    # seq_len=128: the 700-token doc at shard offset 544 spans seqs 4..9
    packed = {r["doc_id"]: r for r in sequence_packing(docs, seq_len=128).collect()}
    assert packed[6]["first_seq"] == packed[6]["start_offset"] // 128
    assert packed[6]["last_seq"] == (packed[6]["start_offset"] + 700 - 1) // 128
    # k=2 shingles against an explicit one-doc benchmark frame
    hits = benchmark_decontamination(
        docs.where(F.col("doc_id") != 7), docs.where(F.col("doc_id") == 7), k=2
    ).collect()
    assert all(r["n_shared_2grams"] >= 1 for r in hits)
    # heavy hitters on a different table/column entirely
    from .conftest import SF_SMOKE

    ev = table(spark, SF_SMOKE, "events")
    top = heavy_hitters(ev.select("event_type"), "event_type", k=3).collect()
    exact = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "event_type")
        .limit(3)
        .collect()
    )
    assert [tuple(r) for r in top] == [tuple(r) for r in exact]
    # split thresholds shift the assignment but stay total + deterministic
    s = train_val_test_split(docs, val_threshold="80", test_threshold="c0").collect()
    assert len(s) == docs.count() and all(r["split"] in {"train", "val", "test"} for r in s)


def test_repetition_score_maximal_dup_doc(spark, edge_dir):
    rows = {
        r["doc_id"]: r
        for r in all_queries()["q88_repetition_score"].build(spark, edge_dir).collect()
    }
    assert 0 not in rows and 2 not in rows  # <3-token docs excluded
    assert rows[8]["dup_trigram_frac"] > 0.9  # 40x repeated token
    assert rows[8]["top_token_frac"] == 1.0
    assert rows[5]["dup_trigram_frac"] == 0.0  # all-distinct tokens


def test_exactness_guard_fails_loudly_past_2pow53(spark):
    """q103/q104's fixed-point bound is guarded, not assumed: synthetic
    counts whose BIGINT product exceeds 2^53 must abort the job with the
    documented message instead of silently losing ulps; in-bound counts
    pass every row through unchanged."""
    from pyspark.sql import functions as F

    from database_migrator_spark.functions.exact import (
        EXACT_DOUBLE_BOUND,
        exactness_guard,
    )

    df = spark.createDataFrame(
        [(2**30, 2**30), (10, 20)], "c_s long, n_g long"
    )
    cond = F.col("c_s").cast("double") * F.col("n_g").cast("double") < F.lit(
        EXACT_DOUBLE_BOUND
    )
    with pytest.raises(Exception, match="2\\^53"):
        df.where(exactness_guard(cond, "test: product >= 2^53")).count()
    ok = spark.createDataFrame([(10, 20), (3, 4)], "c_s long, n_g long")
    assert ok.where(exactness_guard(cond, "test: product >= 2^53")).count() == 2


def test_bigram_lm_score_hand_computed(spark, tmp_path):
    """q108 on a 3-doc corpus small enough to verify by hand: docs with
    <2 tokens are excluded, and the repeated bigram is cheaper (lower
    NLL) than the one with a branching history."""
    import math

    import pandas as pd

    from database_migrator_spark.plans.registry import all_queries

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a b", "a b", "a c", "solo"],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [3, 3, 3, 4],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in all_queries()["q108_bigram_lm_score"].build(spark, str(tmp_path)).collect()
    }
    assert 3 not in rows  # single-token doc has no bigrams
    # c(a,b)=2, c(a,c)=1, c(a·)=3 -> nll(a,b)=ln(3/2), nll(a,c)=ln(3)
    fp = lambda x: round(x * 1e12) / 1e12  # the fixed-point the query applies
    assert abs(rows[0]["avg_nll"] - fp(math.log(1.5))) < 1e-12
    assert abs(rows[2]["avg_nll"] - fp(math.log(3.0))) < 1e-12
    assert rows[0]["avg_nll"] < rows[2]["avg_nll"]
    assert rows[0]["n_bigrams"] == 1


def test_seq_length_histogram_bucket_boundaries(spark, tmp_path):
    """q111 buckets are [lo, 2*lo): exact boundary token counts land in
    the upper bucket, and fractions sum to 1."""
    import pandas as pd

    from database_migrator_spark.plans.registry import all_queries

    texts = [" ".join(["w"] * n) for n in (31, 32, 63, 64, 512, 2000)]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    rows = {
        r["bucket_lo"]: r
        for r in all_queries()["q111_seq_length_histogram"].build(spark, str(tmp_path)).collect()
    }
    assert rows[0]["n_docs"] == 1       # 31
    assert rows[32]["n_docs"] == 2      # 32, 63
    assert rows[64]["n_docs"] == 1      # 64
    assert rows[512]["n_docs"] == 1     # 512
    assert rows[1024]["n_docs"] == 1    # 2000
    assert abs(sum(r["frac_docs"] for r in rows.values()) - 1.0) < 1e-12


def test_greedy_coverage_matches_python_reference(spark, tmp_path):
    """q199 equals a pure-Python greedy on a corpus engineered with a
    known selection order: doc 0 has the biggest vocabulary, then the
    greedy picks by MARGINAL gain (not raw size), ties to lowest id."""
    import pandas as pd

    from database_migrator_spark.plans.registry import all_queries

    texts = [
        "a b c d e",        # gain 5 — picked first
        "a b c d x",        # raw 5 but marginal 1 after doc0
        "p q r",            # marginal 3 — picked second
        "p q r s",          # superset of doc2: marginal 1 (s) after it
        "x y",              # marginal 2 after doc1? x covered only if doc1 picked
        "z",                # marginal 1
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")

    # pure-Python greedy reference (ties -> lowest doc_id; only docs
    # with gain >= 1 are candidates; no re-selection)
    docterms = {i: set(t.split()) for i, t in enumerate(texts)}
    covered: set = set()
    chosen: list = []
    expect = []
    for r in range(1, 6):
        best = None
        for i, ts in docterms.items():
            if i in chosen:
                continue
            g = len(ts - covered)
            if g >= 1 and (best is None or g > best[1] or (g == best[1] and i < best[0])):
                best = (i, g)
        if best is None:
            break
        chosen.append(best[0])
        covered |= docterms[best[0]]
        expect.append((r, best[0], best[1], len(covered)))

    got = [
        (r["round"], r["doc_id"], r["new_terms"], r["covered_total"])
        for r in all_queries()["q199_greedy_coverage"].build(spark, str(tmp_path)).collect()
    ]
    assert got == expect


def test_phrase_proximity_hand_positions(spark, tmp_path):
    """q195 on a corpus where the two highest-df length>=6 terms and
    every pairwise distance are known by construction."""
    import pandas as pd

    from database_migrator_spark.plans.registry import all_queries

    # "planet" and "galaxy" are the only len>=6 terms; df(planet)=3 >
    # df(galaxy)=2 -> qa=planet, qb=galaxy
    texts = [
        "planet x galaxy",            # dist 2 -> within
        "planet a b c d e f galaxy",  # dist 7 -> NOT within (<=4)
        "planet only here",
        "galaxy planet",              # dist 1, two pairs? one pos each
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in all_queries()["q195_phrase_proximity"].build(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {0, 3}  # doc1 fails the <=4 bound, doc2 lacks galaxy
    assert rows[0]["min_dist"] == 2 and rows[0]["n_within"] == 1
    assert rows[3]["min_dist"] == 1 and rows[3]["n_within"] == 1
    assert rows[0]["term_a"] == "planet" and rows[0]["term_b"] == "galaxy"


def test_bm25_matches_python_reference(spark, tmp_path):
    """q191 equals a pure-Python BM25 (k1=1.2, b=0.75) on a tiny corpus
    whose 3 query terms are known by construction."""
    import math

    import pandas as pd

    from database_migrator_spark.plans.registry import all_queries

    texts = [
        "common1 common2 common3 filler",
        "common1 common2 common3 common1 common1",
        "common1 other words here now",
        "common2 common3 nothing else",
        "unrelated text entirely",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")

    toks = [t.split() for t in texts]
    from collections import Counter

    tfs = [Counter(t) for t in toks]
    dls = [len(t) for t in toks]
    n_docs, total = len(toks), sum(dls)
    avgdl = total / n_docs
    df = Counter()
    for c in tfs:
        df.update(c.keys())
    qterms = sorted(
        (t for t in df if len(t) >= 6), key=lambda t: (-df[t], t)
    )[:3]
    assert set(qterms) == {"common1", "common2", "common3"}
    k1, b = 1.2, 0.75
    want = {}
    for i, c in enumerate(tfs):
        fp = 0
        hits = 0
        for t in qterms:
            tf = c.get(t, 0)
            if tf == 0:
                continue
            hits += 1
            # r14: Lucene-style non-negative idf (see _bm25_idf)
            idf = math.log((2 * n_docs + 2) / (2 * df[t] + 1))
            sat = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[i] / avgdl))
            fp += round(idf * sat * 1e12)
        if hits:
            want[i] = (hits, fp / 1e12)
    got = {
        r["doc_id"]: (r["n_terms_hit"], r["score"])
        for r in all_queries()["q191_bm25_topk"].build(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 1e-9


def test_association_rules_hand_lift(spark, tmp_path):
    """q200 on hand baskets: pair (1,2) occurs in 2 of 4 baskets with
    count_1=3, count_2=2 -> support 0.5, confidence 2/3, lift 4/3."""
    import pandas as pd

    from database_migrator_spark.plans.registry import all_queries

    rows = []
    baskets = {10: [1, 2, 5], 20: [1, 2], 30: [1, 5], 40: [5, 7]}
    ln = 0
    for o, parts in baskets.items():
        for p in parts:
            rows.append((o, p, 1, ln))
            ln += 1
    pdf = pd.DataFrame(
        rows, columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
    )
    pdf["l_quantity"] = 1.0
    pdf["l_extendedprice"] = 1.0
    pdf["l_discount"] = 0.0
    pdf["l_tax"] = 0.0
    pdf["l_returnflag"] = "N"
    pdf["l_linestatus"] = "O"
    pdf["l_shipdate"] = pd.Timestamp("2024-01-01")
    pdf.to_parquet(tmp_path / "lineitem.parquet")
    got = {
        (r["part_a"], r["part_b"]): r
        for r in all_queries()["q200_association_rules"].build(spark, str(tmp_path)).collect()
    }
    # frequent parts: 1 (c=3), 2 (c=2), 5 (c=3); pairs with pc>=2:
    # (1,2) pc=2 and (1,5) pc=2
    assert set(got) == {(1, 2), (1, 5)}
    r12 = got[(1, 2)]
    assert r12["pair_count"] == 2 and r12["count_a"] == 3 and r12["count_b"] == 2
    assert abs(r12["support"] - 0.5) < 1e-9
    assert abs(r12["confidence"] - round(2 / 3 * 1e9) / 1e9) < 1e-12
    assert abs(r12["lift"] - round(2 * 4 / (3 * 2) * 1e9) / 1e9) < 1e-12


def test_zipf_slope_matches_numpy_polyfit(spark):
    """q227's fixed-point integer OLS must agree with numpy's float
    polyfit to ~1e-4 on every source (the 1e-6 quantization of ln is
    the only difference), and slopes must be negative (frequencies
    descend with rank by construction)."""
    import numpy as np
    from pyspark.sql import functions as F

    from database_migrator_spark.operators.dedup import tokens_of
    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    rows = all_queries()["q227_zipf_slope"].build(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    cnt = (
        table(spark, SF_SMOKE, "documents")
        .select("source", F.explode(tokens_of("text")).alias("tok"))
        .groupBy("source", "tok")
        .count()
        .toPandas()
    )
    for r in rows:
        g = cnt[cnt.source == r.source].sort_values(
            ["count", "tok"], ascending=[False, True]
        ).head(100)
        x = np.log(np.arange(1, len(g) + 1))
        y = np.log(g["count"].to_numpy(dtype=float))
        slope = np.polyfit(x, y, 1)[0]
        assert r.n_fit == len(g)
        assert abs(r.zipf_slope - slope) < 1e-4
        assert r.zipf_slope < 0
        assert 0 <= r.r2 <= 1


def test_incremental_index_refresh_merge_is_lossless(spark):
    """q229's invariant beyond the top-20 the oracle checks: for EVERY
    term, old-index df + delta df must equal the df of a full recompute
    over the union — the algebraic property that lets a production
    index absorb a recrawl without a rebuild."""
    from pyspark.sql import functions as F

    from database_migrator_spark.operators.dedup import tokens_of
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    d = table(spark, SF_SMOKE, "documents").select(
        "doc_id", (F.col("doc_id") % 5 == 0).alias("is_delta"), tokens_of("text").alias("t")
    )
    full = (
        d.select(F.explode(F.array_distinct("t")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df_full"))
    )

    def df_of(part, alias):
        return (
            part.select(F.explode(F.array_distinct("t")).alias("term"))
            .groupBy("term")
            .agg(F.count("*").alias(alias))
        )

    # the MERGE structure under test: two separate aggregations (old and
    # delta are never aggregated together) full-outer-joined and summed
    parts = (
        df_of(d.where(~F.col("is_delta")), "df_old")
        .join(df_of(d.where(F.col("is_delta")), "df_delta"), "term", "full_outer")
        .select(
            "term",
            (F.coalesce("df_old", F.lit(0)) + F.coalesce("df_delta", F.lit(0))).alias(
                "df_merged"
            ),
        )
    )
    bad = (
        full.join(parts, "term", "full_outer")
        .where(
            F.coalesce("df_full", F.lit(0)) != F.coalesce("df_merged", F.lit(0))
        )
        .count()
    )
    assert bad == 0
    # and the split is a real partition: both sides non-empty
    assert d.where(F.col("is_delta")).count() > 0
    assert d.where(~F.col("is_delta")).count() > 0


def test_maxscore_equals_exhaustive_and_prunes_at_sf001(spark):
    """q237's MaxScore path must return EXACTLY the exhaustive top-20
    (pruning soundness) at a scale where the prune branch FIRES: at
    sf0.01 the rarest query term ('dup', idf ≈ 3.0) fills the top-20
    (θ ≈ 3e12) while the other two terms' upper bounds are positive but
    small under the r14 Lucene-clamped idf (≈ 0.28·2.2e12 each, Σrest ≈
    1.2e12 < θ), so every document lacking the essential term is still
    eliminated — this asserts both the branch actually pruning
    (θ > Σrest) and result equality under it. The no-prune branch is
    covered at SF_SMOKE by the oracle suite (rarest df < 20 there →
    θ = LONG_MIN)."""
    from pyspark.sql import functions as F

    from database_migrator_spark.operators.textops import (
        _bm25_idf,
        _bm25_term_fp,
        _lex_query_terms,
    )
    from database_migrator_spark.plans.registry import all_queries

    sf = "/root/testdata/sf0.01"
    got = all_queries()["q237_bm25_maxscore_topk"].build(spark, sf).collect()

    tf, dl, stats, _ = _lex_query_terms(spark, sf)
    dfq = tf.groupBy("term").agg(F.count("*").alias("df"))
    qt = dfq.orderBy(F.col("df").asc(), "term").limit(3).select("term", "df")
    exhaustive = (
        _bm25_term_fp(tf.join(F.broadcast(qt), "term"), dl, stats)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            (F.sum("term_fp").cast("double") / F.lit(1e12)).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in exhaustive]

    # the prune condition must actually hold here: θ (20th-best essential
    # score) strictly exceeds the non-essential upper-bound sum
    ub = qt.crossJoin(F.broadcast(stats)).select(
        "term",
        F.round(F.greatest(_bm25_idf(), F.lit(0.0)) * F.lit(2.2) * F.lit(1e12))
        .cast("long")
        .alias("ub_fp"),
    )
    t1 = ub.orderBy(F.col("ub_fp").desc(), "term").limit(1).select("term")
    docs1 = tf.join(F.broadcast(qt), "term").join(
        F.broadcast(t1), "term", "left_semi"
    ).select("doc_id")
    s1 = (
        _bm25_term_fp(
            tf.join(F.broadcast(qt), "term").join(docs1, "doc_id", "left_semi"),
            dl,
            stats,
        )
        .groupBy("doc_id")
        .agg(F.sum("term_fp").alias("score_fp"))
    )
    top = (
        s1.orderBy(F.col("score_fp").desc(), "doc_id")
        .limit(20)
        .agg(F.min("score_fp").alias("m"), F.count("*").alias("c"))
        .collect()[0]
    )
    rest = (
        ub.join(t1, "term", "left_anti")
        .agg(F.coalesce(F.sum("ub_fp"), F.lit(0)).alias("s"))
        .collect()[0]
    )
    assert top.c == 20 and rest.s < top.m, "prune branch did not fire at sf0.01"


def test_kneser_ney_probabilities_normalize_and_match_python(spark):
    """q243: on the smoke corpus the assembled KN probabilities must (a)
    nearly normalize per left-context (Σ_w2 P(w2|w1) ≤ 1, with deficit
    only from unseen continuations and fixed-point floors) and (b) match
    a plain-Python reimplementation of the interpolated-KN formula
    within the two floor divisions' 2e-12 truncation."""
    from collections import Counter, defaultdict

    from database_migrator_spark.operators.dedup import tokens_of  # noqa: F401
    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table as _table

    from .conftest import SF_SMOKE

    got = {
        r.doc_id: (r.n_bigrams, r.avg_kn_nll)
        for r in all_queries()["q243_kneser_ney_bigram_score"]
        .build(spark, SF_SMOKE)
        .collect()
    }
    docs = {
        r.doc_id: [t for t in r.text.lower().split() if t]
        for r in _table(spark, SF_SMOKE, "documents").collect()
    }
    c2 = Counter()
    for ts in docs.values():
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] += 1
    c1, n1f, n1p = Counter(), Counter(), Counter()
    for (a, b), c in c2.items():
        c1[a] += c
        n1f[a] += 1
        n1p[b] += 1
    T = len(c2)

    def p_fp(a, b):
        return (4 * c2[(a, b)] - 3) * 10**12 // (4 * c1[a]) + (
            3 * n1f[a] * 10**12 // (4 * c1[a])
        ) * n1p[b] // T

    # (a) normalization per context over the FULL vocabulary: unseen
    # continuations get only the backoff term (max(c2-D,0) = 0), so the
    # total must reach 1 up to fixed-point floors (~|V|*2e-12)
    vocab = sorted(n1p)
    by_w1 = defaultdict(set)
    for a, b in c2:
        by_w1[a].add(b)
    for a, bs in by_w1.items():
        s = sum(
            p_fp(a, b)
            if b in bs
            else (3 * n1f[a] * 10**12 // (4 * c1[a])) * n1p[b] // T
            for b in vocab
        ) / 1e12
        assert 1.0 - 1e-6 < s <= 1.0 + 1e-9, (a, s)
    # (b) per-doc surprisal replay
    import math

    for doc_id, ts in docs.items():
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            assert doc_id not in got
            continue
        s = sum(round(-math.log(p_fp(a, b) / 1e12) * 1e12) for a, b in pairs)
        want = s / 1e12 / len(pairs)
        n, nll = got[doc_id]
        assert n == len(pairs)
        assert abs(nll - want) < 1e-9


def test_rm3_weight_budget_and_expansion_provenance(spark):
    """q245: the λ=1/2 interpolation must conserve the 1e4 weight budget
    up to integer floors (orig 3×1666 + expansion Σ(5000·rm DIV Σrm) ∈
    [9990, 9998]), every expansion term must come from the top-10
    feedback docs' vocabulary with len ≥ 4, and a Python replay of the
    rm estimation + selection over the engine's own tf substrate must
    pick the same 8 terms."""
    from pyspark.sql import functions as F

    from database_migrator_spark.operators.textops import (
        _bm25_doc_scores,
        _lex_query_terms,
    )

    from .conftest import SF_SMOKE

    tf, dl, stats, qt = _lex_query_terms(spark, SF_SMOKE)
    top10 = [
        r.doc_id
        for r in _bm25_doc_scores(spark, SF_SMOKE)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
        .collect()
    ]
    dlm = {r.doc_id: r.dl for r in dl.collect()}
    rm = {}
    fb_vocab = set()
    for r in tf.collect():
        if r.doc_id in top10:
            fb_vocab.add(r.term)
            rm[r.term] = rm.get(r.term, 0) + r.tf * 10**9 // dlm[r.doc_id]
    exp8 = sorted(
        ((t, m) for t, m in rm.items() if len(t) >= 4),
        key=lambda kv: (-kv[1], kv[0]),
    )[:8]
    total_rm = sum(m for _, m in exp8)
    wts = {t: 1666 for t in (r.term for r in qt.collect())}
    for t, m in exp8:
        wts[t] = wts.get(t, 0) + 5000 * m // total_rm
    assert fb_vocab >= {t for t, _ in exp8}
    assert 9990 <= sum(wts.values()) <= 9998
    # the engine's q245 must hit only weighted terms and use these weights:
    # replay the final scoring contract on the returned frame
    from database_migrator_spark.plans.registry import all_queries

    got = all_queries()["q245_rm3_expansion_rescore"].build(spark, SF_SMOKE)
    rows = got.collect()
    assert 0 < len(rows) <= 20
    assert all(1 <= r.n_terms_hit <= len(wts) for r in rows)
    assert all(
        rows[i].score > rows[i + 1].score
        or (rows[i].score == rows[i + 1].score and rows[i].doc_id < rows[i + 1].doc_id)
        for i in range(len(rows) - 1)
    )


def test_unseen_mass_matches_python_replay(spark):
    """q254: a Counter-based replay — per-source and corpus-level token
    frequencies, hapax/dis counts, integer Turing share and
    bias-corrected Chao1 — must reproduce every row; Chao1 never falls
    below observed vocab, p_unseen ∈ [0,1], and the corpus-level hapax
    count is ≤ the per-source sum (cross-source merging can only demote
    hapaxes)."""
    import re
    from collections import Counter

    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents").select("source", "text").collect()
    per_src, all_cnt = {}, Counter()
    for r in docs:
        toks = [t for t in re.split(r"\s+", (r.text or "").lower()) if t]
        per_src.setdefault(r.source, Counter()).update(toks)
        all_cnt.update(toks)

    def stats(c):
        n = sum(c.values())
        v = len(c)
        n1 = sum(1 for f in c.values() if f == 1)
        n2 = sum(1 for f in c.values() if f == 2)
        return (
            n, v, n1, n2,
            (n1 * 10**12) // n / 1e12,
            v + (n1 * (n1 - 1)) // (2 * (n2 + 1)),
        )

    expect = sorted(
        [("ALL", *stats(all_cnt))]
        + [(s, *stats(c)) for s, c in per_src.items() if sum(c.values()) > 0]
    )
    got = [
        tuple(r) for r in all_queries()["q254_unseen_mass_estimate"]
        .build(spark, SF_SMOKE)
        .collect()
    ]
    assert got == expect
    for _, n, v, n1, n2, pu, chao in got:
        assert chao >= v and 0.0 <= pu <= 1.0
    all_row = dict((r[0], r) for r in got)["ALL"]
    assert all_row[3] <= sum(r[3] for r in got if r[0] != "ALL")


def test_mmr_greedy_matches_python_replay_and_diversifies(spark):
    """q256: a Python replay of the greedy MMR recursion over the SAME
    collected candidate/pair tables must reproduce all 10 picks exactly;
    the picked set must be no more redundant (mean pairwise Jaccard)
    than the plain BM25 top-10 it reranks; rank 1 is the top-relevance
    doc and every max_sim_prior refers only to earlier picks."""
    from pyspark.sql import functions as F

    from database_migrator_spark.operators.textops import (
        _bm25_term_fp,
        _lex_query_terms,
    )
    from database_migrator_spark.plans.registry import all_queries

    from .conftest import SF_SMOKE

    tf, dl, stats, qt = _lex_query_terms(spark, SF_SMOKE)
    scored = _bm25_term_fp(tf.join(F.broadcast(qt), "term"), dl, stats)
    rel = {
        r.doc_id: r.rel_fp
        for r in scored.groupBy("doc_id")
        .agg(F.sum("term_fp").alias("rel_fp"))
        .orderBy(F.col("rel_fp").desc(), "doc_id")
        .limit(20)
        .collect()
    }
    terms = {
        r.doc_id: set(r.ts)
        for r in tf.where(F.col("doc_id").isin(list(rel)))
        .groupBy("doc_id")
        .agg(F.collect_set("term").alias("ts"))
        .collect()
    }
    mx, mn = max(rel.values()), min(rel.values())
    relnorm = {
        d: (((v - mn) * 10_000) // (mx - mn)) * 100_000_000 if mx > mn else 0
        for d, v in rel.items()
    }

    def sim(a, b):
        i = len(terms[a] & terms[b])
        return (i * 10**12) // (len(terms[a]) + len(terms[b]) - i) if i else 0

    sel, expect = [], []
    for rank in range(1, 11):
        best = None
        for c in sorted(set(rel) - set(sel)):
            ms = max((sim(c, p) for p in sel), default=0)
            mmr = (relnorm[c] + 10**12 - ms) // 2
            if best is None or (-mmr, c) < (-best[3], best[0]):
                best = (c, relnorm[c], ms, mmr)
        sel.append(best[0])
        expect.append((rank, best[0], best[1] / 1e12, best[2] / 1e12, best[3] / 1e12))
    got = [
        (r.rank, r.doc_id, r.rel_norm, r.max_sim_prior, r.mmr_score)
        for r in all_queries()["q256_mmr_diversified_topk"].build(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    bm25_top10 = sorted(rel, key=lambda d: (-rel[d], d))[:10]

    def mean_pair_sim(docs):
        ps = [sim(a, b) for a in docs for b in docs if a < b]
        return sum(ps) / len(ps)

    assert mean_pair_sim(sel) <= mean_pair_sim(bm25_top10) + 1e-12
    assert got[0][1] == max(relnorm, key=lambda d: (relnorm[d], -d))


def test_index_delete_refresh_decrement_is_lossless_full_vocab(spark):
    """q260: the decrement merge must equal a from-scratch surviving-
    corpus index for EVERY term (not just the emitted top-20), vanished
    terms are exactly those whose df came only from deleted docs, and
    no survivor's stats ever go negative."""
    from pyspark.sql import functions as F

    from database_migrator_spark.operators.textops import doc_term_frequencies

    from .conftest import SF_SMOKE

    tf = doc_term_frequencies(spark, SF_SMOKE)
    old = tf.groupBy("term").agg(F.count("*").alias("df"), F.sum("tf").alias("t"))
    delta = (
        tf.where(F.col("doc_id") % 17 == 0)
        .groupBy("term")
        .agg(F.count("*").alias("dfd"), F.sum("tf").alias("td"))
    )
    merged = {
        r.term: (r.df - (r.dfd or 0), r.t - (r.td or 0))
        for r in old.join(delta, "term", "left").collect()
    }
    direct = {
        r.term: (r.df, r.t)
        for r in tf.where(F.col("doc_id") % 17 != 0)
        .groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("t"))
        .collect()
    }
    assert {t: v for t, v in merged.items() if v[0] > 0} == direct
    assert all(df >= 0 and t >= 0 for df, t in merged.values())
    vanished = {t for t, (df, _) in merged.items() if df == 0}
    assert vanished == set(merged) - set(direct)
