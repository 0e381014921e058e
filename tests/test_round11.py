"""Known-truth tests for the round-11 additions (q263-q267) — each query
also carries a DuckDB hash oracle in the registry; these tests pin the
SEMANTICS against an independent numpy/pandas replay or an algebraic
invariant, the same belt-and-suspenders the earlier families carry."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from database_migrator_spark.plans.registry import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def catalog():
    return all_queries()


def _run(catalog, spark, name):
    return catalog[name].build(spark, SF).toPandas()


def test_lloyd_step_matches_numpy_replay(catalog, spark):
    """q263 == a from-scratch numpy Lloyd iteration: argmin assignment
    against the closed-form centroids, then integer-fixed-point means
    with truncating division and old-centroid fallback."""
    from database_migrator_spark.operators.similarity import FIXED_IVF_CENTROIDS

    out = _run(catalog, spark, "q263_lloyd_step_portable")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    V = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    C = np.asarray(FIXED_IVF_CENTROIDS, dtype=np.float64)
    d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)  # ties to lowest id, matching the argmin fold
    x9 = np.round(V * 1e9).astype(np.int64)
    old9 = np.round(C * 1e9).astype(np.int64)
    for j in range(C.shape[0]):
        members = x9[assign == j]
        got = out[out["cluster"] == j].sort_values("d")
        assert list(got["n_assigned"]) == [len(members)] * C.shape[1]
        if len(members):
            sums = members.sum(axis=0)
            # truncating division toward zero (Spark div / DuckDB //)
            exp_mean9 = (np.sign(sums) * (np.abs(sums) // len(members))).astype(
                np.int64
            )
        else:
            exp_mean9 = old9[j]
        assert np.array_equal(got["mean9"].to_numpy(), exp_mean9)
        assert np.array_equal(
            got["shift9"].to_numpy(), exp_mean9 - old9[j] if len(members) else 0 * old9[j]
        )


def test_lloyd_step_reduces_inertia(catalog, spark):
    """One Lloyd step must not increase total inertia (the monotonicity
    that makes KMeans converge): Σ d²(v, new_centroid_of_assign(v)) ≤
    Σ d²(v, old_centroid_of_assign(v))."""
    from database_migrator_spark.operators.similarity import FIXED_IVF_CENTROIDS

    out = _run(catalog, spark, "q263_lloyd_step_portable")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    V = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    C = np.asarray(FIXED_IVF_CENTROIDS, dtype=np.float64)
    assign = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    Cnew = (
        out.sort_values(["cluster", "d"])["mean9"].to_numpy().reshape(C.shape) / 1e9
    )
    before = ((V - C[assign]) ** 2).sum()
    after = ((V - Cnew[assign]) ** 2).sum()
    assert after <= before + 1e-9


def test_randomized_response_debias_identity(catalog, spark):
    """q264: the published estimator must be exactly (4·obs − n)/2 and
    abs_err its distance to the true count; the estimate is a real
    debias (closer to truth than the raw released count when the flip
    moved it) on the aggregate across groups."""
    out = _run(catalog, spark, "q264_randomized_response_release")
    est = (4 * out["released_pos"] - out["n"]) / 2.0
    assert np.array_equal(out["dp_estimate"].to_numpy(), est.to_numpy())
    assert np.allclose(
        out["abs_err"], (out["dp_estimate"] - out["true_pos"]).abs(), rtol=0, atol=0
    )
    # ε=ln3 RR: E[est] = truth; total-level error should be well inside
    # the binomial noise envelope (~2·sqrt(n·p(1-p)) at p=1/4)
    n, err = out["n"].sum(), abs(out["dp_estimate"].sum() - out["true_pos"].sum())
    assert err <= 4.0 * np.sqrt(n * 0.25 * 0.75) + 2


def test_rag_chunking_covers_every_token(catalog, spark):
    """q265: greedy 32/24 cover — first chunk holds min(32, n) tokens,
    consecutive chunks overlap by exactly 8 (except the truncated tail),
    and per doc the union of [i·24+1, i·24+n_tok] is [1, n]."""
    out = _run(catalog, spark, "q265_rag_token_chunking")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n_of = {
        r.doc_id: len([t for t in str(r.text).lower().split() if t])
        for r in docs.itertuples()
    }
    for doc_id, g in out.groupby("doc_id"):
        n = n_of[doc_id]
        g = g.sort_values("chunk_idx")
        expected_chunks = (max(n - 32, 0) + 23) // 24 + 1
        assert len(g) == expected_chunks
        ends = g["chunk_idx"].to_numpy() * 24 + g["n_tok"].to_numpy()
        starts = g["chunk_idx"].to_numpy() * 24  # 0-based exclusive form
        assert ends[-1] == n  # last chunk reaches the document end
        # every gap between consecutive starts is the stride; coverage has
        # no hole because n_tok >= stride for all but the final chunk
        assert (g["n_tok"].to_numpy()[:-1] == np.minimum(32, n - starts[:-1])).all()


def test_cohens_kappa_matches_pandas_replay(catalog, spark):
    """q266 == a pandas replay of the two labelers and the kappa
    arithmetic (per source)."""
    out = _run(catalog, spark, "q266_cohens_kappa_labelers").set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    stop = {"the", "a", "of", "and", "to", "in", "is", "it"}
    rows = []
    for r in docs.itertuples():
        toks = [t for t in str(r.text).lower().split() if t]
        a = int(len(toks) >= 48)
        b = int(len(toks) > 0 and 16 * sum(t in stop for t in toks) >= len(toks))
        rows.append((r.source, a, b))
    df = pd.DataFrame(rows, columns=["source", "a", "b"])
    for src, g in df.groupby("source"):
        n = len(g)
        n11 = int(((g.a == 1) & (g.b == 1)).sum())
        n00 = int(((g.a == 0) & (g.b == 0)).sum())
        n10 = int(((g.a == 1) & (g.b == 0)).sum())
        n01 = int(((g.a == 0) & (g.b == 1)).sum())
        got = out.loc[src]
        assert (got["n"], got["n11"], got["n10"], got["n01"], got["n00"]) == (
            n,
            n11,
            n10,
            n01,
            n00,
        )
        pe_num = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
        exp_kappa = (
            1.0
            if n * n - pe_num == 0
            else (n * (n11 + n00) - pe_num) / (n * n - pe_num)
        )
        assert got["kappa"] == exp_kappa


def test_sequence_packing_totals_consistent(catalog, spark):
    """q267 invariants: token totals across spans equal the corpus total
    (n>0 docs), n_bins = ceil(total/512), tail_waste complements the
    final context, doc_share sums to 1."""
    out = _run(catalog, spark, "q267_sequence_packing_report")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    total = sum(
        len([t for t in str(x).lower().split() if t]) for x in docs["text"]
    )
    assert out["n_tokens"].sum() == total
    n_bins = (total + 511) // 512
    assert (out["n_bins"] == n_bins).all()
    assert (out["tail_waste"] == n_bins * 512 - total).all()
    assert abs(out["doc_share"].sum() - 1.0) < 1e-12
    assert out["n_docs"].sum() == len(docs)  # every sf0.001 doc has tokens
    assert (out["span"] >= 1).all()


def test_shard_manifest_python_replay_and_perturbation(catalog, spark):
    """q268 == a pure-Python replay of the two-level manifest; dropping
    one document flips its shard's fingerprint (the integrity property
    the manifest exists for)."""
    import hashlib

    out = _run(catalog, spark, "q268_shard_manifest_fingerprint").set_index("shard")
    docs = pd.read_parquet(f"{SF}/documents.parquet")

    def manifest(doc_rows):
        shards = {}
        for doc_id, source, text in doc_rows:
            h = hashlib.md5(str(doc_id).encode()).hexdigest()
            shard = int(h[:4], 16) % 8
            shards.setdefault(shard, []).append((h[4:16], doc_id, source, text))
        res = {}
        for shard, rows in shards.items():
            rows.sort(key=lambda r: (r[0], r[1]))
            files = {}
            for pos, (_, doc_id, source, text) in enumerate(rows):
                files.setdefault(pos // 1000, []).append((doc_id, source, text))
            fhashes = [
                hashlib.md5(
                    ",".join(str(d) for d, _, _ in files[fid]).encode()
                ).hexdigest()
                for fid in sorted(files)
            ]
            res[shard] = {
                "n_docs": len(rows),
                "n_tokens": sum(
                    len([t for t in str(x[3]).lower().split() if t]) for x in rows
                ),
                "n_files": len(files),
                "n_sources": len({r[2] for r in rows}),
                "manifest_md5": hashlib.md5(",".join(fhashes).encode()).hexdigest(),
            }
        return res

    rows = list(docs[["doc_id", "source", "text"]].itertuples(index=False, name=None))
    exp = manifest(rows)
    for shard, e in exp.items():
        got = out.loc[shard]
        assert got["manifest_md5"] == e["manifest_md5"]
        assert (got["n_docs"], got["n_tokens"], got["n_files"], got["n_sources"]) == (
            e["n_docs"],
            e["n_tokens"],
            e["n_files"],
            e["n_sources"],
        )
    # perturbation: removing the first document flips exactly its shard
    dropped = rows[1:]
    exp2 = manifest(dropped)
    victim = int(hashlib.md5(str(rows[0][0]).encode()).hexdigest()[:4], 16) % 8
    assert exp2[victim]["manifest_md5"] != exp[victim]["manifest_md5"]


def test_norm_screen_numpy_replay(catalog, spark):
    """q269 == a numpy replay: 1e-4-grain norm² histogram quartiles at
    rank ceil(N/4)/ceil(3N/4), integer Tukey fences, per-label outlier
    counts."""
    out = _run(catalog, spark, "q269_embedding_norm_screen").set_index("label")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    V = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    n4 = np.round((V * V).sum(axis=1) * 10000).astype(np.int64)
    s = np.sort(n4)
    N = len(s)
    q1 = int(s[(N + 3) // 4 - 1])  # smallest value with cum >= ceil(N/4)
    q3 = int(s[(3 * N + 3) // 4 - 1])
    lo, hi = q1 - (3 * (q3 - q1)) // 2, q3 + (3 * (q3 - q1)) // 2
    assert (out["q1_4"] == q1).all() and (out["q3_4"] == q3).all()
    assert (out["lo4"] == lo).all() and (out["hi4"] == hi).all()
    for label, g in pd.DataFrame({"label": emb["label"], "n4": n4}).groupby("label"):
        got = out.loc[label]
        assert got["n"] == len(g)
        assert got["n_below"] == int((g["n4"] < lo).sum())
        assert got["n_above"] == int((g["n4"] > hi).sum())
        assert got["min_n4"] == int(g["n4"].min())
        assert got["max_n4"] == int(g["n4"].max())
