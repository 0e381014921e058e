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


# --- q295 decision-stump split -----------------------------------------------


def _replay_stump(sf):
    o = pd.read_parquet(f"{sf}/orders.parquet")[["o_totalprice", "o_orderpriority"]]
    import numpy as np

    cents = np.round(o["o_totalprice"] * 100).astype(np.int64)
    y = o["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(np.int64)
    minc, maxc = cents.min(), cents.max()
    bins = (cents - minc) * 256 // (maxc - minc + 1)
    h = (
        pd.DataFrame({"bin": bins, "y": y, "cents": cents})
        .groupby("bin")
        .agg(n=("y", "size"), npos=("y", "sum"), threshold_cents=("cents", "max"))
        .sort_index()
    )
    n_tot, pos_tot = int(h["n"].sum()), int(h["npos"].sum())
    rows = []
    n_l = pos_l = 0
    for b, r in h.iterrows():
        n_l += int(r["n"])
        pos_l += int(r["npos"])
        if n_l >= n_tot:
            continue
        neg_l = n_l - pos_l
        n_r, pos_r = n_tot - n_l, pos_tot - pos_l
        neg_r = n_r - pos_r
        score = (pos_l * pos_l + neg_l * neg_l) * 1_000_000 // n_l + (
            pos_r * pos_r + neg_r * neg_r
        ) * 1_000_000 // n_r
        rows.append((int(b), int(r["threshold_cents"]), n_l, pos_l, n_r, pos_r, score))
    df = pd.DataFrame(
        rows,
        columns=[
            "split_bin",
            "threshold_cents",
            "n_left",
            "pos_left",
            "n_right",
            "pos_right",
            "score_fp",
        ],
    )
    best = df.sort_values(["score_fp", "split_bin"], ascending=[False, True]).iloc[0]
    df["is_best"] = (df["split_bin"] == best["split_bin"]).astype(np.int64)
    df["purity_score"] = df["score_fp"] / 1e6
    return df.drop(columns=["score_fp"]).reset_index(drop=True)


def test_q295_matches_sequential_replay(catalog, spark):
    out = _run(catalog, spark, "q295_decision_stump_split").reset_index(drop=True)
    exp = _replay_stump(SF)
    assert len(out) == len(exp) > 1
    assert (out["is_best"] == 1).sum() == 1
    pd.testing.assert_frame_equal(out, exp[out.columns.tolist()], check_dtype=False)


def test_q295_best_split_beats_all_candidates(catalog, spark):
    """The argmax row's purity must weakly dominate every candidate, and
    strictly dominate any candidate with a smaller bin (tie goes to the
    smallest split_bin)."""
    out = _run(catalog, spark, "q295_decision_stump_split")
    best = out[out["is_best"] == 1].iloc[0]
    assert (out["purity_score"] <= best["purity_score"] + 1e-12).all()
    earlier_ties = out[
        (out["purity_score"] == best["purity_score"])
        & (out["split_bin"] < best["split_bin"])
    ]
    assert earlier_ties.empty


# --- q296 temporal reachability ----------------------------------------------


def _replay_temporal_reach(sf, rounds=4):
    o = pd.read_parquet(f"{sf}/orders.parquet")[["o_orderkey", "o_custkey", "o_orderdate"]]
    li = pd.read_parquet(f"{sf}/lineitem.parquet")[["l_orderkey", "l_suppkey"]]
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    day0 = pd.Timestamp("1992-01-01")
    t = (pd.to_datetime(j["o_orderdate"]) - day0).dt.days.astype("int64")
    e = pd.DataFrame(
        {"u": j["o_custkey"] * 2, "v": j["l_suppkey"] * 2 + 1, "t": t}
    ).drop_duplicates()
    te = pd.concat(
        [e, e.rename(columns={"u": "v", "v": "u"})[["u", "v", "t"]]]
    ).drop_duplicates()
    src = int(te["u"].min())
    arr = {src: 0}
    for _ in range(rounds):
        cur = dict(arr)
        for u, a in cur.items():
            ok = te[(te["u"] == u) & (te["t"] >= a)]
            for v, tt in zip(ok["v"], ok["t"]):
                if v not in arr or tt < arr[v]:
                    arr[v] = int(tt)
    h = pd.DataFrame({"node": list(arr), "arr": list(arr.values())})
    h["bucket"] = h["arr"] // 30
    g = h.groupby("bucket").agg(
        n_nodes=("node", "size"),
        n_customers=("node", lambda s: int((s % 2 == 0).sum())),
        n_suppliers=("node", lambda s: int((s % 2 == 1).sum())),
        min_arrival_day=("arr", "min"),
        max_arrival_day=("arr", "max"),
        min_node=("node", "min"),
        max_node=("node", "max"),
    )
    return g.reset_index().sort_values("bucket").reset_index(drop=True)


def test_q296_matches_sequential_replay(catalog, spark):
    """IMPORTANT caveat replicated on purpose: the python replay relaxes
    IN-PLACE within a round for the frontier dict it iterates (cur is a
    snapshot, so this is the same synchronous schedule as Spark/DuckDB:
    each round reads only the previous round's arrivals)."""
    out = _run(catalog, spark, "q296_temporal_reachability").reset_index(drop=True)
    exp = _replay_temporal_reach(SF)
    assert len(out) == len(exp) > 0
    pd.testing.assert_frame_equal(
        out.astype("int64"), exp[out.columns.tolist()].astype("int64"),
        check_dtype=False,
    )


def test_q296_temporal_never_exceeds_static_reach(catalog, spark):
    """Time-respecting reachability is a subset of static reachability:
    with the same seed and >= as many hops, q147's static BFS must reach
    at least as many nodes as q296 arrives at."""
    out = _run(catalog, spark, "q296_temporal_reachability")
    bfs = _run(catalog, spark, "q147_bfs_reachability")
    # q147 runs 6 hops vs q296's 4 relaxation rounds over the same
    # (u, v) support — static reach (ignoring time) dominates
    assert out["n_nodes"].sum() <= bfs["n_nodes"].sum()


# --- q297 Wasserstein-1 length shift -----------------------------------------


def _replay_w1(sf):
    docs = pd.read_parquet(f"{sf}/documents.parquet")[["source", "text"]]
    docs["ln"] = docs["text"].map(
        lambda t: len([x for x in re.split(r"\s+", t.lower()) if x])
    )
    import numpy as np

    out = []
    srcs = sorted(docs["source"].unique())
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            la = np.sort(docs.loc[docs["source"] == a, "ln"].to_numpy())
            lb = np.sort(docs.loc[docs["source"] == b, "ln"].to_numpy())
            support = np.unique(np.concatenate([la, lb]))
            fa = np.searchsorted(la, support, side="right") / len(la)
            fb = np.searchsorted(lb, support, side="right") / len(lb)
            gaps = np.diff(support)
            w1 = float(np.sum(np.abs(fa[:-1] - fb[:-1]) * gaps))
            out.append((a, b, len(la), len(lb), w1))
    return pd.DataFrame(
        out, columns=["source_a", "source_b", "n_a", "n_b", "w1_tokens"]
    )


def test_q297_matches_numpy_cdf_integral(catalog, spark):
    out = _run(catalog, spark, "q297_wasserstein_length_shift").reset_index(drop=True)
    exp = _replay_w1(SF)
    assert len(out) == len(exp) > 0
    m = out.merge(exp, on=["source_a", "source_b"], suffixes=("", "_exp"))
    assert (m["n_a"] == m["n_a_exp"]).all() and (m["n_b"] == m["n_b_exp"]).all()
    assert (abs(m["w1_tokens"] - m["w1_tokens_exp"]) < 1e-9).all()
    # metric sanity: symmetric support handled, non-negative, and the
    # exact integer numerator reproduces the double
    assert (out["w1_num"] >= 0).all()
    assert (
        abs(out["w1_num"] / (out["n_a"] * out["n_b"]) - out["w1_tokens"]) < 1e-12
    ).all()


def test_q297_triangle_inequality(catalog, spark):
    """W1 is a metric: for every source triple, d(a,c) <= d(a,b)+d(b,c)."""
    out = _run(catalog, spark, "q297_wasserstein_length_shift")
    d = {}
    for r in out.itertuples(index=False):
        d[(r.source_a, r.source_b)] = r.w1_tokens
        d[(r.source_b, r.source_a)] = r.w1_tokens
    srcs = sorted({s for p in d for s in p})
    for a in srcs:
        for b in srcs:
            for c in srcs:
                if len({a, b, c}) == 3:
                    assert d[(a, c)] <= d[(a, b)] + d[(b, c)] + 1e-9


# --- q298 rank-biased overlap --------------------------------------------------


def test_q298_rbo_invariants(catalog, spark):
    """Algebraic invariants of RBO: overlap is non-decreasing in depth
    and bounded by depth; agreement in [0,1]; rbo_cum non-decreasing and
    bounded by the full-weight prefix sum (= value if the two rankings
    were identical); terms reproduce the Python-precomputed weights."""
    out = _run(catalog, spark, "q298_rank_biased_overlap")
    assert len(out) == 50
    ov = out.sort_values("depth")["overlap"].to_numpy()
    assert (ov[1:] >= ov[:-1]).all()
    assert (out["overlap"] <= out["depth"]).all()
    assert ((out["agreement"] >= 0) & (out["agreement"] <= 1)).all()
    rc = out.sort_values("depth")["rbo_cum"].to_numpy()
    assert (rc[1:] >= rc[:-1] - 1e-15).all()
    p = 0.9
    w_fp = [round((1 - p) * p ** (d - 1) / d * 1e15) for d in range(1, 51)]
    perfect = sum(w * d for w, d in zip(w_fp, range(1, 51))) / 1e15
    assert rc[-1] <= perfect + 1e-12
    # per-depth term = w_fp * overlap exactly
    for d, o, t in zip(out["depth"], out["overlap"], out["term"]):
        assert abs(t - w_fp[d - 1] * o / 1e15) < 1e-15


def test_q298_overlap_matches_scorer_prefixes(catalog, spark):
    """Cross-check the overlap column against the two scorers run
    directly with q298's OWN query (r14: _RBO_QUERY_TERMS — the shared
    df-DESC picker made the two top-50s provably disjoint, see the
    constant's comment): for every depth d <= 50, overlap(d) must equal
    |bm_top_d ∩ ql_top_d| recomputed from the independently-ranked
    score frames.  Also pins the liveness the old query lacked: the
    final overlap must be nonzero."""
    from database_migrator_spark.operators.textops import (
        _RBO_QUERY_TERMS,
        _bm25_doc_scores,
        _qld_doc_scores,
    )

    out = _run(catalog, spark, "q298_rank_biased_overlap").sort_values("depth")

    def top50(df):
        pdf = df.toPandas().sort_values(["score", "doc_id"], ascending=[False, True])
        return pdf["doc_id"].tolist()[:50]

    bm = top50(_bm25_doc_scores(spark, SF, _RBO_QUERY_TERMS))
    ql = top50(_qld_doc_scores(spark, SF, _RBO_QUERY_TERMS))
    for d in range(1, 51):
        expected = len(set(bm[:d]) & set(ql[:d]))
        got = int(out.loc[out["depth"] == d, "overlap"].iloc[0])
        assert got == expected, (d, got, expected)
    assert int(out["overlap"].max()) > 0  # the rankers genuinely meet


# --- q299 partition-sizing advisor --------------------------------------------


def test_q299_matches_pandas_width_replay(catalog, spark):
    """Independent width/size replay (q291's convention): rows x
    [8 B/numeric + ceil(avg string width)], then the ceil-division and
    power-of-two ladder in pure python."""
    out = _run(catalog, spark, "q299_partition_sizing_advisor").set_index("tbl")
    import math

    specs = {
        "documents": (2, ["text", "lang", "source"]),
        "events": (4, ["event_type", "props"]),
        "lineitem": (9, ["l_returnflag", "l_linestatus"]),
        "orders": (4, ["o_orderstatus", "o_orderpriority"]),
    }
    target, slots = 128 * 1024 * 1024, 64
    ladder = [16, 32, 64, 128, 256, 512, 1024]
    for tbl, (n_num, strs) in specs.items():
        df = pd.read_parquet(f"{SF}/{tbl}.parquet", columns=strs)
        width = 8 * n_num + math.ceil(
            sum(df[c].str.len().sum() for c in strs) / len(df)
        )
        est = len(df) * width
        row = out.loc[tbl]
        assert row["n_rows"] == len(df)
        assert row["row_bytes"] == width
        assert row["est_bytes"] == est
        rec = max(32, -(-est // target))
        assert row["rec_shuffle_partitions"] == rec
        assert row["rows_per_partition"] == len(df) // rec
        chunk = -(-est // slots)
        mpb = next(
            (m * 1024 * 1024 for m in ladder if chunk <= m * 1024 * 1024),
            ladder[-1] * 1024 * 1024,
        )
        assert row["rec_max_partition_bytes"] == mpb


# --- q300 k-center coreset ----------------------------------------------------


def _replay_kcenter(sf, k=6):
    import numpy as np

    df = pd.read_parquet(f"{sf}/embeddings.parquet")[["vec_id", "embedding"]]
    ids = df["vec_id"].to_numpy()
    E = np.rint(np.stack(df["embedding"].to_numpy()).astype(np.float64) * 1e6).astype(
        np.int64
    )
    order = np.argsort(ids)
    ids, E = ids[order], E[order]
    centers, radii = [int(ids[0])], []
    mind = ((E - E[0]) ** 2).sum(axis=1)
    radii.append(int(mind.max()))
    for _ in range(k - 1):
        # argmax of (mind, then smallest vec_id): ids sorted asc, so the
        # FIRST index attaining the max is the tie-winner
        j = int(np.argmax(mind))
        centers.append(int(ids[j]))
        mind = np.minimum(mind, ((E - E[j]) ** 2).sum(axis=1))
        radii.append(int(mind.max()))
    return centers, radii


def test_q300_matches_numpy_greedy_replay(catalog, spark):
    out = _run(catalog, spark, "q300_kcenter_coreset").sort_values("round")
    centers, radii = _replay_kcenter(SF)
    assert out["center_vec_id"].tolist() == centers
    assert out["radius_sq_fp"].tolist() == radii
    # 2-approx invariant surface: radii are monotonically non-increasing,
    # and the reported double is the exact fp/1e12
    r = out["radius_sq_fp"].to_numpy()
    assert (r[1:] <= r[:-1]).all()
    assert (abs(out["radius_sq"] - out["radius_sq_fp"] / 1e12) < 1e-12).all()


def test_q300_selected_centers_are_pairwise_farther_than_final_radius(catalog, spark):
    """Gonzalez guarantee: every pair of selected centers is separated by
    at least the final covering radius (each new center was, at selection
    time, at distance >= the then-radius from ALL earlier centers, and
    radii only shrink)."""
    import numpy as np

    out = _run(catalog, spark, "q300_kcenter_coreset").sort_values("round")
    df = pd.read_parquet(f"{SF}/embeddings.parquet").set_index("vec_id")
    E = {
        int(v): np.rint(np.asarray(df.loc[v, "embedding"], dtype=np.float64) * 1e6).astype(np.int64)
        for v in out["center_vec_id"]
    }
    final_r = int(out["radius_sq_fp"].iloc[-1])
    cs = out["center_vec_id"].tolist()
    for i, a in enumerate(cs):
        for b in cs[i + 1 :]:
            assert int(((E[a] - E[b]) ** 2).sum()) >= final_r


# --- q301 capture-recapture coverage ------------------------------------------


def test_q301_matches_detector_composition(catalog, spark):
    """Replay the audit from the registry's OWN detector outputs: A =
    q234's verified pairs; B = q238's Hamming pairs re-verified with the
    exact 5i>=3u Jaccard check in python; Chapman/coverage in exact
    integer arithmetic."""
    out = _run(catalog, spark, "q301_capture_recapture_dedup").iloc[0]
    A = set(
        map(
            tuple,
            _run(catalog, spark, "q234_minhash_lsh_portable")[["a_id", "b_id"]].to_numpy(),
        )
    )
    sim = _run(catalog, spark, "q238_simhash_hamming_portable")[["a_id", "b_id"]]
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]

    def shset(text):
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        if len(toks) >= 3:
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        return {" ".join(toks)}

    sh = {d: shset(t) for d, t in docs.itertuples(index=False)}
    B = set()
    for a, b in sim.to_numpy():
        i = len(sh[a] & sh[b])
        u = len(sh[a] | sh[b])
        if 5 * i >= 3 * u:
            B.add((a, b))
    na, nb, m = len(A), len(B), len(A & B)
    assert out["n_minhash"] == na
    assert out["n_simhash"] == nb
    assert out["n_both"] == m
    assert out["n_union"] == na + nb - m
    chapman_fp = (na + 1) * (nb + 1) * 1_000_000 // (m + 1) - 1_000_000
    assert out["chapman_fp"] == chapman_fp
    assert out["minhash_coverage_ub_ppm"] == na * 1_000_000_000_000 // chapman_fp
    assert out["simhash_coverage_ub_ppm"] == nb * 1_000_000_000_000 // chapman_fp
    # estimator sanity: N-hat >= the union actually observed... not always
    # true for Chapman at tiny m, but coverage must be a valid fraction
    assert 0 < out["minhash_coverage_ub_ppm"] <= 1_000_000
    assert 0 < out["simhash_coverage_ub_ppm"] <= 1_000_000


# --- q302 Neyman allocation ----------------------------------------------------


def test_q302_matches_numpy_replay_and_sums_to_budget(catalog, spark):
    import math

    import numpy as np

    out = _run(catalog, spark, "q302_neyman_allocation").set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["source", "n_chars"]]
    B = 1000
    ws = {}
    for src, g in docs.groupby("source"):
        x = g["n_chars"].to_numpy(dtype=np.int64)
        n = len(x)
        if n < 2:
            continue
        var = (n * int((x.astype(object) ** 2).sum()) - int(x.sum()) ** 2) / (
            n * (n - 1)
        )
        sdev = math.sqrt(var)
        ws[src] = (n, sdev, round(n * sdev * 1e6))
    wt = sum(w for _, _, w in ws.values())
    nt = sum(n for n, _, _ in ws.values())
    quotas = {
        src: (B * w // wt, B * w % wt, B * n // nt) for src, (n, _, w) in ws.items()
    }
    leftover = B - sum(b for b, _, _ in quotas.values())
    order = sorted(quotas, key=lambda s: (-quotas[s][1], s))
    alloc = {
        s: quotas[s][0] + (1 if i < leftover else 0) for i, s in enumerate(order)
    }
    for src, (n, sdev, w) in ws.items():
        row = out.loc[src]
        assert row["n_docs"] == n
        assert abs(row["stddev_chars"] - sdev) < 1e-9
        assert row["neyman_weight_fp"] == w
        assert row["neyman_alloc"] == alloc[src]
        assert row["proportional_floor"] == quotas[src][2]
    # the whole point: the allocation hits the budget EXACTLY
    assert out["neyman_alloc"].sum() == B


# --- q303 audio ZCR + voicing --------------------------------------------------


def test_q303_matches_bytewise_wav_replay(catalog, spark):
    """Independent replay that goes through the BYTES, not the closed
    form: synthesize the same WAVs the Spark side decodes, parse them
    with the struct module here, and recompute ZCR/voicing."""
    import struct

    from database_migrator_spark.operators.multimodal import (
        AUDIO_ACTIVE_ENERGY,
        AUDIO_ZCR_VOICED_MAX,
        attach_wav_audio,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").limit(50)
    wavs = attach_wav_audio(d).toPandas()
    out = (
        _run(catalog, spark, "q303_audio_zcr_voicing")
        .set_index("doc_id")
        .to_dict("index")
    )
    checked = 0
    for doc_id, blob in zip(wavs["doc_id"], wavs["audio"]):
        raw = bytes(blob)
        assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
        # data chunk: locate 'data', then int16 LE samples
        k = raw.index(b"data")
        n = struct.unpack("<I", raw[k + 4 : k + 8])[0] // 2
        samples = struct.unpack(f"<{n}h", raw[k + 8 : k + 8 + 2 * n])
        nf = n // 16
        zcrs, energies = [], []
        for f in range(nf):
            w = samples[f * 16 : (f + 1) * 16]
            zcrs.append(sum(1 for a, b in zip(w, w[1:]) if (a < 0) != (b < 0)))
            energies.append(sum(s * s for s in w))
        row = out[doc_id]
        assert row["n_frames"] == nf
        assert row["total_crossings"] == sum(zcrs)
        assert row["max_zcr"] == max(zcrs)
        assert row["max_zcr_frame"] == zcrs.index(max(zcrs))
        assert row["voiced_frames"] == sum(
            1
            for z, e in zip(zcrs, energies)
            if e >= AUDIO_ACTIVE_ENERGY and z <= AUDIO_ZCR_VOICED_MAX
        )
        checked += 1
    assert checked == 50


# --- q304 decile mobility matrix ------------------------------------------------


def test_q304_matches_pandas_ntile_replay(catalog, spark):
    import numpy as np

    out = _run(catalog, spark, "q304_decile_mobility_matrix")
    o = pd.read_parquet(f"{SF}/orders.parquet")[
        ["o_custkey", "o_totalprice", "o_orderdate"]
    ]
    o["spend"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    o["yr"] = pd.to_datetime(o["o_orderdate"]).dt.year

    def deciles(mask):
        s = o[mask].groupby("o_custkey")["spend"].sum().reset_index()
        s = s.sort_values(["spend", "o_custkey"]).reset_index(drop=True)
        n = len(s)
        qq, rr = divmod(n, 10)
        r0 = np.arange(n)
        d = np.where(
            r0 < (qq + 1) * rr, r0 // (qq + 1) + 1, rr + (r0 - (qq + 1) * rr) // qq + 1
        )
        return dict(zip(s["o_custkey"], d))

    from database_migrator_spark.operators.relational_ext import (
        _MOBILITY_SPLIT_YEAR,
    )

    d1 = deciles(o["yr"] <= _MOBILITY_SPLIT_YEAR)
    d2 = deciles(o["yr"] > _MOBILITY_SPLIT_YEAR)
    # the split must actually split (the r13 verdict: 1994 predated the
    # 1995-2001 orders, both replays were empty, and this test passed
    # VACUOUSLY — assert the periods are populated before comparing)
    assert d1 and d2 and (set(d1) & set(d2))
    from collections import Counter

    m = Counter((d1[c], d2[c]) for c in set(d1) & set(d2))
    exp = pd.DataFrame(
        [(a, b, n) for (a, b), n in m.items()],
        columns=["decile_from", "decile_to", "n_customers"],
    ).sort_values(["decile_from", "decile_to"]).reset_index(drop=True)
    got = out[["decile_from", "decile_to", "n_customers"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
    # row shares sum to 1 per from-decile
    sums = out.groupby("decile_from")["row_share"].sum()
    assert (abs(sums - 1.0) < 1e-9).all()


# --- q305 difference-in-differences ---------------------------------------------


def test_q305_matches_pandas_panel_replay(catalog, spark):
    out = _run(catalog, spark, "q305_difference_in_differences").iloc[0]
    from database_migrator_spark.sources import table as _table

    e = _table(spark, SF, "events").toPandas()
    e["post"] = (pd.to_datetime(e["ts"]).dt.day > 15).astype(int)
    e["d"] = pd.to_datetime(e["ts"]).dt.date
    pre_clicks = (
        e[(e["event_type"] == "click") & (pd.to_datetime(e["ts"]).dt.day <= 15)]
        .groupby("user_id")
        .size()
    )
    treat = (
        e.groupby("user_id")
        .size()
        .index.to_series()
        .map(lambda u: int(pre_clicks.get(u, 0) >= 7))
    )
    ud = (
        e.assign(y=(e["event_type"] == "purchase").astype(int))
        .groupby(["user_id", "post", "d"])["y"]
        .max()
        .reset_index()
    )
    ud["treat"] = ud["user_id"].map(treat)
    cells = ud.groupby(["treat", "post"]).agg(
        n=("y", "size"), y=("y", "sum")
    )
    for (t, p, dcol, ycol) in [
        (1, 0, "treat_pre_days", "treat_pre_purchases"),
        (1, 1, "treat_post_days", "treat_post_purchases"),
        (0, 0, "ctrl_pre_days", "ctrl_pre_purchases"),
        (0, 1, "ctrl_post_days", "ctrl_post_purchases"),
    ]:
        assert out[dcol] == cells.loc[(t, p), "n"]
        assert out[ycol] == cells.loc[(t, p), "y"]
    r = lambda t, p: cells.loc[(t, p), "y"] / cells.loc[(t, p), "n"]  # noqa: E731
    did = (r(1, 1) - r(1, 0)) - (r(0, 1) - r(0, 0))
    assert abs(out["did"] - did) < 1e-12
