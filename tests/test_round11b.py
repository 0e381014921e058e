"""Known-truth tests for the round-11 wave-4 additions (q270-q273) —
each query also carries a DuckDB hash oracle in the registry; these pin
the SEMANTICS against an independent numpy/pandas replay or an algebraic
invariant, the same belt-and-suspenders the earlier families carry."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from database_migrator_spark.plans.registry import all_queries

SF = "/root/testdata/sf0.001"
SF1 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def catalog():
    return all_queries()


def _run(catalog, spark, name, sf=SF):
    return catalog[name].build(spark, sf).toPandas()


# --- q270 skyline ------------------------------------------------------------


def _part_points(sf):
    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    ext_c = np.round(li["l_extendedprice"] * 100).astype(np.int64)
    qty_c = np.round(li["l_quantity"] * 100).astype(np.int64)
    g = pd.DataFrame(
        {"k": li["l_partkey"], "ext_c": ext_c, "qty_c": qty_c}
    ).groupby("k", as_index=False).sum()
    g["price_fp"] = (g["ext_c"] * 10000) // g["qty_c"]
    return g


def test_skyline_matches_brute_force_dominance(catalog, spark):
    """q270's two-level prefix-max formulation == the O(N²) definition:
    a part is on the skyline iff no other part has price ≤ AND qty ≥
    with at least one strict."""
    g = _part_points(SF)
    pts = g[["k", "price_fp", "qty_c"]].to_numpy()
    keep = []
    for i in range(len(pts)):
        ki, pi, qi = pts[i]
        dominated = any(
            (pj <= pi and qj >= qi and (pj < pi or qj > qi))
            for kj, pj, qj in pts
            if kj != ki
        )
        if not dominated:
            keep.append((pi, ki))
    keep.sort()
    out = _run(catalog, spark, "q270_pareto_skyline_parts")
    assert list(out["part_key"]) == [k for _, k in keep]


def test_skyline_is_strictly_monotone(catalog, spark):
    """Along the price-sorted skyline quantity must strictly INCREASE —
    a more expensive point with no more quantity would be dominated by
    the cheaper one. (Exception: exact (price, qty) duplicates are
    mutually non-dominating and both stay.)"""
    out = _run(catalog, spark, "q270_pareto_skyline_parts", SF1)
    qty = out["total_qty"].to_numpy()
    price = out["unit_price"].to_numpy()
    for dp, dq in zip(np.diff(price), np.diff(qty)):
        assert (dp == 0 and dq == 0) or (dp > 0 and dq > 0)


# --- q271 incremental join-view maintenance ----------------------------------


def test_ivm_refresh_equals_full_recompute(catalog, spark):
    """base(O_old⋈L_old) + the three delta terms == the view recomputed
    from scratch in pandas (exact integer cents on both sides)."""
    out = _run(catalog, spark, "q271_join_view_delta_refresh").set_index("segment")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
        c, left_on="o_custkey", right_on="c_custkey"
    )
    # HALF_UP like Spark round()/DuckDB ROUND() — np.round is half-to-even
    # and disagrees on products landing exactly on .5
    rev_c = np.floor(
        j["l_extendedprice"] * (1 - j["l_discount"]) * 100 + 0.5
    ).astype(np.int64)
    full = (
        pd.DataFrame({"segment": j["c_mktsegment"], "rev_c": rev_c})
        .groupby("segment")
        .agg(n_lines=("rev_c", "size"), cents=("rev_c", "sum"))
    )
    assert dict(out["n_lines"]) == dict(full["n_lines"])
    got_cents = (out["revenue"] * 100).round().astype(np.int64)
    assert dict(got_cents) == dict(full["cents"])


def test_ivm_delta_split_partitions_the_lines(spark):
    """The four (old/new × old/new) terms partition the joined line set:
    their counts sum to the full join's count and no line is in two."""
    from database_migrator_spark.operators.etl import _IVM_CUTOFF

    o = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    cut = pd.Timestamp(_IVM_CUTOFF)
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    oo = j["o_orderdate"] < cut
    lo = j["l_shipdate"] < cut
    n = len(j)
    assert (oo & lo).sum() + (~oo & lo).sum() + (oo & ~lo).sum() + (
        ~oo & ~lo
    ).sum() == n


# --- q272 label propagation ---------------------------------------------------


def _lpa_replay(sf, rounds=4):
    o = pd.read_parquet(f"{sf}/orders.parquet")  # noqa: F841  (edges need only lineitem)
    li = pd.read_parquet(f"{sf}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    j = li.merge(li, on="l_orderkey")
    j = j[j["l_partkey_x"] < j["l_partkey_y"]]
    e = j[["l_partkey_x", "l_partkey_y"]].drop_duplicates().to_numpy()
    und = np.concatenate([e, e[:, ::-1]])
    labels = {int(u): int(u) for u in np.unique(und)}
    for _ in range(rounds):
        new = {}
        nb: dict[int, dict[int, int]] = {}
        for u, v in und:
            nb.setdefault(int(u), {})
            lab = labels[int(v)]
            nb[int(u)][lab] = nb[int(u)].get(lab, 0) + 1
        for u, counts in nb.items():
            best = min(((-c, lab) for lab, c in counts.items()))
            new[u] = best[1]
        labels = new
    return labels


def test_lpa_matches_python_replay(catalog, spark):
    """q272 after 4 synchronous rounds == a dict-based python LPA with the
    same most-frequent-then-smallest tie-break."""
    labels = _lpa_replay(SF)
    sizes: dict[int, int] = {}
    for lab in labels.values():
        sizes[lab] = sizes.get(lab, 0) + 1
    expected = sorted(((n, c) for c, n in sizes.items()), key=lambda t: (-t[0], t[1]))
    out = _run(catalog, spark, "q272_label_propagation_communities")
    got = list(zip(out["n_nodes"], out["community"]))
    assert got == expected


def test_lpa_labels_are_member_node_ids(catalog, spark):
    """Every community label must be the id of some graph node (labels
    only ever copy existing labels, which start as node ids)."""
    out = _run(catalog, spark, "q272_label_propagation_communities", SF1)
    li = pd.read_parquet(f"{SF1}/lineitem.parquet")
    parts = set(li["l_partkey"].unique())
    assert set(out["community"]) <= parts
    assert out["n_nodes"].sum() <= len(parts)


# --- q273 split conformal ------------------------------------------------------


def _conformal_replay(sf):
    o = pd.read_parquet(f"{sf}/orders.parquet")
    c = pd.read_parquet(f"{sf}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    h2 = j["o_orderkey"].map(
        lambda k: hashlib.md5(str(int(k)).encode()).hexdigest()[:2]
    )
    price_c = np.round(j["o_totalprice"] * 100).astype(np.int64)
    df = pd.DataFrame(
        {
            "seg": j["c_mktsegment"],
            "key": j["o_orderkey"],
            "price_c": price_c,
            "h2": h2,
        }
    )
    rows = []
    for seg, g in df.groupby("seg"):
        tr = g[g["h2"] < "9a"]
        ca = g[(g["h2"] >= "9a") & (g["h2"] < "cd")].copy()
        te = g[g["h2"] >= "cd"]
        mu_fp = (int(tr["price_c"].sum()) * 10000) // len(tr)
        ca["s"] = (ca["price_c"] * 10000 - mu_fp).abs()
        k = (9 * (len(ca) + 1) + 9) // 10
        qhat = int(ca.sort_values(["s", "key"])["s"].iloc[k - 1])
        covered = int(((te["price_c"] * 10000 - mu_fp).abs() <= qhat).sum())
        rows.append((seg, len(tr), len(ca), len(te), k, qhat, covered))
    return {r[0]: r[1:] for r in rows}

def test_conformal_matches_python_replay(catalog, spark):
    exp = _conformal_replay(SF)
    out = _run(catalog, spark, "q273_split_conformal_coverage")
    for _, r in out.iterrows():
        n_train, n_calib, n_test, k, qhat_fp, covered = exp[r["segment"]]
        assert r["n_train"] == n_train and r["n_calib"] == n_calib
        assert r["n_test"] == n_test and r["k"] == k
        assert round(r["qhat"] * 1e6) == qhat_fp
        assert r["n_covered"] == covered


def test_conformal_coverage_near_nominal(catalog, spark):
    """The finite-sample guarantee: on exchangeable data expected coverage
    is ≥ 0.9 (and ≤ 0.9 + 1/(n_calib+1)); at sf0.01 every segment should
    land within a few points of nominal."""
    out = _run(catalog, spark, "q273_split_conformal_coverage", SF1)
    assert ((out["coverage"] - 0.9).abs() < 0.05).all()


# --- q274 postings ------------------------------------------------------------


def _varint_bytes(g):
    return 1 if g < 128 else 2 if g < 16384 else 3 if g < 2097152 else 4 if g < 268435456 else 5


def test_postings_match_python_replay_and_decode_losslessly(catalog, spark):
    """q274 == a python per-shard postings build; decoding the gap lists
    reconstructs the exact doc-id sets (losslessness of delta coding)."""
    out = _run(catalog, spark, "q274_postings_delta_index").set_index("term")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    post: dict[str, set[int]] = {}
    tf: dict[str, int] = {}
    for _, r in docs.iterrows():
        toks = [t for t in r["text"].lower().split() if t]
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        for t in set(toks):
            post.setdefault(t, set()).add(int(r["doc_id"]))
    for term, ids in post.items():
        shards: dict[int, list[int]] = {}
        for d in sorted(ids):
            shards.setdefault(d // 256, []).append(d)
        nbytes, fps = 0, []
        for sh in sorted(shards):
            prev = sh * 256
            gaps = []
            for d in shards[sh]:
                gaps.append(d - prev)
                prev = d
            # decode check
            pos, rec = sh * 256, []
            for g in gaps:
                pos += g
                rec.append(pos)
            assert rec == shards[sh]
            nbytes += sum(_varint_bytes(g) for g in gaps)
            fps.append(hashlib.md5(",".join(map(str, gaps)).encode()).hexdigest())
        r = out.loc[term]
        assert r["df"] == len(ids) and r["tf_total"] == tf[term]
        assert r["n_shards"] == len(shards) and r["bytes_varint"] == nbytes
        assert r["postings_md5"] == hashlib.md5(",".join(fps).encode()).hexdigest()


# --- q275 wordpiece -----------------------------------------------------------


def _wp_vocab(sf, v=100, lmax=4):
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    cnt: dict[str, int] = {}
    for t in (
        tok for txt in docs["text"] for tok in txt.lower().split() if tok
    ):
        cnt[t] = cnt.get(t, 0) + 1
    wt: dict[str, int] = {}
    for w, c in cnt.items():
        for p in range(len(w)):
            for l in range(1, lmax + 1):
                if p + l <= len(w):
                    g = w[p : p + l]
                    wt[g] = wt.get(g, 0) + c
    return {g for g, _ in sorted(wt.items(), key=lambda kv: (-kv[1], kv[0]))[:v]}


def test_wordpiece_matches_python_greedy(catalog, spark):
    vocab = _wp_vocab(SF)
    parts = pd.read_parquet(f"{SF}/part.parquet")
    words: dict[str, int] = {}
    for nm in parts["p_name"]:
        for w in nm.lower().split(" "):
            words[w] = words.get(w, 0) + 1
    out = _run(catalog, spark, "q275_wordpiece_greedy_tokenize").set_index("word")
    assert set(out.index) == set(words)
    for w, occ in words.items():
        pos, n_tok, n_unk = 0, 0, 0
        while pos < len(w):
            for l in (4, 3, 2, 1):
                if w[pos : pos + l] in vocab and pos + l <= len(w):
                    pos, n_tok = pos + l, n_tok + 1
                    break
            else:
                pos, n_tok, n_unk = pos + 1, n_tok + 1, n_unk + 1
        r = out.loc[w]
        assert (r["occurrences"], r["n_tokens"], r["n_unk"]) == (occ, n_tok, n_unk), w


# --- q276 power iteration -----------------------------------------------------


def test_power_step_matches_numpy(catalog, spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    V = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    x = V * 1e4
    v4 = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)  # half away
    dot = v4.sum(axis=1)
    y_fp = (v4 * dot[:, None]).sum(axis=0)
    s4 = v4.sum(axis=0)
    out = _run(catalog, spark, "q276_power_iteration_step")
    assert np.array_equal(out["s4"].to_numpy(), s4)
    got_fp = np.round(out["y"].to_numpy() * 1e8).astype(np.int64)
    assert np.array_equal(got_fp, y_fp)
    assert out["y_unit"].abs().max() == 1.0


# --- q277 zone maps -----------------------------------------------------------


def test_zonemap_clustered_layout_is_exact(catalog, spark):
    """Month partitions must never scan waste for month predicates
    (each predicate hits exactly its own file), while the arrival
    layout scans nearly everything."""
    out = _run(catalog, spark, "q277_zone_map_prunability", SF1)
    cl = out[out["layout"] == "clustered"]
    assert (cl["files_hit"] == 1).all()
    assert (cl["waste_ratio"] == 0.0).all()
    ar = out[out["layout"] == "arrival"]
    assert (ar["rows_scanned"] >= ar["true_rows"]).all()
    assert ar["waste_ratio"].mean() > 0.5  # insertion order can't skip


def test_zonemap_scan_is_sound(catalog, spark):
    """Soundness of pruning: a zone-map scan may read too much but never
    too little — rows_scanned >= true_rows for every (layout, month)."""
    out = _run(catalog, spark, "q277_zone_map_prunability")
    assert (out["rows_scanned"] >= out["true_rows"]).all()
    m = pd.read_parquet(f"{SF}/lineitem.parquet")["l_shipdate"].dt.strftime("%Y-%m")
    truth = m.value_counts()
    for _, r in out.iterrows():
        assert r["true_rows"] == truth[r["month"]]


# --- q278 feature hashing -----------------------------------------------------


def test_feature_hash_matches_python(catalog, spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    tf: dict[str, int] = {}
    for txt in docs["text"]:
        toks = [t for t in txt.lower().split() if t]
        for a, b in zip(toks, toks[1:]):
            tf[f"{a}_{b}"] = tf.get(f"{a}_{b}", 0) + 1
    per: dict[int, list[int]] = {}
    for bg, c in tf.items():
        b = int(hashlib.md5(bg.encode()).hexdigest()[:4], 16) % 256
        per.setdefault(b, []).append(c)
    out = _run(catalog, spark, "q278_feature_hash_collisions").set_index("bucket")
    assert set(out.index) == set(per)
    for b, cs in per.items():
        r = out.loc[b]
        assert r["n_types"] == len(cs) and r["total_tf"] == sum(cs)
        assert r["dominant_tf"] == max(cs)


# --- q279 MAD -----------------------------------------------------------------


def test_mad_matches_python_order_statistics(catalog, spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    j["cents"] = np.round(j["o_totalprice"] * 100).astype(np.int64)
    out = _run(catalog, spark, "q279_mad_robust_screen").set_index("nation")
    for nat, g in j.groupby("n_name"):
        v = np.sort(g["cents"].to_numpy())
        k = (len(v) + 1) // 2
        med = int(v[k - 1])  # exact lower median
        dev = np.sort(np.abs(g["cents"].to_numpy() - med))
        mad = int(dev[k - 1])
        outliers = int((np.abs(g["cents"] - med) > 2 * mad).sum())
        r = out.loc[nat]
        assert round(r["median_value"] * 100) == med
        assert round(r["mad_value"] * 100) == mad
        assert r["n_outliers"] == outliers and r["n_orders"] == len(v)


# --- q280 streaks -------------------------------------------------------------


def test_streaks_match_python_replay(catalog, spark):
    e = pd.read_parquet(f"{SF}/events.parquet")
    days = (
        pd.DataFrame(
            {
                "u": e["user_id"],
                "d": (e["ts"].dt.tz_localize(None).dt.normalize()
                      - pd.Timestamp("1970-01-01")).dt.days,
            }
        )
        .drop_duplicates()
        .sort_values(["u", "d"])
    )
    hist: dict[int, list] = {}
    for u, g in days.groupby("u"):
        d = g["d"].to_numpy()
        breaks = np.where(np.diff(d) > 1)[0]
        lens = np.diff(np.concatenate([[-1], breaks, [len(d) - 1]]))
        hist.setdefault(int(lens.max()), []).append((len(lens), len(d)))
    out = _run(catalog, spark, "q280_activity_streaks").set_index("max_streak")
    assert set(out.index) == set(hist)
    for ms, entries in hist.items():
        r = out.loc[ms]
        assert r["n_users"] == len(entries)
        assert r["n_islands"] == sum(i for i, _ in entries)
        assert r["n_active_days"] == sum(d for _, d in entries)


# --- q281 lateness ------------------------------------------------------------


def test_lateness_matches_python_replay(catalog, spark):
    from database_migrator_spark.operators.temporal import _LATE_JITTER_US

    e = pd.read_parquet(f"{SF}/events.parquet")
    ts = e["ts"]
    if ts.dt.tz is not None:
        ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
    tus = (ts - pd.Timestamp("1970-01-01")).dt.total_seconds().mul(1e6).round().astype(np.int64)
    jit = e["event_id"].map(
        lambda k: int(hashlib.md5(str(int(k)).encode()).hexdigest()[:8], 16)
        % _LATE_JITTER_US
    )
    df = pd.DataFrame({"eid": e["event_id"], "tus": tus, "atus": tus + jit})
    df = df.sort_values(["atus", "eid"]).reset_index(drop=True)
    seen = df["tus"].cummax().shift(1)
    lus = np.maximum(0, (seen - df["tus"]).fillna(0)).astype(np.int64)
    classes = np.select(
        [lus == 0, lus <= 1_000_000, lus <= 10_000_000, lus <= 60_000_000,
         lus <= 600_000_000],
        [0, 1, 2, 3, 4], default=5,
    )
    out = _run(catalog, spark, "q281_watermark_lateness_audit").set_index(
        "lateness_class"
    )
    for cl in np.unique(classes):
        sel = lus[classes == cl]
        r = out.loc[cl]
        assert r["n_events"] == len(sel)
        assert round(r["max_lateness_sec"] * 1e6) == sel.max()
    assert out["n_events"].sum() == len(df)


def test_lateness_bounded_by_jitter(catalog, spark):
    """No arrival can be later than the max simulated delivery delay."""
    from database_migrator_spark.operators.temporal import _LATE_JITTER_US

    out = _run(catalog, spark, "q281_watermark_lateness_audit", SF1)
    assert (out["max_lateness_sec"] <= _LATE_JITTER_US / 1e6).all()


# --- q282 bin packing ---------------------------------------------------------


def test_ffd_matches_python_and_respects_capacity(catalog, spark):
    from database_migrator_spark.operators.etl import _PACK_CAP, _PACK_FILE_DOCS

    docs = pd.read_parquet(f"{SF1}/documents.parquet")
    sizes = (
        docs.assign(f=docs["doc_id"] // _PACK_FILE_DOCS)
        .groupby("f")["n_chars"]
        .sum()
        .reset_index()
        .to_numpy()
    )
    order = sorted(sizes.tolist(), key=lambda t: (-t[1], t[0]))
    loads, nfs = [], []
    for _, sz in order:
        for i, l in enumerate(loads):
            if l + sz <= _PACK_CAP:
                loads[i] += sz
                nfs[i] += 1
                break
        else:
            loads.append(int(sz))
            nfs.append(1)
    out = _run(catalog, spark, "q282_compaction_bin_packing", SF1)
    assert list(out["load"]) == loads and list(out["n_files"]) == nfs
    assert (out["load"] <= _PACK_CAP).all()
    total = sum(sz for _, sz in order)
    assert out["lb_bins"].iloc[0] == -(-total // _PACK_CAP)
    assert out["n_bins"].iloc[0] >= out["lb_bins"].iloc[0]


# --- q283 selectivity ---------------------------------------------------------


def test_selectivity_estimates_match_python(catalog, spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    s = o["o_orderstatus"]
    p = o["o_orderpriority"]
    y = o["o_orderdate"].dt.year.astype(str)
    n = len(o)
    out = _run(catalog, spark, "q283_selectivity_independence")
    df = pd.DataFrame({"s": s, "p": p, "y": y})
    cols = {"status_x_priority": ("s", "p"), "status_x_year": ("s", "y"),
            "priority_x_year": ("p", "y")}
    for _, r in out.iterrows():
        ca, cb = cols[r["pred_kind"]]
        est = (int((df[ca] == r["a"]).sum()) * int((df[cb] == r["b"]).sum())) // n
        act = int(((df[ca] == r["a"]) & (df[cb] == r["b"])).sum())
        assert r["est_rows"] == est and r["actual_rows"] == act
        qe = max(est, act, 1) / min(max(est, 1), max(act, 1))
        assert abs(r["q_error"] - qe) < 1e-12


# --- q284 recall curve --------------------------------------------------------


def test_recall_curve_monotone_and_exact_at_full_probe(catalog, spark):
    out = _run(catalog, spark, "q284_ivf_recall_curve", SF1).sort_values("nprobe")
    assert out["nprobe"].tolist() == [1, 2, 4, 8, 16]
    assert (np.diff(out["mean_recall"]) >= 0).all()  # more cells, never worse
    assert (np.diff(out["n_scanned"]) > 0).all()
    assert out.iloc[-1]["mean_recall"] == 1.0  # L=16 is brute force


def test_recall_curve_matches_numpy_brute_force(catalog, spark):
    from database_migrator_spark.operators.similarity import (
        FIXED_IVF_CENTROIDS,
        _RECALL_K,
        _RECALL_LEVELS,
        _RECALL_QUERIES,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    ids = emb["vec_id"].to_numpy()
    V = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    C = np.asarray(FIXED_IVF_CENTROIDS, dtype=np.float64)
    assign = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    hits = {L: 0 for L in _RECALL_LEVELS}
    for qi in range(_RECALL_QUERIES):
        q = V[ids == qi][0]
        cr = np.argsort(((C - q) ** 2).sum(axis=1), kind="stable")  # cell ranks
        cell_rank = {c: r + 1 for r, c in enumerate(cr)}
        d2 = ((V - q) ** 2).sum(axis=1)
        mask_q = ids != qi
        order = np.lexsort((ids[mask_q], d2[mask_q]))
        cand_ids = ids[mask_q][order]
        cand_cells = assign[mask_q][order]
        truth = set(cand_ids[:_RECALL_K])
        for L in _RECALL_LEVELS:
            sel = [v for v, c in zip(cand_ids, cand_cells) if cell_rank[c] <= L]
            hits[L] += len(truth & set(sel[:_RECALL_K]))
    out = _run(catalog, spark, "q284_ivf_recall_curve").set_index("nprobe")
    for L in _RECALL_LEVELS:
        assert out.loc[L]["hits"] == hits[L], L


# --- q285 encoding advisor ----------------------------------------------------


def test_encoding_advisor_matches_python(catalog, spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    out = _run(catalog, spark, "q285_encoding_advisor").set_index("col")
    import math

    for col, series in {
        "o_orderstatus": o["o_orderstatus"].astype(str),
        "o_orderpriority": o["o_orderpriority"].astype(str),
        "o_custkey": o["o_custkey"].astype(str),
        "o_orderkey": o["o_orderkey"].astype(str),
    }.items():
        plain = int(series.str.len().sum())
        d = series.nunique()
        dict_bytes = int(
            series.drop_duplicates().str.len().sum()
        ) + len(series) * math.ceil(math.log2(max(d, 2)) / 8)
        r = out.loc[col]
        assert r["plain_bytes"] == plain and r["n_distinct"] == d
        assert r["dict_bytes"] == dict_bytes
        assert r["advice"] == ("dictionary" if dict_bytes < plain else "plain")


# --- q286 bloom pruning -------------------------------------------------------


def test_bloom_pruning_no_false_negatives_and_monotone(catalog, spark):
    out = _run(catalog, spark, "q286_bloom_join_pruning", SF1).sort_values("m_bits")
    # every true key must pass at every size (no false negatives)
    assert (out["keys_pass"] >= out["keys_true"]).all()
    assert (out["rows_scanned"] >= out["rows_matched"]).all()
    # larger filters never pass more keys
    assert (np.diff(out["keys_pass"]) <= 0).all()
    assert (np.diff(out["key_fp_rate"]) <= 0).all()


def test_bloom_pruning_matches_python(catalog, spark):
    from database_migrator_spark.operators.skew import _BLOOM_K, _BLOOM_SIZES

    o = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    build = set(
        o[
            (o["o_orderdate"] >= pd.Timestamp("1998-05-01"))
            & (o["o_orderdate"] < pd.Timestamp("1998-06-01"))
        ]["o_orderkey"].astype(int)
    )

    def positions(k):
        h = hashlib.md5(str(k).encode()).hexdigest()
        return [int(h[4 * j : 4 * j + 4], 16) for j in range(_BLOOM_K)]

    out = _run(catalog, spark, "q286_bloom_join_pruning").set_index("m_bits")
    rows_per_key = li.groupby("l_orderkey").size()
    for m in _BLOOM_SIZES:
        bits = {p % m for k in build for p in positions(k)}
        passing = {
            k for k in rows_per_key.index if all(p % m in bits for p in positions(k))
        }
        r = out.loc[m]
        assert r["bits_set"] == len(bits)
        assert r["keys_pass"] == len(passing)
        assert r["keys_true"] == len(set(rows_per_key.index) & build)
        assert r["rows_scanned"] == int(rows_per_key.loc[sorted(passing)].sum())


# --- q287 clustering factor ---------------------------------------------------


def test_clustering_factor_matches_python_total_order(catalog, spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    df = pd.DataFrame(
        {
            "ok16": li["l_orderkey"] * 16 + li["l_linenumber"],
            "c_ship": li["l_shipdate"].dt.date,
            "c_part": li["l_partkey"],
            "c_supp": li["l_suppkey"],
            "c_flag": li["l_returnflag"],
        }
    ).sort_values(["ok16", "c_ship", "c_part", "c_supp", "c_flag"])
    out = _run(catalog, spark, "q287_clustering_factor").set_index("candidate")
    for cand, col in {
        "l_shipdate": "c_ship",
        "l_partkey": "c_part",
        "l_suppkey": "c_supp",
        "l_returnflag": "c_flag",
    }.items():
        v = df[col].to_numpy()
        runs = 1 + int((v[1:] != v[:-1]).sum())
        r = out.loc[cand]
        assert r["n_runs"] == runs, cand
        assert r["n_distinct"] == df[col].nunique()


# --- q288 apportionment -------------------------------------------------------


def test_largest_remainder_matches_python_and_sums_to_budget(catalog, spark):
    from database_migrator_spark.operators.curation import _APPORTION_BUDGET

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    cnt = docs.groupby("source")["n_chars"].sum()  # r14: token-mass weights
    total = int(cnt.sum())
    base = {s: (_APPORTION_BUDGET * int(c)) // total for s, c in cnt.items()}
    rem = {s: (_APPORTION_BUDGET * int(c)) % total for s, c in cnt.items()}
    leftover = _APPORTION_BUDGET - sum(base.values())
    winners = set(
        sorted(rem, key=lambda s: (-rem[s], s))[:leftover]
    )
    out = _run(catalog, spark, "q288_largest_remainder_allocation").set_index(
        "source"
    )
    assert int(out["allocation"].sum()) == _APPORTION_BUDGET
    for s in cnt.index:
        r = out.loc[s]
        assert r["base_alloc"] == base[s] and r["remainder_units"] == rem[s]
        assert r["extra"] == (1 if s in winners else 0)


# --- q289 incremental sessionization ------------------------------------------


def test_stitch_equals_full_sessionization_pandas(catalog, spark):
    from database_migrator_spark.operators.temporal import (
        _STITCH_CUTOFF,
        _STITCH_GAP_US,
    )

    e = pd.read_parquet(f"{SF}/events.parquet")
    ts = e["ts"]
    if ts.dt.tz is not None:
        ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
    tus = (ts - pd.Timestamp("1970-01-01")).dt.total_seconds().mul(1e6).round().astype(np.int64)
    cut = int(
        (pd.Timestamp(_STITCH_CUTOFF) - pd.Timestamp("1970-01-01")).total_seconds()
        * 1e6
    )
    df = pd.DataFrame({"u": e["user_id"], "tus": tus, "eid": e["event_id"]}).sort_values(
        ["u", "tus", "eid"]
    )
    hist: dict[int, list] = {}
    for u, g in df.groupby("u"):
        t = g["tus"].to_numpy()
        new = np.concatenate([[True], np.diff(t) > _STITCH_GAP_US])
        sid = np.cumsum(new)
        n_sessions = int(sid.max())
        straddle = 0
        for s in range(1, n_sessions + 1):
            st = t[sid == s]
            if (st < cut).any() and (st >= cut).any():
                straddle = 1
        hist.setdefault(n_sessions, []).append((straddle, len(t)))
    out = _run(catalog, spark, "q289_incremental_sessionize_stitch").set_index(
        "n_sessions"
    )
    assert set(out.index) == set(hist)
    for k, entries in hist.items():
        r = out.loc[k]
        assert r["n_users"] == len(entries)
        assert r["n_merged_users"] == sum(s for s, _ in entries)
        assert r["total_events"] == sum(n for _, n in entries)


# --- q290 quantile normalization ----------------------------------------------


def test_quantile_normalization_matches_python(catalog, spark):
    from database_migrator_spark.operators.curation import _QNORM_REF, _QNORM_TGT

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ref = np.sort(docs[docs["source"] == _QNORM_REF]["n_chars"].to_numpy())
    tgt = docs[docs["source"] == _QNORM_TGT]["n_chars"].value_counts().sort_index()
    ta, tb = len(ref), int(tgt.sum())
    rv = np.unique(ref)
    rcum = np.searchsorted(ref, rv, side="right")
    out = _run(catalog, spark, "q290_quantile_normalization").set_index(
        "target_value"
    )
    cum = 0
    prev_mapped = None
    for v, c in tgt.items():
        cum += int(c)
        mapped = int(rv[np.argmax(rcum * tb >= cum * ta)])
        r = out.loc[v]
        assert r["n_docs"] == c and r["cum_target"] == cum
        assert r["mapped_value"] == mapped, v
        if prev_mapped is not None:
            assert mapped >= prev_mapped  # rank matching is monotone
        prev_mapped = mapped


# --- q291 broadcast audit -----------------------------------------------------


def test_broadcast_audit_matches_python(catalog, spark):
    import math

    out = _run(catalog, spark, "q291_broadcast_decision_audit", SF1).set_index(
        "join_name"
    )
    t = {n: pd.read_parquet(f"{SF1}/{n}.parquet")
         for n in ["customer", "orders", "part", "supplier", "lineitem"]}
    widths = {
        "customer": 8 * 3 + math.ceil(
            (t["customer"]["c_name"].str.len() + t["customer"]["c_mktsegment"].str.len()).mean()
        ),
        "orders": 8 * 4 + math.ceil(
            (t["orders"]["o_orderstatus"].str.len() + t["orders"]["o_orderpriority"].str.len()).mean()
        ),
        "supplier": 8 * 2 + math.ceil(t["supplier"]["s_name"].str.len().mean()),
        "lineitem": 8 * 9 + math.ceil(
            (t["lineitem"]["l_returnflag"].str.len() + t["lineitem"]["l_linestatus"].str.len()).mean()
        ),
    }
    for join_name, (lt, rt) in {
        "customer x orders": ("customer", "orders"),
        "supplier x lineitem": ("supplier", "lineitem"),
    }.items():
        r = out.loc[join_name]
        assert r["left_rows"] == len(t[lt]) and r["right_rows"] == len(t[rt])
        assert r["est_left_bytes"] == len(t[lt]) * widths[lt]
        assert r["est_right_bytes"] == len(t[rt]) * widths[rt]
    # decisions: small dims broadcast, both-big shuffles at 10MiB
    assert out.loc["supplier x lineitem"]["decision"] == "broadcast_left"
    assert (out["actual_rows"] > 0).all()


# --- q292 retrieval metrics ---------------------------------------------------


def test_retrieval_metrics_match_python(catalog, spark):
    from database_migrator_spark.operators.textops import (
        _IR_CUM,
        _IR_DISC,
        _IR_K,
        _IR_LEN_BUCKET,
        _IR_QUERIES,
    )
    import math

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = {int(r.doc_id): [t for t in r.text.lower().split() if t]
            for r in docs.itertuples()}
    meta = {int(r.doc_id): (r.source, int(r.n_chars) // _IR_LEN_BUCKET)
            for r in docs.itertuples()}
    tf = {d: {} for d in toks}
    for d, ts in toks.items():
        for t in ts:
            tf[d][t] = tf[d].get(t, 0) + 1
    df = {}
    for d in tf:
        for t in tf[d]:
            df[t] = df.get(t, 0) + 1
    n = len(toks)
    idf_fp = {
        t: round(math.log((n + 1.0) / (c + 1.0)) * 1e12) for t, c in df.items()
    }
    out = _run(catalog, spark, "q292_retrieval_metrics_report").set_index(
        "query_doc"
    )
    for qid in sorted(toks)[:_IR_QUERIES]:
        qterms = list(dict.fromkeys(toks[qid][:3]))
        scored = []
        for d in tf:
            if d == qid:
                continue
            s = sum(tf[d].get(t, 0) * idf_fp[t] for t in qterms if t in tf[d])
            if s > 0 or any(t in tf[d] for t in qterms):
                scored.append((-s, d))
        scored.sort()
        top = [d for _, d in scored[:_IR_K]]
        qsrc, qlb = meta[qid]
        rel = [
            2 if meta[d] == (qsrc, qlb) else 1 if meta[d][0] == qsrc else 0
            for d in top
        ]
        dcg = sum(
            (3.0 if r == 2 else 1.0 if r == 1 else 0.0) * _IR_DISC[i]
            for i, r in enumerate(rel)
        )
        n2 = sum(1 for d in meta if d != qid and meta[d] == (qsrc, qlb))
        n1 = sum(
            1 for d in meta if d != qid and meta[d][0] == qsrc and meta[d][1] != qlb
        )
        idcg = 3.0 * _IR_CUM[min(n2, _IR_K)] + (
            _IR_CUM[min(n2 + n1, _IR_K)] - _IR_CUM[min(n2, _IR_K)]
        )
        r = out.loc[qid]
        assert r["pool_rel2"] == n2 and r["pool_rel1"] == n1, qid
        assert abs(r["dcg"] - dcg) < 1e-9, qid
        assert abs(r["ndcg"] - (dcg / idcg)) < 1e-9, qid


# --- q293 vocab growth --------------------------------------------------------


def test_vocab_growth_matches_python(catalog, spark):
    docs = pd.read_parquet(f"{SF1}/documents.parquet").sort_values("doc_id")
    n_docs = int(docs["doc_id"].max()) + 1
    seen: set = set()
    per = {d: [0, 0] for d in range(10)}  # decile -> [tokens, new_terms]
    for r in docs.itertuples():
        dec = int(r.doc_id) * 10 // n_docs
        toks = [t for t in r.text.lower().split() if t]
        per[dec][0] += len(toks)
        for t in toks:
            if t not in seen:
                seen.add(t)
                per[dec][1] += 1
    out = _run(catalog, spark, "q293_vocab_growth_curve", SF1).set_index("decile")
    cum_t = cum_v = 0
    for d in range(10):
        cum_t += per[d][0]
        cum_v += per[d][1]
        r = out.loc[d]
        assert r["n_tokens"] == per[d][0] and r["new_terms"] == per[d][1]
        assert r["cum_tokens"] == cum_t and r["vocab_size"] == cum_v
