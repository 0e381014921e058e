"""Unit tests for the sequence-motif queries (q157/q158): the per-user
event cap that bounds hot keys, and the gap-constrained regex semantics
proven against a hand-computed corpus on BOTH regex engines (Java via
Spark, RE2 via DuckDB)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from database_migrator_spark.operators.temporal import (
    _SEQ_CAP,
    _capped_user_sequences,
    _gap_pattern,
)


def _events_frame(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )


def test_hot_user_sequence_is_capped(spark):
    """Round-6 verdict #2: a synthetic hot user with 10^5 events (the
    null-ish default key owning 1% of a 100 TB fact table) must clip to
    exactly _SEQ_CAP entries — never an unbounded row — and the cap must
    keep the FIRST events by (ts, event_id)."""
    base = datetime.datetime(2024, 1, 1)
    hot = spark.range(100_000).select(
        F.col("id").alias("event_id"),
        (F.lit(base) + F.make_interval(secs=F.col("id").cast("double"))).alias("ts"),
        F.lit(7).alias("user_id"),
        F.when(F.col("id") % 2 == 0, "view").otherwise("click").alias("event_type"),
    )
    cold = _events_frame(
        spark, [(0, base, 1, "view"), (1, base + datetime.timedelta(seconds=1), 1, "purchase")]
    )
    seqs = {
        r["user_id"]: r["seq"]
        for r in _capped_user_sequences(hot.unionByName(cold)).collect()
    }
    hot_seq = seqs[7].split(",")
    assert len(hot_seq) == _SEQ_CAP
    # first _SEQ_CAP events by ts: ids 0.._SEQ_CAP-1, alternating view/click
    assert hot_seq[0] == "view" and hot_seq[1] == "click"
    assert hot_seq == ["view" if i % 2 == 0 else "click" for i in range(_SEQ_CAP)]
    assert seqs[1] == "view,purchase"


# (sequence, expected non-overlapping count) for view->purchase gap<=2.
# Hand-computed under leftmost-first LAZY matching — identical in Java
# regex and RE2 (both scan left-to-right, prefer the SHORTEST lazy
# quantifier expansion that admits a match, and continue after match
# end). Lazy is the semantic choice: each view pairs with its earliest
# qualifying purchase, so adjacent pairs are never swallowed as gaps.
_HAND_CASES = [
    ("view,purchase", 1),
    ("view,click,purchase", 1),
    ("view,click,click,purchase", 1),
    ("view,click,click,click,purchase", 0),  # gap 3 > 2
    ("view,purchase,view,purchase", 2),  # lazy: two minimal matches
    ("view,view,purchase", 1),  # inner view consumed as gap
    ("view,purchase,purchase", 1),  # earliest purchase ends the match
    ("purchase,view", 0),  # order matters
    ("signup,error", 0),
]


def test_gap_motif_semantics_hand_corpus(spark, duck):
    pattern = _gap_pattern("view", "purchase", 2)
    assert pattern == "view(,[a-z]+){0,2}?,purchase"
    df = spark.createDataFrame([(s,) for s, _ in _HAND_CASES], "seq string")
    got = {
        r["seq"]: r["n"]
        for r in df.select(
            "seq", F.regexp_count("seq", F.lit(pattern)).alias("n")
        ).collect()
    }
    for seq, want in _HAND_CASES:
        assert got[seq] == want, f"spark {seq!r}: {got[seq]} != {want}"
        (duck_n,) = duck.execute(
            "SELECT len(regexp_extract_all(?, ?))", [seq, pattern]
        ).fetchone()
        assert duck_n == want, f"duckdb {seq!r}: {duck_n} != {want}"


def test_concurrent_sessions_hand_corpus(spark, duck, tmp_path):
    """Sweep-line convention check on a hand corpus: user 1 has one
    session 00:00-00:40 (two events 40 min apart would split — use 20-min
    gaps), user 2 overlaps it 00:10-00:30, user 3 is a single-event
    session at 00:20. Expected max concurrency = 3; 3 sessions start."""
    import datetime as dt
    import os

    base = dt.datetime(2024, 3, 1)

    def ev(eid, mins, uid):
        return (eid, base + dt.timedelta(minutes=mins), uid, "view", 1.0, "{}")

    rows = [
        ev(1, 0, 1), ev(2, 20, 1), ev(3, 40, 1),
        ev(4, 10, 2), ev(5, 30, 2),
        ev(6, 20, 3),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))
    from database_migrator_spark.plans.registry import all_queries

    out = all_queries()["q166_concurrent_sessions"].build(spark, sf).collect()
    assert len(out) == 1
    assert out[0]["day"] == "2024-03-01"
    assert out[0]["max_concurrent"] == 3
    assert out[0]["n_sessions_started"] == 3


def test_uninterrupted_funnel_hand_corpus(spark):
    """q175 semantics on a hand corpus: (a) purchase within the 12-hour
    window and no error between -> matched; (b) error strictly between
    view and the first purchase -> blocked, not matched; (c) error AT
    the purchase timestamp is not 'between' (>= tie rule) -> matched;
    (d) purchase past the 12-hour bound -> neither; (e) error after the
    purchase is irrelevant."""
    import datetime

    from database_migrator_spark.operators.temporal import _uninterrupted_funnel

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def s(sec):
        return t0 + datetime.timedelta(seconds=sec)

    rows = [
        # user 1: clean conversion after 60s -> matched
        (10, s(0), 1, "view"),
        (11, s(60), 1, "purchase"),
        # user 2: error at +30s precedes the purchase at +60s -> blocked
        (20, s(0), 2, "view"),
        (21, s(30), 2, "error"),
        (22, s(60), 2, "purchase"),
        # user 3: error exactly AT the purchase ts -> matched (tie rule)
        (30, s(0), 3, "view"),
        (31, s(90), 3, "error"),
        (32, s(90), 3, "purchase"),
        # user 4: purchase at +12h+1s > 12 h -> no conversion, not blocked
        (40, s(0), 4, "view"),
        (41, s(12 * 3600 + 1), 4, "purchase"),
        # user 5: error AFTER the first purchase -> matched
        (50, s(0), 5, "view"),
        (51, s(10), 5, "purchase"),
        (52, s(20), 5, "error"),
    ]
    e = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    out = _uninterrupted_funnel(e).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_views"] == 5
    assert r["n_matched"] == 3  # users 1, 3, 5
    assert r["n_blocked"] == 1  # user 2
    assert r["sum_delay_s"] == 60 + 90 + 10
    assert abs(r["match_rate"] - 3 / 5) < 1e-12


def test_position_attribution_credit_sums_to_10000_per_conversion(spark):
    """q225's contract: every conversion's path credit sums to exactly
    10000 basis points regardless of path length — the integer split
    (first 4000 / last 4000 / middle 2000 with earliest-first
    remainder) must be total."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    e = table(spark, SF_SMOKE, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    v = e.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), "user_id", F.col("ts").alias("vts")
    )
    gap = F.unix_timestamp("pts") - F.unix_timestamp("vts")
    path = p.join(v, "user_id").where((F.col("vts") <= F.col("pts")) & (gap <= 1800))
    w = Window.partitionBy("pid").orderBy("vts", "vid")
    wn = Window.partitionBy("pid")
    ranked = path.select(
        "pid", F.row_number().over(w).alias("pos"), F.count("*").over(wn).alias("n")
    )
    bp = (
        F.when(F.col("n") == 1, 10000)
        .when(F.col("n") == 2, 5000)
        .when(F.col("pos") == 1, 4000)
        .when(F.col("pos") == F.col("n"), 4000)
        .otherwise(
            F.expr("2000 DIV (n - 2)")
            + F.when(F.col("pos") - 1 <= F.expr("2000 % (n - 2)"), 1).otherwise(0)
        )
    )
    sums = ranked.select("pid", bp.alias("bp")).groupBy("pid").agg(F.sum("bp").alias("s"))
    bad = sums.where(F.col("s") != 10000).count()
    assert bad == 0
    assert sums.count() > 0


def test_nearest_event_join_matches_brute_force(spark):
    """q226's bucketized 3-cell nearest join must agree with a direct
    pandas nearest-neighbor computation (|gap| <= 1h, tie -> earlier
    click) on the smoke corpus — cell-boundary candidates are exactly
    where a naive 1-cell explode silently drops matches."""
    import pandas as pd
    from pyspark.sql import functions as F

    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    got = {
        r.hour: (r.n_purchases, r.n_matched)
        for r in all_queries()["q226_nearest_event_join"].build(spark, SF_SMOKE).collect()
    }
    e = table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", F.unix_timestamp("ts").alias("s"),
        F.hour("ts").alias("hr"),
    ).toPandas()
    p = e[e.event_type == "purchase"]
    c = e[e.event_type == "click"]
    by_user = {u: g.sort_values("s") for u, g in c.groupby("user_id")}
    want = {}
    for _, row in p.iterrows():
        n_p, n_m = want.get(row.hr, (0, 0))
        cand = by_user.get(row.user_id)
        matched = cand is not None and (abs(cand.s - row.s) <= 3600).any()
        want[row.hr] = (n_p + 1, n_m + (1 if matched else 0))
    assert got == want


def test_point_in_time_strictness_excludes_same_instant_version(spark):
    """q231's leakage rule on a hand-built frame: a feature version
    stamped at EXACTLY the probe's timestamp must be excluded (it would
    not have been visible at serving time) — the (ts, flag) sort with
    probes before same-ts versions is the mechanism. Also checks the
    cold-start (no prior version) and normal carry-forward paths."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    feat = spark.createDataFrame(
        [(1, 100, 10), (1, 200, 20), (2, 150, 99)],
        "user_id long, ts long, val long",
    )
    probes = spark.createDataFrame(
        [(1, 100, "same-instant"), (1, 150, "carry-10"), (1, 250, "carry-20"),
         (2, 100, "cold-start")],
        "user_id long, ts long, tag string",
    )
    unioned = feat.select(
        "user_id", "ts", F.lit(1).alias("flag"), F.col("val"),
        F.lit(None).cast("string").alias("tag"),
    ).unionByName(
        probes.select(
            "user_id", "ts", F.lit(0).alias("flag"),
            F.lit(None).cast("long").alias("val"), "tag",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "flag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = {
        r.tag: r.carried
        for r in unioned.select(
            "flag", "tag", F.last("val", ignorenulls=True).over(w).alias("carried")
        )
        .where(F.col("flag") == 0)
        .collect()
    }
    assert got == {
        "same-instant": None,  # version at the probe's own instant excluded
        "carry-10": 10,
        "carry-20": 20,
        "cold-start": None,
    }


def test_point_in_time_matches_brute_force(spark):
    """q231 end-to-end vs a pandas brute force (strict f.ts < v.ts,
    latest version wins, cold-start tier 0) on the smoke corpus."""
    import pandas as pd
    from pyspark.sql import functions as F

    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    got = {
        r.tier: (r.n_views, r.sum_cents_so_far)
        for r in all_queries()["q231_point_in_time_features"].build(spark, SF_SMOKE).collect()
    }
    e = table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_timestamp("ts").alias("s"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).toPandas()
    pur = e[e.event_type == "purchase"].sort_values(["user_id", "s", "event_id"])
    pur = pur.assign(
        n_so_far=pur.groupby("user_id").cumcount() + 1,
        cents_so_far=pur.groupby("user_id").cents.cumsum(),
    )
    # one version per (user, ts): last running state
    pur = pur.groupby(["user_id", "s"], as_index=False).agg(
        n_so_far=("n_so_far", "max"), cents_so_far=("cents_so_far", "max")
    )
    by_user = {u: g for u, g in pur.groupby("user_id")}
    want = {}
    for _, row in e[e.event_type == "view"].iterrows():
        g = by_user.get(row.user_id)
        n = c = 0
        if g is not None:
            prior = g[g.s < row.s]
            if len(prior):
                last = prior.iloc[prior.s.values.argmax()]
                n, c = int(last.n_so_far), int(last.cents_so_far)
        tier = min(n, 5)
        nv, sc = want.get(tier, (0, 0))
        want[tier] = (nv + 1, sc + c)
    assert got == want


def test_wilson_ci_reference_and_properties(spark):
    """q232's interval vs an independent pure-Python Wilson computation
    using the same exact decimal constants (1.9208 / 3.8416 / 0.9604 —
    deliberately NOT float(1.96)**2/k, which differs in the last ulp),
    plus the properties that make Wilson the right interval:
    lo <= rate <= hi and both bounds inside [0, 1] (the query clamps
    the last-ulp float residue at the x=0 / x=n edges)."""
    import math

    from database_migrator_spark.plans.registry import all_queries

    from .conftest import SF_SMOKE

    rows = all_queries()["q232_conversion_wilson_ci"].build(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        n, x = r.n_views, r.n_converted
        ph = x / n
        center = ph + 1.9208 / n
        margin = 1.96 * math.sqrt(ph * (1.0 - ph) / n + 0.9604 / (n * n))
        denom = 1.0 + 3.8416 / n
        assert r.wilson_lo == max(0.0, round((center - margin) / denom * 1e9) / 1e9)
        assert r.wilson_hi == min(1.0, round((center + margin) / denom * 1e9) / 1e9)
        assert 0.0 <= r.wilson_lo <= r.rate <= r.wilson_hi <= 1.0


def test_cuped_invariants_and_numpy_theta(spark):
    """q233: (a) CUPED preserves the POOLED mean exactly — the
    n_a-weighted average of adjusted per-arm means equals the raw
    pooled mean (adjustment only moves variance between arms); (b)
    theta equals numpy's OLS slope of y on x; (c) var_reduction is
    corr^2 in [0, 1]."""
    import numpy as np
    from pyspark.sql import functions as F

    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    rows = all_queries()["q233_cuped_adjusted_lift"].build(spark, SF_SMOKE).collect()
    assert len(rows) == 2
    n_tot = sum(r.n_users for r in rows)
    pooled_raw = sum(r.n_users * r.mean_post_cents for r in rows) / n_tot
    pooled_adj = sum(r.n_users * r.mean_post_cents_cuped for r in rows) / n_tot
    assert abs(pooled_raw - pooled_adj) < 1e-3  # identical up to the 1e-6 rounding
    for r in rows:
        assert 0.0 <= r.var_reduction <= 1.0
    # numpy reference for theta on the same per-user (x, y) table
    e = table(spark, SF_SMOKE, "events").select(
        "user_id", F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).toPandas()
    mid = (e.us.min() + e.us.max()) // 2
    g = e.assign(x=e.cents.where(e.us < mid, 0), y=e.cents.where(e.us >= mid, 0))
    pu = g.groupby("user_id")[["x", "y"]].sum()
    X = pu.x.to_numpy(dtype=float)
    Y = pu.y.to_numpy(dtype=float)
    theta = ((len(X) * (X * Y).sum() - X.sum() * Y.sum())
             / (len(X) * (X * X).sum() - X.sum() ** 2))
    assert abs(rows[0].theta - theta) < 1e-6


def test_nelson_aalen_lifetable_invariants(spark):
    """q239: classic life-table invariants on the smoke corpus — risk
    sets strictly decrease over event times, the cumulative hazard
    strictly increases, every increment equals d/n in 1e-12 fixed
    point, and the first risk set equals the number of users with a
    first view (nobody censors before time 0)."""
    from database_migrator_spark.plans.registry import all_queries

    from .conftest import SF_SMOKE

    rows = (
        all_queries()["q239_nelson_aalen_hazard"]
        .build(spark, SF_SMOKE)
        .collect()
    )
    assert rows, "smoke corpus must produce conversion events"
    prev_risk, prev_h, expect = None, 0.0, 0
    for r in rows:
        assert r.n_events >= 1 and r.n_risk >= r.n_events
        if prev_risk is not None:
            assert r.n_risk < prev_risk
        inc_fp = r.n_events * 1_000_000_000_000 // r.n_risk
        expect += inc_fp
        assert abs(r.cum_hazard - expect / 1e12) < 1e-15
        assert r.cum_hazard > prev_h
        prev_risk, prev_h = r.n_risk, r.cum_hazard


def test_calibration_report_matches_python_replay(spark):
    """q247: a plain-Python replay over the collected (user, day) units —
    Laplace-smoothed integer-ratio confidences, floor-division fixed
    point, 10 equal-width bins, n-weighted ECE — must reproduce every
    per-bin row AND the bin=-1 ALL row exactly; basic reliability-table
    invariants hold (bins in range, counts tile the units, gap =
    |frac_pos − mean_conf| up to the two floors)."""
    from collections import defaultdict

    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    e = table(spark, SF_SMOKE, "events").select("user_id", F.to_date("ts").alias("d"), "event_type").collect()
    agg = defaultdict(lambda: [0, 0, 0])  # (user, d) -> [v, c, y]
    for r in e:
        a = agg[(r.user_id, r.d)]
        if r.event_type == "view":
            a[0] += 1
        elif r.event_type == "click":
            a[1] += 1
        elif r.event_type == "purchase":
            a[2] = 1
    bins = defaultdict(lambda: [0, 0, 0])  # bin -> [n, n_pos, sum_conf_fp]
    for v, c, y in agg.values():
        conf_fp = (1_000_000 * (c + 1)) // (v + c + 2)
        b = bins[conf_fp // 100_000]
        b[0] += 1
        b[1] += y
        b[2] += conf_fp
    expect, N, P, SC, SG = [], 0, 0, 0, 0
    for bn in sorted(bins):
        n, n_pos, sc = bins[bn]
        mean_fp, acc_fp = sc // n, (1_000_000 * n_pos) // n
        gap_fp = abs(acc_fp - mean_fp)
        N, P, SC, SG = N + n, P + n_pos, SC + n * mean_fp, SG + n * gap_fp
        expect.append((bn, n, n_pos, mean_fp / 1e6, acc_fp / 1e6, gap_fp / 1e6))
    all_row = (-1, N, P, (SC // N) / 1e6, ((1_000_000 * P) // N) / 1e6, (SG // N) / 1e6)
    got = [
        (r.bin, r.n_units, r.n_pos, r.mean_conf, r.frac_pos, r.gap)
        for r in all_queries()["q247_calibration_report"].build(spark, SF_SMOKE).collect()
    ]
    assert got == [all_row] + expect
    assert all(0 <= b <= 9 for b, *_ in expect)
    assert sum(n for _, n, *_ in expect) == N and N == len(agg)


def test_groupwise_auc_equals_pairwise_definition(spark):
    """q250: the histogram-rank AUC must equal the O(n²) DEFINITION —
    (wins + half-ties) / (P·N) over every (positive, negative) pair —
    per weekday slice and pooled, and sit in [0, 1]."""
    from collections import defaultdict

    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    e = table(spark, SF_SMOKE, "events").select("user_id", F.to_date("ts").alias("d"), "event_type").collect()
    agg = defaultdict(lambda: [0, 0, 0])
    for r in e:
        a = agg[(r.user_id, r.d)]
        if r.event_type == "view":
            a[0] += 1
        elif r.event_type == "click":
            a[1] += 1
        elif r.event_type == "purchase":
            a[2] = 1
    slices = defaultdict(list)
    for (_, d), (v, c, y) in agg.items():
        conf = (1_000_000 * (c + 1)) // (v + c + 2)
        slices[d.weekday()].append((conf, y))
        slices[-1].append((conf, y))

    def pairwise_auc(units):
        pos = [s for s, y in units if y]
        neg = [s for s, y in units if not y]
        if not pos or not neg:
            return None
        num = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
        return len(pos), len(neg), num / (len(pos) * len(neg))

    expect = []
    for dow in sorted(slices):
        r = pairwise_auc(slices[dow])
        if r:
            expect.append((dow, r[0], r[1]))
    got = [
        (r.dow, r.n_pos, r.n_neg, r.auc)
        for r in all_queries()["q250_groupwise_auc"].build(spark, SF_SMOKE).collect()
    ]
    assert [(d, p, n) for d, p, n, _ in got] == expect
    for dow, _, _, auc in got:
        ref = pairwise_auc(slices[dow])[2]
        assert abs(auc - ref) < 1e-12 and 0.0 <= auc <= 1.0


def test_isotonic_minimax_equals_pav_and_is_monotone(spark):
    """q251: the minimax-formula fit must equal a from-scratch
    pool-adjacent-violators run on the same fixed-point bin rates
    (within the 1e-12 pooling truncation), be monotone nondecreasing,
    and approximately preserve the weighted mean (PAV's invariant, up
    to one truncation per pooled block)."""
    from collections import defaultdict

    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    e = table(spark, SF_SMOKE, "events").select("user_id", F.to_date("ts").alias("d"), "event_type").collect()
    agg = defaultdict(lambda: [0, 0, 0])
    for r in e:
        a = agg[(r.user_id, r.d)]
        if r.event_type == "view":
            a[0] += 1
        elif r.event_type == "click":
            a[1] += 1
        elif r.event_type == "purchase":
            a[2] = 1
    bins = defaultdict(lambda: [0, 0])
    for v, c, y in agg.values():
        bn = ((1_000_000 * (c + 1)) // (v + c + 2)) // 100_000
        bins[bn][0] += 1
        bins[bn][1] += y
    # from-scratch PAV on (weight=n, value=np/n), exact rational pooling
    blocks = [[n, np] for bn, (n, np) in sorted(bins.items())]
    merged = []
    for blk in blocks:
        merged.append(blk)
        while len(merged) >= 2 and merged[-2][1] * merged[-1][0] > merged[-1][1] * merged[-2][0]:
            b2, b1 = merged.pop(), merged.pop()
            merged.append([b1[0] + b2[0], b1[1] + b2[1]])
    # expand the pooled blocks back to per-bin fitted values
    fitted, it = [], iter(merged)
    cur, left = None, 0
    for n, _ in blocks:
        if left == 0:
            cur = next(it)
            left = cur[0]
        fitted.append((cur[1] * 10**12) // cur[0] / 1e12)
        left -= n
    got = (
        all_queries()["q251_isotonic_calibration"].build(spark, SF_SMOKE).collect()
    )
    assert [r.bin for r in got] == sorted(bins)
    iso = [r.iso_rate for r in got]
    assert all(iso[t] <= iso[t + 1] + 1e-12 for t in range(len(iso) - 1))
    assert all(abs(a - b) <= 2e-12 for a, b in zip(iso, fitted))
    tot = sum(n for n, _ in blocks)
    wm_raw = sum(r.n_units * r.raw_rate for r in got) / tot
    wm_iso = sum(r.n_units * r.iso_rate for r in got) / tot
    assert abs(wm_raw - wm_iso) < 1e-6


def test_markov_removal_matches_python_replay_and_converged(spark):
    """q252: a plain-Python replay — daily journeys, transition counts,
    per-variant redirect-to-NULL edges, 16 rounds of 1e-6 fixed-point
    value iteration with per-term floor division — must reproduce every
    output value exactly; the 16th step must have converged below one
    fixed-point unit; shares are nonnegative and sum to ~1."""
    import json
    from collections import defaultdict

    from database_migrator_spark.operators.temporal import _MARKOV_ITERS
    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    ev = (
        table(spark, SF_SMOKE, "events")
        .select("user_id", F.to_date("ts").alias("d"), "ts", "event_id", "event_type", "props")
        .collect()
    )
    by_unit = defaultdict(list)
    for r in ev:
        by_unit[(r.user_id, r.d)].append(r)
    cnt = defaultdict(int)
    for rows in by_unit.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        y = any(r.event_type == "purchase" for r in rows)
        touches = []
        for r in rows:
            if r.event_type in ("view", "click"):
                k = json.loads(r.props).get("k") if r.props else None
                touches.append(int(k) % 4 if k is not None else -1)
        if not touches:
            continue
        prev = -10
        for ch in touches:
            cnt[(prev, ch)] += 1
            prev = ch
        cnt[(prev, 100 if y else 101)] += 1
    channels = sorted({f for f, _ in cnt if f != -10})
    results = {}
    for v in [-99] + channels:
        vedges = defaultdict(int)
        for (f, t), c in cnt.items():
            if f == v:
                continue
            vedges[(f, 101 if t == v else t)] += c
        out = defaultdict(int)
        for (f, _), c in vedges.items():
            out[f] += c
        prob = {(f, t): (c * 10**6) // out[f] for (f, t), c in vedges.items()}
        p = {s: 0 for s in out}
        p[100], p[101] = 10**6, 0
        for i in range(_MARKOV_ITERS):
            prev_p = dict(p)
            nxt = {}
            for (f, t), pf in prob.items():
                nxt[f] = nxt.get(f, 0) + pf * prev_p.get(t, 0)
            p = {f: s // 10**6 for f, s in nxt.items()}
            p[100], p[101] = 10**6, 0
            if i == _MARKOV_ITERS - 2:
                p_prev_round = dict(p)
        results[v] = p[-10]
        assert abs(p[-10] - p_prev_round[-10]) <= 1  # converged
    bp = results[-99]
    res = {c: max(bp - results[c], 0) for c in channels}
    tr = sum(res.values())
    expect = [(-99, bp / 1e6, 0.0, 0.0)] + [
        (c, results[c] / 1e6, res[c] / 1e6, (res[c] / tr if tr > 0 else 0.0))
        for c in channels
    ]
    got = [
        (r.channel, r.conv_prob, r.removal_effect, r.share)
        for r in all_queries()["q252_markov_removal_attribution"]
        .build(spark, SF_SMOKE)
        .collect()
    ]
    assert got == expect
    shares = [s for _, _, _, s in got[1:]]
    assert all(s >= 0 for s in shares) and abs(sum(shares) - 1.0) < 1e-9


def test_ipw_stratified_lift_matches_python_replay(spark):
    """q253: a plain-Python replay of the stratified estimator — per
    (user, day) treatment/outcome flags, view-bucket strata, exact
    integer rates, positivity filtering, n-weighted truncating-division
    ATE — must reproduce every row; the adjusted lift must differ from
    the naive pooled difference when strata are imbalanced (the
    confounding adjustment is doing something) and per-stratum lifts
    must bracket it."""
    from collections import defaultdict

    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    ev = (
        table(spark, SF_SMOKE, "events")
        .select("user_id", F.to_date("ts").alias("d"), "event_type")
        .collect()
    )
    agg = defaultdict(lambda: [0, 0, 0])  # v, t, y
    for r in ev:
        a = agg[(r.user_id, r.d)]
        if r.event_type == "view":
            a[0] += 1
        elif r.event_type == "click":
            a[1] = 1
        elif r.event_type == "purchase":
            a[2] = 1
    g = defaultdict(lambda: [0, 0, 0, 0])  # n, nt, yt, yc
    for v, t, y in agg.values():
        s = g[min(v, 5)]
        s[0] += 1
        s[1] += t
        s[2] += t * y
        s[3] += (1 - t) * y
    expect, NN, W, TNT, TYT, TNC, TYC = [], 0, 0, 0, 0, 0, 0
    for st in sorted(g):
        n, nt, yt, yc = g[st]
        if nt == 0 or n - nt == 0:
            continue
        rt, rc = (yt * 10**12) // nt, (yc * 10**12) // (n - nt)
        expect.append((st, n, nt, rt / 1e12, rc / 1e12, (rt - rc) / 1e12))
        NN += n
        W += n * (rt - rc)
        TNT, TYT, TNC, TYC = TNT + nt, TYT + yt, TNC + (n - nt), TYC + yc
    tr_w = abs(W) // NN * (1 if W >= 0 else -1)  # truncating div
    expect.append(
        (-1, NN, TNT, (TYT * 10**12) // TNT / 1e12, (TYC * 10**12) // TNC / 1e12, tr_w / 1e12)
    )
    got = [
        (r.stratum, r.n_units, r.n_treated, r.rate_treated, r.rate_control, r.lift)
        for r in all_queries()["q253_ipw_conversion_lift"].build(spark, SF_SMOKE).collect()
    ]
    assert got == sorted(expect)
    lifts = [l for st, *_, l in got if st >= 0]
    adj = [l for st, *_, l in got if st == -1][0]
    assert min(lifts) - 1e-12 <= adj <= max(lifts) + 1e-12  # convexity


def test_woe_iv_matches_python_replay(spark):
    """q258: a plain-Python replay — Laplace-smoothed per-bin counts,
    the exact ln argument sequence (ps/P)·(N/ns), 1e-9 fixed-pointing
    BEFORE the IV total — must reproduce every row; positive-lift bins
    have positive WoE and the IV total equals the sum of contributions."""
    import math
    from collections import defaultdict

    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    ev = (
        table(spark, SF_SMOKE, "events")
        .select("user_id", F.to_date("ts").alias("d"), "event_type")
        .collect()
    )
    agg = defaultdict(lambda: [0, 0])
    for r in ev:
        a = agg[(r.user_id, r.d)]
        if r.event_type == "view":
            a[0] += 1
        elif r.event_type == "purchase":
            a[1] = 1
    bins = defaultdict(lambda: [0, 0])
    for v, y in agg.values():
        bins[min(v, 5)][0] += y
        bins[min(v, 5)][1] += 1 - y
    P = sum(p + 1 for p, _ in bins.values())
    N = sum(n + 1 for _, n in bins.values())
    expect, iv_total = [], 0
    for bn in sorted(bins):
        pos, neg = bins[bn]
        ps, ns = pos + 1, neg + 1
        ratio = (ps / P) * (N / ns)
        woe_fp = round(math.log(ratio) * 1e9)
        iv_fp = round((ps / P - ns / N) * math.log(ratio) * 1e9)
        iv_total += iv_fp
        expect.append((bn, pos, neg, woe_fp / 1e9, iv_fp / 1e9))
    expect.insert(
        0,
        (-1, sum(p for p, _ in bins.values()), sum(n for _, n in bins.values()), 0.0, iv_total / 1e9),
    )
    got = [
        (r.bin, r.n_pos, r.n_neg, r.woe, r.iv_contrib)
        for r in all_queries()["q258_woe_information_value"].build(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    for bn, pos, neg, woe, _ in got:
        if bn >= 0 and (pos + 1) * N > (neg + 1) * P:
            assert woe > 0
