"""Salted join: result equality with the plain join, and salt spread."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_migrator_spark.operators.skew import salted_join
from database_migrator_spark.sources import table

from .conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    li = table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    sup = table(spark, SF_SMOKE, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    plain = li.join(sup, "l_suppkey").groupBy("s_name").agg(
        F.sum("l_quantity").alias("q"), F.count("*").alias("n")
    )
    salted = salted_join(li, sup, "l_suppkey", n_salts=8).groupBy("s_name").agg(
        F.sum("l_quantity").alias("q"), F.count("*").alias("n")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_outer_joins(spark):
    import pytest

    li = table(spark, SF_SMOKE, "lineitem")
    sup = table(spark, SF_SMOKE, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(li, sup, "l_suppkey", how="right")


def test_range_join_small_buckets_equal_naive(spark):
    """bucket_seconds < range_seconds must not drop matches."""
    from pyspark.sql import functions as F

    from database_migrator_spark.operators.relational_ext import bucketized_range_join

    e = table(spark, SF_SMOKE, "events")
    probe = e.where(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    build = e.select("user_id", F.col("ts").alias("b_ts"), F.col("event_id").alias("f_id"))
    bucketed = bucketized_range_join(
        probe, build, "user_id", "p_ts", "b_ts", range_seconds=3600, bucket_seconds=600
    ).count()
    lo = F.unix_micros(F.col("p_ts"))
    naive = (
        probe.join(build, "user_id")
        .where(
            (F.unix_micros(F.col("b_ts")) > lo)
            & (F.unix_micros(F.col("b_ts")) <= lo + 3600 * 1_000_000)
        )
        .count()
    )
    assert bucketed == naive


def test_salt_is_deterministic_and_spread(spark):
    li = table(spark, SF_SMOKE, "lineitem")
    salted = li.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in li.columns])), F.lit(8)),
    )
    counts = {r["__salt"]: r["count"] for r in salted.groupBy("__salt").count().collect()}
    assert set(counts) == set(range(8))  # all salts used
    total = sum(counts.values())
    assert max(counts.values()) < total * 0.25  # no salt hogs the key
    # deterministic: recompute → identical assignment
    again = {r["__salt"]: r["count"] for r in salted.groupBy("__salt").count().collect()}
    assert counts == again


def test_kruskal_wallis_matches_textbook_reference(spark):
    """q240: H and the tie-corrected H must match a from-scratch textbook
    implementation (average ranks over the pooled sample, 12/(N(N+1))
    formula, Σ(t³−t) correction) computed in plain Python on the smoke
    corpus — independent of the histogram/fixed-point machinery."""
    from collections import Counter

    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table as _table

    from .conftest import SF_SMOKE

    got = {
        r.event_type: r
        for r in all_queries()["q240_kruskal_wallis_value"]
        .build(spark, SF_SMOKE)
        .collect()
    }
    rows = (
        _table(spark, SF_SMOKE, "events")
        .select("event_type", "value")
        .collect()
    )
    samples = {}
    for r in rows:
        samples.setdefault(r.event_type, []).append(round(r.value * 100))
    pooled = sorted(c for v in samples.values() for c in v)
    n = len(pooled)
    # average rank per tied value
    first = {}
    for i, c in enumerate(pooled, 1):
        first.setdefault(c, i)
    cnt = Counter(pooled)
    avg_rank = {c: first[c] + (cnt[c] - 1) / 2 for c in cnt}
    s = sum(
        sum(avg_rank[c] for c in v) ** 2 / len(v) for v in samples.values()
    )
    h = 12.0 * s / (n * (n + 1)) - 3.0 * (n + 1)
    t3 = sum(t**3 - t for t in cnt.values())
    h_corr = h / (1.0 - t3 / (n**3 - n))
    assert set(got) == set(samples)
    for et, v in samples.items():
        assert got[et].n_i == len(v)
        assert got[et].rank_sum_2x == round(2 * sum(avg_rank[c] for c in v))
        # the per-group ROUND-to-integer of R2²/(4n_i) shifts H by up to
        # 12·k/(N(N+1)) — ~6e-5 at the 1k-row smoke corpus (identically
        # on both engines; the hash oracle checks exact equality)
        assert abs(got[et].h - h) < 2e-4
        assert abs(got[et].h_corrected - h_corr) < 2e-4


def test_bootstrap_ci_python_replay_and_coverage(spark):
    """q242: the full resampling pipeline replayed in plain Python from
    the raw smoke-corpus orders (md5 picks, exact-cent replicate sums,
    rank-5/195 order statistics) must reproduce every output value, and
    the interval must bracket the point estimate."""
    import hashlib

    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table as _table

    from .conftest import SF_SMOKE

    row = (
        all_queries()["q242_bootstrap_ci_daily_revenue"]
        .build(spark, SF_SMOKE)
        .collect()[0]
    )
    orders = _table(spark, SF_SMOKE, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    days = {}
    for r in orders:
        days[r.o_orderdate] = days.get(r.o_orderdate, 0) + round(
            r.o_totalprice * 100
        )
    cents = [days[d] for d in sorted(days)]
    nd = len(cents)
    sums = []
    for rep in range(200):
        s = 0
        for i in range(nd):
            h = int(hashlib.md5(f"{rep}-{i}".encode()).hexdigest()[:12], 16)
            s += cents[h % nd]
        sums.append((s, rep))
    sums.sort()
    assert row.n_days == nd and row.n_boot == 200
    assert row.mean_daily_cents == sum(cents) / nd
    assert row.ci_lo_cents == sums[4][0] / nd
    assert row.ci_hi_cents == sums[194][0] / nd
    assert row.ci_lo_cents <= row.mean_daily_cents <= row.ci_hi_cents


def test_sampled_quantiles_match_python_replay(spark):
    """q261: a hashlib/Counter replay of BOTH populations — the full
    histogram and the 1-in-8 md5-gated sample — with the same integer
    ceil(q·n) thresholds must reproduce every row; the sample is the
    deterministic subset (same gate recomputed in Python) and estimates
    are real sample values."""
    import hashlib
    from collections import defaultdict

    from pyspark.sql import functions as F

    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    rows = (
        table(spark, SF_SMOKE, "events")
        .select("event_id", "event_type", F.round(F.col("value") * 100).cast("long").alias("cents"))
        .collect()
    )
    full, samp = defaultdict(list), defaultdict(list)
    for r in rows:
        full[r.event_type].append(r.cents)
        h = hashlib.md5(str(r.event_id).encode()).hexdigest()
        if int(h[:4], 16) % 8 == 0:
            samp[r.event_type].append(r.cents)

    def q(vals, num, den):
        vals = sorted(vals)
        k = (num * len(vals) + num) // den
        return vals[max(k, 1) - 1]

    expect = []
    for t in sorted(full):
        if not samp.get(t):
            continue
        expect.append(
            (
                t, len(full[t]), len(samp[t]),
                q(full[t], 1, 2), q(full[t], 9, 10), q(full[t], 99, 100),
                q(samp[t], 1, 2), q(samp[t], 9, 10), q(samp[t], 99, 100),
            )
        )
    got = [
        tuple(r)
        for r in all_queries()["q261_sampled_quantile_fidelity"]
        .build(spark, SF_SMOKE)
        .collect()
    ]
    assert got == expect
    for t, n, ns, *_ in got:
        assert 0 < ns < n


def test_join_cardinality_sketch_matches_python_replay(spark):
    """q262: a hashlib replay of both KMV sketches, the union merge,
    inclusion-exclusion intersection and the System-R uniformity
    product must reproduce the single report row exactly; with a
    foreign-key join (every order has a customer) the exact join count
    equals n_orders, and the estimate lands within 5x of it."""
    import hashlib

    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    ok = [r.k for r in table(spark, SF_SMOKE, "orders").selectExpr("o_custkey AS k").collect()]
    ck = [r.k for r in table(spark, SF_SMOKE, "customer").selectExpr("c_custkey AS k").collect()]

    def sketch(keys):
        hs = sorted((hashlib.md5(str(k).encode()).hexdigest()[:12], k) for k in set(keys))
        return hs[:16]

    def est(sk):
        return len(sk) if len(sk) < 16 else (15 * 2**48) // int(sk[-1][0], 16)

    sa, sb = sketch(ok), sketch(ck)
    su = sorted(set(sa) | set(sb))[:16]
    da, db, du = est(sa), est(sb), est(su)
    d_inter = max(da + db - du, 0)
    cks = set(ck)
    join_exact = sum(1 for k in ok if k in cks)
    join_est = round(float(d_inter) * (len(ok) / da) * (len(ck) / db))
    expect = (
        len(ok), len(ck), len(set(ok)), len(set(ck)), da, db, d_inter,
        join_exact, join_est,
    )
    got = [
        tuple(r)
        for r in all_queries()["q262_join_cardinality_sketch"].build(spark, SF_SMOKE).collect()
    ]
    assert got == [expect]
    assert join_exact == len(ok)  # FK totality on the synthetic data
    assert join_est <= 5 * join_exact and join_exact <= 5 * max(join_est, 1)
