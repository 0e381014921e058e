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
