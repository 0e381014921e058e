"""Accuracy tests for the approximate-sketch operators: the estimates
must land within tight relative error of exact ground truth, and merged
sketches must agree with a direct global sketch — the mergeability
property that makes sketch rollups valid at scale."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from database_migrator_spark.plans.registry import all_queries
from database_migrator_spark.sources import table

from .conftest import SF_SMOKE


def test_hll_union_estimates_close_to_exact(spark):
    out = {
        r["event_type"]: r["approx_users"]
        for r in all_queries()["q95_hll_sketch_union"].build(spark, SF_SMOKE).collect()
    }
    e = table(spark, SF_SMOKE, "events")
    exact_by_type = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact_all = e.agg(F.countDistinct("user_id").alias("n")).collect()[0]["n"]
    for etype, exact in exact_by_type.items():
        assert abs(out[etype] - exact) <= max(2, 0.05 * exact), etype
    assert abs(out["__all__"] - exact_all) <= max(2, 0.05 * exact_all)


@pytest.mark.parametrize(
    "sf_dir",
    sorted(
        {SF_SMOKE, os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")}
    ),
)
def test_heavy_hitters_lossless_regime_holds(spark, sf_dir):
    """q100's hash-match against the exact oracle is only valid while the
    corpus vocabulary fits the sketch tracker — assert that precondition
    AT THE DRIVER GATE SCALE (SPARK_GRAFT_TEST_SF, default sf0.01) as
    well as the smoke dir, so regenerated testdata with a larger
    vocabulary fails loudly instead of silently flipping q100 to
    approximate counts; and that the sketch output equals the exact
    top-10."""
    d = table(spark, sf_dir, "documents")
    from database_migrator_spark.operators.dedup import tokens_of

    toks = d.select(F.explode(tokens_of("text")).alias("term"))
    vocab = toks.distinct().count()
    assert vocab < 10000, "vocabulary outgrew maxItemsTracked - q100 no longer lossless"
    exact = (
        toks.groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(10)
        .collect()
    )
    sketch = all_queries()["q100_heavy_hitters"].build(spark, sf_dir).collect()
    assert [tuple(r) for r in sketch] == [tuple(r) for r in exact]


def test_hll_merged_equals_direct_global_sketch(spark):
    """Union-of-partial-sketches must estimate the same as one sketch
    over the raw column — the lossless-merge contract."""
    e = table(spark, SF_SMOKE, "events")
    direct = (
        e.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n"))
        .collect()[0]["n"]
    )
    merged = (
        e.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .collect()[0]["n"]
    )
    assert merged == direct


def test_approx_count_distinct_within_rsd(spark):
    """q14's HLL++ estimate must sit within a few relative standard
    deviations of the exact distinct count (rsd=0.01 requested)."""
    from database_migrator_spark.sources import table as _t

    o = _t(spark, SF_SMOKE, "orders")
    exact = o.select("o_custkey").distinct().count()
    approx = all_queries()["q14_approx_count_distinct"].build(spark, SF_SMOKE).first()[
        "approx_custs"
    ]
    assert abs(approx - exact) / exact <= 0.05  # 5 sigma at rsd=0.01


def test_approx_quantiles_bracketed_by_exact_neighbors(spark):
    """q62's sketch percentiles must land within the exact [p-1%, p+1%]
    value bracket per group — the rank-error contract of the sketch at
    accuracy 10000 (max rank error N/10000 << 1% of N here)."""
    from pyspark.sql import functions as F

    from database_migrator_spark.sources import table as _t

    o = _t(spark, SF_SMOKE, "orders")
    rows = all_queries()["q62_approx_quantiles"].build(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            lo, hi = (
                o.where(F.col("o_orderstatus") == r.o_orderstatus)
                .agg(
                    F.expr(
                        f"percentile(o_totalprice, {max(p - 0.01, 0.0)})"
                    ).alias("lo"),
                    F.expr(
                        f"percentile(o_totalprice, {min(p + 0.01, 1.0)})"
                    ).alias("hi"),
                )
                .first()
            )
            assert lo <= getattr(r, col) <= hi, (r.o_orderstatus, col)


def test_hll_rho_matches_python_reference(spark):
    """q223's hex-string rho (leading zero bits of the 48-bit tail + 1)
    must equal an independent pure-Python computation over real md5
    hashes — the register content IS the sketch, an off-by-one here
    biases every estimate 2x."""
    import hashlib

    from pyspark.sql import functions as F

    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    e = table(spark, SF_SMOKE, "events").select("user_id").distinct().limit(200)
    h = F.md5(F.col("user_id").cast("string"))
    rest = F.expr("trim(LEADING '0' FROM h12)")
    d = F.substring(rest, 1, 1)
    extra = (
        F.when(d == "1", 3)
        .when(d.isin("2", "3"), 2)
        .when(d.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(rest == "", 49).otherwise(4 * (12 - F.length(rest)) + extra + 1)
    got = {
        r.user_id: r.rho
        for r in e.select("user_id", F.substring(h, 3, 12).alias("h12"))
        .select("user_id", rho.alias("rho"))
        .collect()
    }
    for uid, spark_rho in got.items():
        hx = hashlib.md5(str(uid).encode()).hexdigest()
        v = int(hx[2:14], 16)
        want = 49 if v == 0 else 49 - v.bit_length()  # leading zeros + 1
        assert spark_rho == want, (uid, hx, spark_rho, want)


def test_hll_all_row_equals_direct_global_sketch(spark):
    """q223's 'ALL' row is built by MERGING per-type registers
    (register-wise MAX). HLL merge is lossless, so it must equal the
    sketch computed directly over the un-partitioned stream — rebuild
    the global registers from scratch and compare the estimate."""
    import hashlib
    from collections import defaultdict

    from database_migrator_spark.operators.bitmapops import _HLL_K_NUM, _HLL_M
    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    rows = {
        r.scope: r
        for r in all_queries()["q223_hll_register_fidelity"].build(spark, SF_SMOKE).collect()
    }
    regs = defaultdict(int)
    for r in table(spark, SF_SMOKE, "events").select("user_id").collect():
        hx = hashlib.md5(str(r.user_id).encode()).hexdigest()
        b = int(hx[:2], 16)
        v = int(hx[2:14], 16)
        rho = 49 if v == 0 else 49 - v.bit_length()
        regs[b] = max(regs[b], rho)
    s = sum(2 ** (49 - regs[j]) for j in range(_HLL_M))
    v_empty = sum(1 for j in range(_HLL_M) if regs[j] == 0)
    raw = _HLL_K_NUM / s
    import math

    est = _HLL_M * math.log(_HLL_M / v_empty) if (raw <= 2.5 * _HLL_M and v_empty > 0) else raw
    assert rows["ALL"].hll_estimate == round(est * 1e6) / 1e6
    assert rows["ALL"].n_empty_registers == v_empty
    # sanity: the estimator lands within 20% of truth at this scale
    assert abs(rows["ALL"].rel_err) < 0.2


def test_kmv_all_row_equals_direct_global_sketch(spark):
    """q221's 'ALL' row merges per-type bottom-16 sets; KMV merge is
    lossless (every global bottom-16 hash is in its own type's
    bottom-16 — if 16 hashes in a type were smaller, the candidate
    could not be global top-16), so it must equal the sketch computed
    directly over the global distinct-user set."""
    import hashlib

    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    rows = {
        r.scope: r
        for r in all_queries()["q221_kmv_distinct_fidelity"].build(spark, SF_SMOKE).collect()
    }
    users = sorted(
        {r.user_id for r in table(spark, SF_SMOKE, "events").select("user_id").collect()}
    )
    hs = sorted(
        (hashlib.md5(str(u).encode()).hexdigest()[:12], u) for u in users
    )
    k = 16
    if len(hs) < k:
        want = len(hs)
    else:
        want = (15 * 2**48) // int(hs[k - 1][0], 16)
    assert rows["ALL"].kmv_estimate == want
    assert rows["ALL"].n_exact == len(users)
