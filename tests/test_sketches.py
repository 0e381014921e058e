"""Accuracy tests for the approximate-sketch operators: the estimates
must land within tight relative error of exact ground truth, and merged
sketches must agree with a direct global sketch — the mergeability
property that makes sketch rollups valid at scale."""

from __future__ import annotations

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
