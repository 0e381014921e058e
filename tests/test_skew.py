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
