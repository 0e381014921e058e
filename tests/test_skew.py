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
