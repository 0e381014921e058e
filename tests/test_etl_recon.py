"""Unit semantics for the reconciliation/resample operators beyond the
oracle gate: snapshot-diff classification edges and forward-fill gaps."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_migrator_spark.operators.etl import snapshot_diff
from database_migrator_spark.operators.temporal import resample_ffill


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "id long, v string"
    )
    got = {(r.change_type, r.id) for r in snapshot_diff(old, new, "id").collect()}
    assert got == {("changed", 2), ("removed", 3), ("added", 4)}


def test_snapshot_diff_identical_is_empty(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    assert snapshot_diff(df, df, "id").count() == 0


def test_snapshot_diff_duplicate_rows_bag_semantics(spark):
    # EXCEPT ALL keeps multiplicity: one of two identical rows removed
    # means the key CHANGED (cardinality differs), not unchanged
    old = spark.createDataFrame([(1, "a"), (1, "a")], "id long, v string")
    new = spark.createDataFrame([(1, "a")], "id long, v string")
    got = {(r.change_type, r.id) for r in snapshot_diff(old, new, "id").collect()}
    assert got == {("removed", 1)}


def test_resample_ffill_fills_interior_gaps(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:30:00", 10.0),
            (1, "2024-01-01 03:10:00", 30.0),  # hours 01,02 missing → filled
            (2, "2024-01-01 05:00:00", 50.0),
        ],
        "k long, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample_ffill(df, key="k", ts_col="ts", value_col=F.max("v"))
    rows = {(r.k, str(r.bucket_ts), r.value) for r in out.collect()}
    assert rows == {
        (1, "2024-01-01 00:00:00", 10.0),
        (1, "2024-01-01 01:00:00", 10.0),  # forward-filled
        (1, "2024-01-01 02:00:00", 10.0),  # forward-filled
        (1, "2024-01-01 03:00:00", 30.0),
        (2, "2024-01-01 05:00:00", 50.0),  # single-bucket key: no grid
    }


def test_resample_respects_non_default_step(spark):
    """Regression: bucketing must follow the step parameter — a
    hard-coded hourly trunc mis-bucketed every non-default step."""
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:05:00", 10.0),
            (1, "2024-01-01 00:20:00", 20.0),  # different 15-min bucket
            (1, "2024-01-01 01:05:00", 99.0),
        ],
        "k long, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample_ffill(df, key="k", ts_col="ts", value_col=F.max("v"), step="15 minutes")
    rows = {(str(r.bucket_ts), r.value) for r in out.collect()}
    assert rows == {
        ("2024-01-01 00:00:00", 10.0),
        ("2024-01-01 00:15:00", 20.0),
        ("2024-01-01 00:30:00", 20.0),  # filled
        ("2024-01-01 00:45:00", 20.0),  # filled
        ("2024-01-01 01:00:00", 99.0),
    }


def test_checksum_is_partition_order_independent(spark):
    from database_migrator_spark.plans.registry import all_queries

    from .conftest import SF_SMOKE

    q = all_queries()["q79_table_checksum"]
    a = q.build(spark, SF_SMOKE).collect()[0]
    # same data scanned through a different partitioning must give the
    # same checksum — integer addition commutes
    b = q.build(spark, SF_SMOKE).repartition(7).collect()[0]
    assert (a.n_rows, a.checksum) == (b.n_rows, b.checksum)
