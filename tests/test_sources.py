"""Write-side + JDBC plane: partitioned parquet round-trip with partition
pruning, bucketed tables, and a JDBC round-trip over the embedded Derby
driver (E20 — the reference's I/O plane)."""

from __future__ import annotations

import uuid

import pytest

from pyspark.sql import functions as F

from database_migrator_spark.sources import table
from database_migrator_spark.sources.sink import (
    derby_url,
    read_jdbc,
    write_jdbc,
    write_partitioned_parquet,
)

from .conftest import SF_SMOKE


def test_partitioned_parquet_roundtrip_and_pruning(spark, tmp_path):
    e = table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "events_by_type")
    write_partitioned_parquet(e, out, ["event_type"])
    back = spark.read.parquet(out)
    assert back.count() == e.count()
    pruned = back.where(F.col("event_type") == "click")
    assert pruned.count() == e.where(F.col("event_type") == "click").count()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]


def test_jdbc_roundtrip_derby(spark, tmp_path):
    url = derby_url(str(tmp_path / "jdbc_db"))
    src = table(spark, SF_SMOKE, "nation")
    write_jdbc(src, url, "nation_copy")
    back = read_jdbc(spark, url, "nation_copy")
    assert back.count() == 25
    assert sorted(back.columns) == sorted(src.columns)
    # parallel partitioned read path
    par = read_jdbc(
        spark, url, "nation_copy", partition_column="n_nationkey", lower=0, upper=25,
        num_partitions=4,
    )
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == 25


def test_jdbc_ledger(spark, tmp_path):
    from database_migrator_spark.migrator.ledger import JdbcLedger

    url = derby_url(str(tmp_path / "ledger_db"))
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    ledger = JdbcLedger(spark, url, "applied_migration", props)
    assert not ledger.exists()
    spark.createDataFrame([("00-bootstrap",)], "migration string").write.jdbc(
        url, "applied_migration", properties=props
    )
    ledger.record("01-first")
    assert ledger.exists()
    got = sorted(r.migration for r in ledger.applied_df().collect())
    assert got == ["00-bootstrap", "01-first"]


def test_scratch_sweeps_dead_pid_roots(tmp_path, monkeypatch):
    """A SIGKILLed run can't fire atexit; its scratch root must be swept
    by the NEXT process's first scratch_dir call (keyed by dead pid),
    while the live process's own root and foreign files survive."""
    import database_migrator_spark.scratch as scratch

    monkeypatch.setattr(scratch.tempfile, "gettempdir", lambda: str(tmp_path))
    monkeypatch.setattr(scratch, "_ROOT", None)
    # a dead process's leftover root: pid 2**22+5 is above linux pid_max
    # defaults and certainly not alive here
    dead = tmp_path / f"{scratch._PREFIX}4194309"
    dead.mkdir()
    (dead / "q149_out_abc").mkdir()
    foreign = tmp_path / "unrelated_dir"
    foreign.mkdir()

    d1 = scratch.scratch_dir("probe", "k1")
    assert not dead.exists(), "stale dead-pid root must be swept"
    assert foreign.exists(), "non-scratch dirs must be untouched"
    # same key -> same path; our own root is pid-keyed and intact
    assert scratch.scratch_dir("probe", "k1") == d1
    import os

    assert str(tmp_path / f"{scratch._PREFIX}{os.getpid()}") in d1
