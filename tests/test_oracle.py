"""The declared-query corpus vs the DuckDB oracle (the driver's t2 gate,
run here at sf0.001 for speed; set SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
to reproduce the driver's exact scale)."""

from __future__ import annotations

import os

import pytest

from database_migrator_spark.plans.registry import all_queries

from .conftest import SF_SMOKE

SF = os.environ.get("SPARK_GRAFT_TEST_SF", SF_SMOKE)

_QUERIES = all_queries()
_WITH_ORACLE = [name for name, dq in _QUERIES.items() if dq.oracle is not None]
_ROWS_ONLY = [name for name, dq in _QUERIES.items() if dq.oracle is None]


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_matches_duckdb_oracle(spark, duck, name):
    from .conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, _QUERIES[name], SF)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = _QUERIES[name].build(spark, SF)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
