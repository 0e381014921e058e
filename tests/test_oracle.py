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


# ---------------------------------------------------------------------------
# sf0.1 sweep — the pre-ship check CLAUDE.md mandates ("two bugs only
# surfaced at sf0.1": double-sum magnitudes, Spark SQL decimal literals),
# automated per the round-6 verdict. Opt-in because it takes several
# minutes: SPARK_GRAFT_SF01_SWEEP=1 python -m pytest tests/test_oracle.py -k sf01 -q
# Excludes the queries whose DuckDB oracles are O(N^2) brute force /
# recursive CTEs that only finish at sf0.01 (enumerated in CLAUDE.md);
# those are cross-checked at sf0.1 by Spark-side brute force and
# convergence probes instead (tests/test_dedup.py, tests/test_similarity.py).
# ---------------------------------------------------------------------------

SF01 = "/root/testdata/sf0.1"
_SF01_EXCLUDED_QIDS = {
    "q66",
    "q72",
    "q90",
    "q101",
    "q115",
    "q127",
    "q146",
    "q182",
    "q210",
}
_SF01_QUERIES = [
    n for n in _WITH_ORACLE if n.split("_", 1)[0] not in _SF01_EXCLUDED_QIDS
]

_sf01_enabled = os.environ.get("SPARK_GRAFT_SF01_SWEEP") == "1"


@pytest.mark.skipif(not _sf01_enabled, reason="set SPARK_GRAFT_SF01_SWEEP=1")
@pytest.mark.parametrize("name", _SF01_QUERIES)
def test_matches_duckdb_oracle_sf01(spark, duck, name):
    from .conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, _QUERIES[name], SF01)
