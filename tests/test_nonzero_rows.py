"""Catalog-wide degenerate-output guard (VERDICT r13 item 2).

Twice a hash-green query shipped semantically VACUOUS — q305's first
draft (every synthetic user clicks, so every DiD cell was NULL) and q304
as shipped (_MOBILITY_SPLIT_YEAR=1994 predated the 1995-2001 orders, so
the mobility matrix was 0 rows at every SF while both engines hash-
matched on emptiness).  This test makes the lesson structural: every
oracle-bearing query must return > 0 rows at AT LEAST ONE of the three
driver scale factors, or carry an annotated entry in the allowlist
below.

The check runs the DUCKDB ORACLE only — it is the same semantics the
hash gate certifies (a query and its oracle are hash-matched, so
"oracle empty everywhere" == "query empty everywhere"), and DuckDB-only
keeps the whole catalog sweep to seconds instead of a second full Spark
pass.  Escalation is lazy: sf0.001 first, then sf0.01, then sf0.1 —
only queries empty at the smaller SFs pay for the larger ones, and the
O(N²) brute-force oracles (sf0.01-only per CLAUDE.md) never escalate to
sf0.1.
"""

from __future__ import annotations

import duckdb
import pytest

from database_migrator_spark.plans.registry import all_queries

from .conftest import register_duck_views
from .test_oracle import _SF01_EXCLUDED_QIDS

_QS = all_queries()
_WITH_ORACLE = [n for n, dq in _QS.items() if dq.oracle is not None]

_SF_LADDER = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# Genuinely-empty-everywhere demos go here with a justification string.
# Empty is the DESIGN GOAL for none of the current 300 — keep it that way.
_EMPTY_OK: dict[str, str] = {}

_CONS: dict[str, duckdb.DuckDBPyConnection] = {}


def _con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    if sf_dir not in _CONS:
        con = duckdb.connect()
        register_duck_views(con, sf_dir)
        _CONS[sf_dir] = con
    return _CONS[sf_dir]


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_nonempty_at_some_sf(name):
    qid = name.split("_", 1)[0]
    if qid in _EMPTY_OK:
        pytest.skip(f"annotated empty-OK: {_EMPTY_OK[qid]}")
    ladder = _SF_LADDER[:-1] if qid in _SF01_EXCLUDED_QIDS else _SF_LADDER
    counts = {}
    for sf_dir in ladder:
        n = _con(sf_dir).execute(
            f"SELECT COUNT(*) FROM ({_QS[name].oracle})"
        ).fetchone()[0]
        counts[sf_dir.rsplit('/', 1)[-1]] = n
        if n > 0:
            return
    raise AssertionError(
        f"{name}: oracle returns 0 rows at every probed SF ({counts}) — "
        "hash-green emptiness is the q304 failure mode; fix the query's "
        "constants or add an annotated _EMPTY_OK entry"
    )
