#!/usr/bin/env python
"""Semantic-degeneracy audit: hash-green is not alive.

Twice (q305 draft, q304 shipped) a query was hash-green yet VACUOUS, and
the r14 run of this sweep found seven more whose core machinery never
fired at any SF (kappa ≡ 0, RBO ≡ 0, zero remainders/outliers/blocked
funnels, constant cosine).  The nonzero-rows guard
(tests/test_nonzero_rows.py) catches EMPTY outputs; this audit catches
the subtler class — non-empty outputs whose signal columns are all-NULL
or constant.

It runs every DuckDB oracle at the given SF (DuckDB-side only: the hash
gate certifies the oracle IS the query's semantics) and reports, per
query: columns that are entirely NULL (almost always a bug) and columns
constant across ≥5 rows (often benign — uniform synthetic data yields
constant n_docs/n_hours/zero-orphan audits — but every flag deserves one
eyeball; the seven r14 fixes all came from this list).  Run it after
adding queries; the per-query liveness pins live in
tests/test_semantic_liveness.py.

Usage: python tools/degeneracy_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def audit(sf_dir: str) -> dict:
    from database_migrator_spark.plans.registry import all_queries
    from tests.conftest import register_duck_views
    from tests.test_oracle import _SF01_EXCLUDED_QIDS

    con = duckdb.connect()
    register_duck_views(con, sf_dir)
    big_sf = "sf0.1" in sf_dir or "sf1" in sf_dir
    all_null, constant, errors = [], [], []
    for name, dq in all_queries().items():
        if dq.oracle is None:
            continue
        if big_sf and name.split("_", 1)[0] in _SF01_EXCLUDED_QIDS:
            continue  # O(N^2) brute-force oracles are sf0.01-only (CLAUDE.md)
        try:
            df = con.execute(dq.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            errors.append({"query": name, "error": str(e)[:200]})
            continue
        if len(df) == 0:
            continue  # the nonzero-rows guard owns emptiness
        for c in df.columns:
            col = df[c]
            if col.isna().all():
                all_null.append({"query": name, "column": c, "rows": len(df)})
            elif len(df) >= 5 and col.nunique(dropna=False) == 1:
                constant.append(
                    {"query": name, "column": c, "value": repr(col.iloc[0])}
                )
    return {"sf_dir": sf_dir, "all_null": all_null, "constant": constant, "errors": errors}


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    print(json.dumps(audit(sf), indent=1))
