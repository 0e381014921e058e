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
    inside the driver's 2000-char stdout tail: (a) in the NORMAL regime
    (every benched query under 10 s — true of every recorded run; the
    bench total would read ~20 min before this breaks) the FULL
    per-query map fits; (b) past that, bench.py truncates to the
    slowest-60 map, and that fallback line must fit even in the
    pathological all-999.9s-plus-failures case. (Round 6: the 150-query
    catalog moved the driver line to 1-DECIMAL per-query values —
    bench_full.json keeps 4 decimals — restoring the sub-10s-regime
    headroom; the degradation path stays pinned.)"""
    qs = all_queries()
    short = {n.split("_", 1)[0]: 9.9 for n, dq in qs.items() if dq.bench}
    out = {
        "metric": "total_wall_sec_declared_queries",
        "value": 9999.99,
        "unit": "sec",
        "queries": short,
        "sf": 0.1,
        "n_queries": len(short),
        "ingest": {
            "ivf_fit": 99.99,
            "bpe_fit": 99.99,
            "pq_fit": 99.99,
            "cc_fit": 99.99,
            "gram_fit": 99.99,
        },
    }
    line = json.dumps(out, separators=(",", ":"))
    assert len(line) < 1900, (
        f"bench line would be {len(line)} chars; the registry has grown past "
        "what the driver's 2000-char tail window can carry — shrink keys or "
        "trim the benched set"
    )
    # pathological case: 999.9s timings + failures → bench.py truncates
    # to the slowest 60; that fallback line must also fit
    fallback = dict(out)
    fallback["queries"] = dict(list({k: 999.9 for k in short}.items())[:60])
    fallback["queries_truncated_to_slowest"] = 60
    fallback["n_failures"] = 99
    fallback["failures"] = {f"q{i:02d}": "X" * 40 for i in range(8)}
    fline = json.dumps(fallback, separators=(",", ":"))
    assert len(fline) < 1900, f"fallback bench line would be {len(fline)} chars"


def test_gate_order_front_loads_stale_signal_set():
    """Round 7: the 50-row gate must spend its budget on (a) q145-q158 —
    the 13 round-6 additions that have never had a driver row, plus the
    new q158 (q153's re-parenthesized oracle and q157's per-user cap are
    semantic changes inside that same set) — then (b) the first 36 of
    q02-q50 (q02-q37), whose rows date to r04, the catalog's oldest hard
    signal. q38-q50 are the round-8 residue; q01 (re-gated r06) and the
    r05/r06-gated blocks queue last.  Pinning the exact first-50 list
    (not just the set) so a refactor cannot silently reorder the gate."""
    names = list(all_queries())
    round7_new = {f"q{i}" for i in range(145, 159)}
    gate = [n.split("_", 1)[0] for n in names[:50]]
    assert gate[:14] == sorted(round7_new)
    assert gate[14:] == [f"q{i:02d}" for i in range(2, 38)]
    # the r8 residue (q38-q50), q01, and the r05/r06-gated blocks must
    # all sort after the 50-row window
    tail = {n.split("_", 1)[0] for n in names[50:]}
    assert {f"q{i}" for i in range(38, 51)} <= tail
    assert {"q01", "q51", "q94", "q96", "q100", "q143", "q52", "q99"} <= tail
