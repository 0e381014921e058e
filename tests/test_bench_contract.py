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
    """The emitted bench line must stay under the 1900-char budget that
    keeps it inside the driver's 2000-char stdout tail. At 168+ benched
    queries (round 7) the FULL per-query map no longer fits even at one
    decimal, so bench.py's own rule — truncate to the slowest-60 map —
    is now the NORMAL emission path, not just the degradation path;
    the full-name 4-decimal map lives in committed bench_full.json.
    This test replays bench.py's decision procedure on (a) the realistic
    all-9.9s regime and (b) the pathological 999.9s-plus-failures
    regime and asserts the FINAL line fits in both."""
    qs = all_queries()
    benched = [n.split("_", 1)[0] for n, dq in qs.items() if dq.bench]

    def emitted_line(per_query: float, with_failures: bool) -> str:
        short = {k: per_query for k in benched}
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
        failures = {f"q{i:02d}": "X" * 80 for i in range(99)} if with_failures else {}
        if failures:
            out["failures"] = failures
        line = json.dumps(out, separators=(",", ":"))
        if len(line) > 1900:  # bench.py's truncation rule, replayed
            out["queries"] = dict(
                sorted(short.items(), key=lambda kv: -kv[1])[:60]
            )
            out["queries_truncated_to_slowest"] = 60
            if failures:
                out["n_failures"] = len(failures)
                out["failures"] = {k: v[:40] for k, v in list(failures.items())[:8]}
            line = json.dumps(out, separators=(",", ":"))
            if len(line) > 1900:
                out["queries"] = {}
                out.pop("failures", None)
                line = json.dumps(out, separators=(",", ":"))
        return line

    for per_query, with_failures in ((9.9, False), (999.9, True)):
        line = emitted_line(per_query, with_failures)
        assert len(line) < 1900, (
            f"emitted bench line would be {len(line)} chars "
            f"(per_query={per_query}, failures={with_failures})"
        )


def test_gate_order_front_loads_stale_signal_set():
    """Round 9: the 50-row gate must spend its budget on (a) every
    NEVER-GATED query — the round-8 overflow q196-q217 plus round-9
    additions (q218+), which have only local sf0.001/0.01/0.1 oracle
    evidence — then (b) the r05-stale set in name order (q115/q119 were
    re-gated r06).  The r05 residue is the round-10 lead, then the
    r06-gated block; q01-q37 (r07) and q38-q50/q159-q195 (r08, the
    freshest rows) queue last.  Pinning the exact first-50 list (not
    just the set) so a refactor cannot silently reorder the gate.  The
    rank-0 cap trades new-operator hard signal against stale-row
    refresh: at 36 never-gated names 14 stale rows still re-gate, and
    every stale name has an r05 green row and three local oracle scales
    behind it — past 38 the refresh starves and additions must wait a
    round."""
    names = list(all_queries())
    gate = [n.split("_", 1)[0] for n in names[:50]]
    never_gated = sorted(
        n.split("_", 1)[0] for n in names if n.split("_", 1)[0] in {f"q{i}" for i in range(196, 240)}
    )
    n_new = len(never_gated)
    assert n_new <= 38, "rank-0 additions would starve the r05-stale refresh"
    assert gate[:n_new] == never_gated
    r05_stale = sorted(
        ({f"q{i}" for i in range(100, 144)} - {"q115", "q119"}) | {"q51", "q94", "q96"}
    )
    assert gate[n_new:] == r05_stale[: 50 - n_new]
    # the r05 residue and every freshly-gated block sort after the
    # 50-row window
    tail = {n.split("_", 1)[0] for n in names[50:]}
    assert set(r05_stale[50 - n_new :]) <= tail
    assert {"q01", "q02", "q37", "q38", "q50", "q52", "q99", "q115", "q119", "q144", "q159", "q195"} <= tail
