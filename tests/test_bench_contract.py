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
    """Round 10: the 50-row gate must spend its budget on (a) every
    NEVER-GATED query — round-10 additions (q234+) plus q59, whose
    oracle was upgraded from rows-only to a batch-equivalence hash this
    round (a semantic change: its r06 row no longer certifies the new
    contract) — then (b) the r05-stale RESIDUE in name order (q112-q114,
    q116-q118, q120-q143, q51/q94/q96 — the 33 names whose newest driver
    row still dates to round 5), then (c) the r06-gated block topping up
    the window. q01-q37/q145-q158 (r07), q38-q50/q159-q195 (r08) and
    q100-q111/q196-q233 (r09, the freshest rows) queue last. Pinning
    the exact first-50 list (not just the set) so a refactor cannot
    silently reorder the gate. The rank-0 cap keeps all 33 stale rows
    plus at least a few r06 refreshes inside the window."""
    names = list(all_queries())
    gate = [n.split("_", 1)[0] for n in names[:50]]
    never_gated = sorted(
        n.split("_", 1)[0]
        for n in names
        if n.split("_", 1)[0] in ({f"q{i}" for i in range(234, 250)} | {"q59"})
    )
    n_new = len(never_gated)
    assert n_new <= 17, "rank-0 additions would starve the r05-stale refresh"
    assert gate[:n_new] == never_gated
    # later round-10 additions (q250+) must queue OUTSIDE the full
    # 50-row window — first in line for the post-r10-gate rotation —
    # never displacing a stale row
    queued = {
        n.split("_", 1)[0] for n in names if n.split("_", 1)[0] in {f"q{i}" for i in range(250, 280)}
    }
    if queued:
        post_window = [n.split("_", 1)[0] for n in names[50:]]
        assert post_window[: len(queued)] == sorted(queued)
    r05_stale = sorted(
        ({f"q{i}" for i in range(112, 144)} - {"q115", "q119"}) | {"q51", "q94", "q96"}
    )
    assert len(r05_stale) == 33
    assert gate[n_new : n_new + 33] == r05_stale
    # the r06 block fills the remaining rows in name order
    r06_fresh = sorted(
        ({f"q{i:02d}" for i in range(52, 100)} - {"q59", "q94", "q96"})
        | {"q115", "q119", "q144"}
    )
    assert gate[n_new + 33 :] == r06_fresh[: 50 - n_new - 33]
    # every freshly-gated block sorts after the 50-row window
    tail = {n.split("_", 1)[0] for n in names[50:]}
    assert set(r06_fresh[50 - n_new - 33 :]) <= tail
    assert {"q01", "q02", "q37", "q38", "q50", "q100", "q111", "q145", "q159", "q196", "q233"} <= tail
