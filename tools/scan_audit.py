#!/usr/bin/env python
"""Corpus-rescan audit: count FileScan nodes per declared query plan.

A branch that re-derives a shared subtree re-SCANS the corpus per
reference (Catalyst only reuses exchanges with identical canonical
forms, which per-branch projections usually break). Round 7 used this
sweep to find and fix q80 (24 scans -> diff-checkpoints), q60 (8 ->
MERGE-style join checkpoint), q164 (4 -> bounded cells checkpoint),
q152 (6 -> single-pass k-explode), q170-q172 (shared dense-grid
checkpoint), q96 (7 -> checkpointed vocab counts + pruned token
stream), q103 (4 -> margins re-aggregated from one checkpointed
(source, tok) count table), q121 (4 -> checkpointed 16-byte digests)
and q119 (4 -> (source, gram) set built from the shared 8-gram ingest
artifact and checkpointed). Remaining multi-scan plans and why they
stand:

- q53 (6): partition-PRUNED reads of the persisted IVF index — each
  "scan" touches only the probed cluster partitions, by design.
- q04 (4): a star join — four DIFFERENT tables, one scan each.
- q101 (4): the composed pipeline's stage checkpoints already bound
  re-derivation; the residual scans are per-stage column-pruned reads.
- 3-scan group (q75/q108/q125/q128/q136/q61): two-aggregate + join
  shapes; one extra pruned scan each, not worth a corpus-sized
  materialization.
- q214 (7): the FK audit spans SIX different tables (events, lineitem,
  orders, customer, part, supplier) — one scan per table side, like q04.
- q224 (6): six independent FD candidates, each a column-pruned scan of
  exactly its X∪Y columns — a profiling batch scans per candidate by
  design.
- q219 (3): the indexed/batch/anti sides all derive from ONE table only
  because the demo splits it by vec_id%k; in production they are
  different datasets (persisted index + arriving batch), one scan each.

Usage: python tools/scan_audit.py [min_scans] 2>/dev/null
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from database_migrator_spark.plans.registry import all_queries  # noqa: E402
from database_migrator_spark.session import get_session  # noqa: E402

SF = "/root/testdata/sf0.001"


def main() -> None:
    min_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_session("scan-audit")
    rows = []
    for name, dq in all_queries().items():
        if any(t in dq.tags for t in ("streaming", "udtf")):
            continue
        try:
            p = (
                dq.build(spark, SF)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # pragma: no cover
            print(f"{name}\tERROR {type(e).__name__}")
            continue
        n = p.count("FileScan")
        if n >= min_scans:
            rows.append((n, name))
    for n, name in sorted(rows, reverse=True):
        print(f"{name}\t{n}")


if __name__ == "__main__":
    main()
