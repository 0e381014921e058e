#!/usr/bin/env python
"""Scale probe: would these plans survive 10×?

Synthesizes ~sf1 data (10× sf0.1: lineitem ≈ 6M rows, orders ≈ 1.5M,
documents ≈ 100K with fresh ids) as *multi-file* parquet in /tmp, then runs
the headline queries and the sketch pipelines, printing per-query seconds
at sf0.1 vs sf~1. Linear-ish scaling + no failures = the partition strategy
holds; anything super-linear is a red flag to fix.

Usage: python tools/scale_probe.py [--keep]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from database_migrator_spark.plans.registry import all_queries  # noqa: E402
from database_migrator_spark.session import get_session  # noqa: E402
from database_migrator_spark.sources import TABLES, table  # noqa: E402

SRC_SF = "/root/testdata/sf0.1"
COPIES = 10
PROBE_QUERIES = [
    "q01_scan_filter_project",
    "q02_pricing_summary",
    "q04_star_join_revenue",
    "q07_window_top_orders_per_customer",
    "q23_asof_join_last_order",
    "q24_sessionize",
    "q25_exact_dedup",
    "q28_minhash_near_duplicates",
    "q29_simhash_near_duplicates",
    "q34_cosine_topk",
    "q52_range_join_followup_events",
]

# key columns to shift per copy so replicated rows stay distinct entities
SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def synthesize(spark, out_dir: str) -> None:
    for name in TABLES:
        src = table(spark, SRC_SF, name)
        if name in SHIFT:
            n = src.count()
            parts = []
            for i in range(COPIES):
                df = src
                for col in SHIFT[name]:
                    df = df.withColumn(col, F.col(col) + F.lit(i * n * 10))
                parts.append(df)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = src  # dims keep their key space
        out.repartition(16).write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def run(spark, sf_dir: str) -> dict[str, float]:
    qs = all_queries()
    out = {}
    for name in PROBE_QUERIES:
        t0 = time.perf_counter()
        qs[name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 2)
    return out


def main() -> None:
    keep = "--keep" in sys.argv
    spark = get_session("scale-probe")
    base = run(spark, SRC_SF)
    tmp = tempfile.mkdtemp(prefix="sf1_probe_")
    try:
        t0 = time.perf_counter()
        synthesize(spark, tmp)
        print(f"# synthesized ~sf1 in {time.perf_counter()-t0:.1f}s at {tmp}", file=sys.stderr)
        big = run(spark, tmp)
        report = {
            q: {"sf0.1": base[q], "sf1": big[q],
                "ratio": round(big[q] / base[q], 1) if base[q] > 0 else None}
            for q in PROBE_QUERIES
        }
        print(json.dumps(report, indent=2))
    finally:
        if not keep:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
