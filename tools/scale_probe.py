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
    # full dedup/similarity family (round 2): text tiers + embedding tier
    "q45_embedding_near_duplicates",
    "q53_ivf_topk",
    "q54_char_ngram_jaccard",
    "q58_exact_text_dedup",
    "q66_minhash_verified_pairs",
    "q67_bmp_decode",
    # round-2 additions: clustering, reconciliation, temporal, skew
    "q70_salted_skew_join",
    "q72_neardup_components",
    "q73_resample_ffill",
    "q75_tfidf_top_terms",
    "q79_table_checksum",
    "q80_snapshot_diff",
    # round-3 additions: training-pipeline surface (chunking, repetition,
    # canonical pick, centroids, packing, PMI self-join, incremental
    # dedup, decontamination)
    "q87_token_window_chunks",
    "q88_repetition_score",
    "q90_canonical_docs",
    "q92_embedding_centroids",
    "q94_sequence_packing",
    "q96_cooccurrence_pmi",
    "q97_incremental_ingest_dedup",
    "q98_benchmark_decontamination",
    # round-4 additions: sketch top-k, pipeline composition, PNG decode
    "q99_quality_filter_yield",
    "q100_heavy_hitters",
    "q101_corpus_pipeline_report",
    "q102_png_decode",
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
    # index fits are ingest-time work — warm them so q53 times the QUERY,
    # mirroring bench.py
    from database_migrator_spark.operators.similarity import _ivf_index_cached

    _ivf_index_cached(spark, sf_dir)
    qs = all_queries()
    out = {}
    for name in PROBE_QUERIES:
        t0 = time.perf_counter()
        qs[name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 2)
    return out


def bucket_cap_stats(spark, sf_dir: str, max_bucket: int = 1000) -> dict:
    """How hard does the MinHash bucket cap work at this scale? Reports
    total band-buckets, buckets over the cap (dropped), and the largest
    bucket for BOTH shipped banding configs — q28's 16×4 and the
    verified pipeline's (q66/q72) 32×2, whose 2-row band hashes collide
    far more — the observability the 100 TB run needs to tune
    (bands, cap)."""
    from database_migrator_spark.operators.dedup import (
        lsh_bands,
        minhash_signature,
        tokens_of,
        word_shingles,
    )

    d = table(spark, sf_dir, "documents")
    sigs = (
        d.repartition(spark.sparkContext.defaultParallelism)
        .select(minhash_signature(word_shingles(tokens_of("text")), 64).alias("sig"))
        .localCheckpoint(eager=True)  # sketch once, band twice
    )
    out = {}
    for bands, rows in ((16, 4), (32, 2)):
        banded = (
            sigs.select(F.explode(lsh_bands(F.col("sig"), bands, rows)).alias("b"))
            .groupBy("b.band", "b.bh")
            .agg(F.count("*").alias("n"))
        )
        row = banded.agg(
            F.count("*").alias("n_buckets"),
            F.sum((F.col("n") > max_bucket).cast("long")).alias("n_capped"),
            F.max("n").alias("max_bucket_size"),
        ).first()
        out[f"{bands}x{rows}"] = {
            "n_buckets": row["n_buckets"],
            "n_capped_dropped": row["n_capped"],
            "max_bucket_size": row["max_bucket_size"],
            "cap": max_bucket,
        }
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
        report["minhash_bucket_cap"] = {
            "sf0.1": bucket_cap_stats(spark, SRC_SF),
            "sf1": bucket_cap_stats(spark, tmp),
        }
        print(json.dumps(report, indent=2))
    finally:
        if not keep:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
