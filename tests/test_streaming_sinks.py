"""foreachBatch exactly-once sink + parquet compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_migrator_spark.sources import events_stream, table
from database_migrator_spark.sources.sink import compact_parquet
from database_migrator_spark.streaming.sinks import foreach_batch_parquet

from .conftest import SF_SMOKE


def test_foreach_batch_parquet_roundtrip(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = events_stream(spark, SF_SMOKE).where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value"
    )
    q = foreach_batch_parquet(rows, out, ckpt)
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    back = spark.read.parquet(out)
    batch = (
        table(spark, SF_SMOKE, "events")
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )
    got = {(r.event_id, r.user_id, r.value) for r in back.select("event_id", "user_id", "value").collect()}
    want = {(r.event_id, r.user_id, r.value) for r in batch.collect()}
    assert got == want  # every row exactly once across batch dirs


def test_compact_parquet_reduces_files(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    # fragment: 64 tiny files
    table(spark, SF_SMOKE, "lineitem").repartition(64).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/*.parquet")) >= 64
    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, out, target_file_mb=128)
    assert n == 1  # sf0.001 lineitem ≪ 128 MB
    assert len(glob.glob(f"{out}/*.parquet")) == 1
    assert spark.read.parquet(out).count() == table(spark, SF_SMOKE, "lineitem").count()


def test_compact_parquet_range_clusters_files(spark, tmp_path):
    """q135's layout contract: with range_col the compacted files cover
    DISJOINT key ranges (zone-map layout — parquet min/max stats then
    prune point scans to one file), and the round-trip loses nothing."""
    import glob

    src = str(tmp_path / "fragmented")
    li = table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    li.repartition(64).write.parquet(src)
    out = str(tmp_path / "compacted")
    # tiny target forces multiple output files at sf0.001
    n = compact_parquet(spark, src, out, target_file_mb=0.02, range_col="l_orderkey")
    files = sorted(glob.glob(f"{out}/*.parquet"))
    assert n >= 3 and len(files) == n
    spans = []
    for f in files:
        r = spark.read.parquet(f).agg(
            F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi")
        ).collect()[0]
        if r.lo is not None:
            spans.append((r.lo, r.hi))
    spans.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"file ranges overlap: ({lo1},{hi1}) vs ({lo2},..)"
    assert spark.read.parquet(out).count() == li.count()


def test_propagate_deletes_rewrites_only_affected_files(spark, tmp_path):
    """q137's planning contract: with keys range-clustered, a localized
    delete set rewrites ONLY the files whose min/max span it; untouched
    files stay byte-identical on disk, and the final dataset equals the
    logical anti-join."""
    import glob
    import os

    from database_migrator_spark.sources.sink import propagate_deletes

    v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    df = spark.range(0, 400).select(
        F.col("id").alias("row_id"), (F.col("id") % 100).alias("k")
    )
    (df.repartitionByRange(4, "k").sortWithinPartitions("k")
       .write.mode("overwrite").parquet(v1))
    files_before = {
        f: os.path.getmtime(f) for f in glob.glob(f"{v1}/*.parquet")
    }
    assert len(files_before) == 4
    deletes = spark.createDataFrame([(5,)], "k long")  # lives in ONE file
    final, n_aff, n_files = propagate_deletes(spark, v1, v2, deletes, "k")
    assert n_files == 4 and n_aff == 1
    # untouched v1 files not rewritten in place
    assert {
        f: os.path.getmtime(f) for f in glob.glob(f"{v1}/*.parquet")
    } == files_before
    got = {(r.row_id, r.k) for r in final.collect()}
    want = {(r.row_id, r.k) for r in df.where(F.col("k") != 5).collect()}
    assert got == want


def test_propagate_deletes_noop_when_no_key_matches(spark, tmp_path):
    """Delete set disjoint from every file's key range: zero files
    rewritten, dataset passes through identical."""
    from database_migrator_spark.sources.sink import propagate_deletes

    v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    df = spark.range(0, 100).select(
        F.col("id").alias("row_id"), (F.col("id") % 10).alias("k")
    )
    (df.repartitionByRange(2, "k").sortWithinPartitions("k")
       .write.mode("overwrite").parquet(v1))
    deletes = spark.createDataFrame([(999,)], "k long")  # outside all ranges
    final, n_aff, n_files = propagate_deletes(spark, v1, v2, deletes, "k")
    assert n_aff == 0 and n_files == 2
    assert final.count() == 100


def test_untouched_files_is_linear_at_1e4_files():
    """Driver-side untouched-file planning must be O(F): 10^4 synthetic
    file names (half affected) completes instantly and preserves input
    order.  At 100 TB the file list is ~10^6 entries — the round-5
    verdict flagged a per-element set rebuild that made this O(F^2)."""
    import time

    from database_migrator_spark.sources.sink import untouched_files

    all_files = [f"s3://bucket/part-{i:05d}.parquet" for i in range(10_000)]
    affected = all_files[::2]
    t0 = time.monotonic()
    got = untouched_files(all_files, affected)
    elapsed = time.monotonic() - t0
    assert got == all_files[1::2]
    assert elapsed < 1.0, f"untouched_files took {elapsed:.2f}s at 1e4 files"


def test_q167_jdbc_sink_reinvocation_is_idempotent(spark):
    """Re-invoking q167 in the same session reuses the checkpoint (no new
    batches) and the already-landed Derby rows — the result must be
    byte-identical, proving the DELETE-then-INSERT upsert never
    duplicates on replay."""
    from database_migrator_spark.plans.registry import all_queries

    from .conftest import SF_SMOKE

    dq = all_queries()["q167_stream_jdbc_exactly_once"]
    first = [tuple(r) for r in dq.build(spark, SF_SMOKE).collect()]
    second = [tuple(r) for r in dq.build(spark, SF_SMOKE).collect()]
    assert first == second
    assert len(first) > 0


def test_q216_reinvocation_is_idempotent(spark):
    """Re-invoking q216 in the same session reuses the checkpoint (no new
    batches) and the already-landed partial directories — byte-identical
    results prove overwrite-by-batch-id replay safety for the unbounded
    heavy-hitter partials, q205's guarantee with a non-bitmap state."""
    from database_migrator_spark.plans.registry import all_queries

    dq = all_queries()["q216_stream_heavy_hitters"]
    first = [tuple(r) for r in dq.build(spark, SF_SMOKE).collect()]
    second = [tuple(r) for r in dq.build(spark, SF_SMOKE).collect()]
    assert first == second
    assert len(first) > 0
    # top-k ordering is total: counts strictly descend or tie-break by user
    counts = [t[1] for t in first]
    assert counts == sorted(counts, reverse=True)


def test_q218_reinvocation_is_idempotent(spark):
    """Re-invoking q218 reuses the checkpoint and landed histogram
    partials — byte-identical results prove overwrite-by-batch-id replay
    safety for the mergeable-quantile state, and the percentile picks
    satisfy the exact ceil(q*n) contract (p50 <= p90 <= p99)."""
    from database_migrator_spark.plans.registry import all_queries

    dq = all_queries()["q218_stream_value_quantiles"]
    first = [tuple(r) for r in dq.build(spark, SF_SMOKE).collect()]
    second = [tuple(r) for r in dq.build(spark, SF_SMOKE).collect()]
    assert first == second
    assert len(first) > 0
    for _type, n, p50, p90, p99, _mean in first:
        assert n > 0 and p50 <= p90 <= p99


def test_q255_streaming_registers_merge_losslessly(spark):
    """q255: the register-wise MAX merge of per-batch HLL partials must
    be BIT-IDENTICAL to a single batch register build over the whole
    events table (the lossless-union property the estimate rests on),
    and re-invocation is idempotent (overwrite-by-batch-id replay
    safety, the q205/q216/q218 guarantee)."""
    import os

    from database_migrator_spark.operators.bitmapops import hll_registers
    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.scratch import scratch_dir
    from database_migrator_spark.sources import table

    dq = all_queries()["q255_stream_hll_partials"]
    first = [tuple(r) for r in dq.build(spark, SF_SMOKE).collect()]
    second = [tuple(r) for r in dq.build(spark, SF_SMOKE).collect()]
    assert first == second and len(first) > 0
    key = (spark.sparkContext.applicationId, os.path.abspath(SF_SMOKE))
    out = scratch_dir("q255_out", *key)
    streamed = {
        (r.event_type, r.bucket): r.m_j
        for r in spark.read.parquet(out)
        .groupBy("event_type", "bucket")
        .agg(F.max("m_j").alias("m_j"))
        .collect()
    }
    direct = {
        (r.event_type, r.bucket): r.m_j
        for r in hll_registers(
            table(spark, SF_SMOKE, "events").select("event_type", "user_id"),
            "user_id",
            "event_type",
        ).collect()
    }
    assert streamed == direct
