"""Physical-plan regression tests: the scale properties we designed for
must actually appear in the executed plan — filter pushdown, column
pruning, broadcast star joins, top-k without a global sort, bounded
shuffle counts. A refactor that silently degrades a plan (e.g. a broadcast
flipping to sort-merge at test scale, a filter failing to push) fails here
even though results stay correct."""

from __future__ import annotations

import pytest

from database_migrator_spark.plans.registry import all_queries

from .conftest import SF_SMOKE

_QS = all_queries()


def plan_of(spark, name: str) -> str:
    return _QS[name].build(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown_and_pruning(spark):
    p = plan_of(spark, "q01_scan_filter_project")
    assert "PushedFilters" in p
    scan = p[p.index("FileScan") :]
    assert "GreaterThanOrEqual(l_shipdate" in scan
    # column pruning: only the 5 referenced columns reach the reader
    read_schema = scan[scan.index("ReadSchema") :][:400]
    assert "l_extendedprice" not in read_schema and "l_partkey" not in read_schema


def test_star_join_all_broadcast(spark):
    p = plan_of(spark, "q04_star_join_revenue")
    assert p.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in p


def test_pricing_summary_partial_aggregation(spark):
    p = plan_of(spark, "q02_pricing_summary")
    # partial (map-side) + final aggregate
    assert p.count("HashAggregate") == 2


def test_topk_never_global_sorts(spark):
    p = plan_of(spark, "q08_topk_orders")
    assert "TakeOrderedAndProject" in p


def test_asof_join_single_shuffle_plus_sort(spark):
    p = plan_of(spark, "q23_asof_join_last_order")
    # one hash-partition exchange for the window + the final orderBy range
    # exchange — any more means the union trick regressed
    assert p.count("Exchange") <= 2
    assert p.count("Window") == 1


def test_anti_join_is_hash_not_cartesian(spark):
    p = plan_of(spark, "q05_anti_join_customers_without_orders")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_brute_force_cosine_broadcasts_query_row(spark):
    p = plan_of(spark, "q34_cosine_topk")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p


def test_range_join_is_equi_hash_not_theta(spark):
    """The bucketized range join must plan as an equi hash join on
    (key, cell) — never a quadratic theta join (cartesian / broadcast
    nested loop), which is what a naive inequality join degrades to."""
    p = plan_of(spark, "q52_range_join_followup_events")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "HashJoin" in p or "SortMergeJoin" in p
    # partial + final aggregation for the follow-up count
    assert p.count("HashAggregate") == 2


def test_scd2_merge_hash_joins_and_union(spark):
    """SCD2 emulation: one union of the open/closed/new/insert branches,
    all joins hash-based on the business key — no nested-loop fallback."""
    p = plan_of(spark, "q60_scd2_merge")
    assert "Union" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "HashJoin" in p


def test_exceptall_uses_replicate_rows_not_join(spark):
    """EXCEPT ALL plans as the replicate-rows Generate + aggregate
    rewrite (linear, one shuffle) — not as any join."""
    p = plan_of(spark, "q64_exceptall_bag_semantics")
    assert "Generate" in p
    assert "Join" not in p
    assert p.count("HashAggregate") == 2


def test_embedding_neardup_planning_is_action_free(spark):
    """Regression: auto-sizing n_planes must come from Catalyst plan
    statistics, not a count() action — at 100 TB a count during planning
    is an extra full-table scan per call."""
    from database_migrator_spark.operators.similarity import embedding_near_duplicates
    from database_migrator_spark.sources import table

    e = table(spark, SF_SMOKE, "embeddings")
    tracker = spark.sparkContext._jsc.sc().statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    embedding_near_duplicates(e)  # plan construction only — no action
    assert len(tracker.getJobIdsForGroup(None)) == before


def test_ivf_indexed_query_broadcasts_probe_and_query(spark, tmp_path):
    """The persisted-index IVF query must broadcast the tiny probe-cluster
    and query-row sides (no shuffle of the vector table beyond the probe
    join) and keep top-k a TakeOrderedAndProject."""
    from database_migrator_spark.operators.similarity import ivf_fit, ivf_topk_indexed
    from database_migrator_spark.sources import table

    e = table(spark, SF_SMOKE, "embeddings")
    idx = ivf_fit(e, str(tmp_path / "ivf"))
    p = (
        ivf_topk_indexed(spark, idx, query_vec_id=1, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p


def test_tfidf_broadcasts_derived_dims(spark):
    """df table and corpus count must join back by broadcast — the big
    (doc, term) side shuffles once for the tf aggregate and never again."""
    p = plan_of(spark, "q75_tfidf_top_terms")
    assert p.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_resample_grid_is_per_key_not_cross_join(spark):
    """The time grid is generated per key from its own span (explode of
    sequence) — never a cartesian of keys × global calendar."""
    p = plan_of(spark, "q73_resample_ffill")
    assert "CartesianProduct" not in p
    assert "Generate explode" in p or "Generate" in p
    assert "Window" in p  # the forward-fill


def test_funnel_single_user_partition_no_sorts_per_stage(spark):
    """Three chained window mins share one user_id hash partitioning: at
    most one exchange for the windows (plus the final single-row agg)."""
    p = plan_of(spark, "q74_funnel_stages")
    assert "CartesianProduct" not in p and "Join" not in p
    assert p.count("Exchange hashpartitioning") <= 1


def test_bucketed_join_skips_shuffle(spark):
    """Two tables bucketed on the join key with equal bucket counts must
    join with NO hash-partitioning exchange — the co-location contract
    that makes repeated 100 TB fact-fact joins affordable."""
    import uuid

    from pyspark.sql import functions as F

    from database_migrator_spark.sources import table
    from database_migrator_spark.sources.sink import write_bucketed_table

    sfx = uuid.uuid4().hex[:8]
    ta, tb = f"b_orders_{sfx}", f"b_lineitem_{sfx}"
    write_bucketed_table(
        table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey"),
        ta, "o_orderkey", 8,
    )
    write_bucketed_table(
        table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity"),
        tb, "l_orderkey", 8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(ta).join(
            spark.table(tb), F.col("o_orderkey") == F.col("l_orderkey")
        )
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in p, "bucket co-location lost"
        assert "SortMergeJoin" in p
        assert "SelectedBucketsCount" in p or "Bucketed: true" in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_chunking_streams_without_shuffle(spark):
    """Token-window chunking is scan → explode → project: the only
    exchange allowed is the final presentation sort (range partitioning),
    which production pipelines omit — no hash shuffle anywhere."""
    p = plan_of(spark, "q87_token_window_chunks")
    assert "Generate" in p  # the chunk-id explode
    assert "Exchange hashpartitioning" not in p
    assert "Join" not in p


def test_repetition_score_joins_hash_never_nested_loop(spark):
    """Trigram fraction is expression-only; the token-mode side shuffles
    once on (doc_id, tok) and once on doc_id, then joins back on doc_id —
    hash join, never a nested-loop fallback."""
    p = plan_of(spark, "q88_repetition_score")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "HashJoin" in p or "SortMergeJoin" in p


def test_pii_redaction_is_pure_projection(spark):
    """Redaction is codegen'd string expressions over the scan — zero
    joins, zero aggregates, zero hash shuffles; and column pruning must
    keep unreferenced customer columns out of the reader."""
    p = plan_of(spark, "q89_pii_redaction")
    assert "Exchange hashpartitioning" not in p
    assert "Join" not in p and "HashAggregate" not in p
    scan = p[p.index("FileScan") :]
    read_schema = scan[scan.index("ReadSchema") :][:200]
    assert "c_acctbal" not in read_schema and "c_mktsegment" not in read_schema


def test_top_terms_partial_aggregation_bounded_shuffles(spark):
    """Vocabulary counts aggregate partial+final (map-side combine before
    the (lang, term) shuffle); the rank window re-shuffles only the tiny
    aggregated vocabulary by lang — two hash exchanges total."""
    p = plan_of(spark, "q91_top_terms_per_lang")
    assert p.count("HashAggregate") >= 2
    assert p.count("Exchange hashpartitioning") <= 2
    assert "Window" in p


def test_embedding_centroids_one_shuffle_partial_sums(spark):
    """Per-dimension fixed-point sums combine map-side: posexplode feeds
    partial aggregates, ONE (label, pos) hash shuffle, final aggregate —
    the shape that holds at any corpus size."""
    p = plan_of(spark, "q92_embedding_centroids")
    assert "Generate" in p  # posexplode
    assert p.count("HashAggregate") == 2
    assert p.count("Exchange hashpartitioning") == 1


def test_split_assignment_is_pure_projection(spark):
    """Hash-based train/val/test assignment must be a zero-shuffle
    projection the scan streams through — no join, no aggregate."""
    p = plan_of(spark, "q93_train_val_test_split")
    assert "Exchange hashpartitioning" not in p
    assert "Join" not in p and "HashAggregate" not in p


def test_sequence_packing_two_level_prefix_sum(spark):
    """Packing must NOT sort a whole (lang, source) shard in one task:
    the cumsum window partitions by (shard, _bucket) — many tasks per
    shard — and the per-bucket base offsets come back via broadcast join.
    Only the tiny per-bucket-totals side may window on the bare shard."""
    p = plan_of(spark, "q94_sequence_packing")
    # the doc-level cumsum window is bucketed
    assert "_bucket" in p
    assert "windowspecdefinition(lang" in p.replace("#", "").lower() or "Window" in p
    # bucketed exchange exists: hashpartitioning on (..., _bucket, ...)
    import re

    bucketed_exchanges = re.findall(r"hashpartitioning\([^)]*_bucket[^)]*\)", p)
    assert bucketed_exchanges, "doc-level window must partition by (shard, _bucket)"
    # bucket base offsets join back by broadcast, never shuffle the docs side
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_cooccurrence_prunes_vocab_before_pair_join(spark):
    """The min-count vocabulary prune precedes the quadratic per-doc
    self-join (it runs at dtp-CHECKPOINT build — round 7 materialized
    the pruned token stream so the two self-join sides and the corpus
    re-tokenization run once, 7 scans → 1); the returned plan therefore
    reads the checkpointed stream on both sides, joins the
    doc-frequency counts back by broadcast, and tops out with
    TakeOrderedAndProject."""
    p = plan_of(spark, "q96_cooccurrence_pmi")
    assert p.count("Scan ExistingRDD") >= 2  # both self-join sides
    assert p.count("BroadcastHashJoin") >= 2  # the two count joins
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p
    # the corpus is NOT re-scanned for the pair fan-out
    assert p.count("FileScan") <= 1


def test_incremental_dedup_anti_join_on_digests(spark):
    """Batch-vs-history dedup must be a hash LEFT ANTI join on the
    16-byte digest column — never a nested-loop or cartesian fallback."""
    p = plan_of(spark, "q97_incremental_ingest_dedup")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_decontamination_broadcasts_benchmark_shingles(spark):
    """The benchmark 8-gram set joins by broadcast: the training side
    streams through explode + probe + aggregate, no corpus-side
    sort-merge shuffle for the join."""
    p = plan_of(spark, "q98_benchmark_decontamination")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_quality_yield_single_scan_no_join(spark):
    """All funnel stages are conditional aggregates over ONE scan —
    no join, no per-stage re-read (exactly one FileScan)."""
    p = plan_of(spark, "q99_quality_filter_yield")
    assert "Join" not in p
    assert p.count("FileScan") == 1


def test_hll_sketches_aggregate_two_phase(spark):
    """Sketch aggregation must run as two-phase ObjectHashAggregate
    (partial per-partition sketches merged after the shuffle — the
    mergeability the operator exists to demonstrate), never the
    SortAggregate fallback, with one hash exchange per aggregation
    branch."""
    p = plan_of(spark, "q95_hll_sketch_union")
    assert p.count("ObjectHashAggregate") >= 4  # partial+final in both branches
    assert "SortAggregate" not in p
    assert p.count("Exchange hashpartitioning") <= 2


def test_no_rdd_scans_anywhere(spark):
    """Every declared query must read through the parquet FileScan path
    (vectorized reader, pushdown-capable) — never an RDD scan. Exempt:
    streaming/UDTF sources, plus every query DECLARING
    ``checkpointed_substrate=True`` in the registry — the one legitimate
    RDD boundary (sketch-once localCheckpoint self-join sides, shared
    per-session fit tables, iterative-loop breaks). The exemption lives
    on the ``DeclaredQuery`` itself (plans/registry.py), next to the
    checkpoint it excuses, so adding a checkpointed query without
    declaring the substrate fails HERE — the round-8 red suite came
    from the old trailing string-tag blacklist this test used to carry.
    The declaration is also checked in the opposite direction
    (``test_checkpointed_substrate_declarations_are_true``): a query
    declaring the substrate without an actual RDD scan is stale."""
    for name, dq in _QS.items():
        if dq.checkpointed_substrate or "streaming" in dq.tags or "udtf" in dq.tags:
            continue
        p = _QS[name].build(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" not in p, (
            f"{name} scans an RDD — either remove the localCheckpoint or "
            "declare checkpointed_substrate=True on its @query registration"
        )


def test_checkpointed_substrate_declarations_are_true(spark):
    """The inverse invariant: every query declaring
    ``checkpointed_substrate=True`` must actually plan an ExistingRDD
    scan at smoke scale — a stale declaration would silently widen the
    exemption (the tag-blacklist failure mode in reverse). Streaming
    queries cannot declare it (their exemption is the source type)."""
    declared = [
        (n, dq) for n, dq in _QS.items() if dq.checkpointed_substrate
    ]
    assert declared, "registry lost all substrate declarations"
    for name, dq in declared:
        assert "streaming" not in dq.tags and "udtf" not in dq.tags, name
        p = _QS[name].build(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in p, (
            f"{name} declares checkpointed_substrate=True but plans no RDD "
            "scan — remove the stale declaration"
        )


def test_source_divergence_single_token_shuffle_broadcast_stats(spark):
    """q103: the token stream shuffles for (source, tok) counts; the
    per-source totals and corpus total come back by broadcast, but the
    UNPRUNED vocabulary counts must NOT be broadcast — on web-scale text
    the distinct-token table is billions of rows and a forced broadcast
    of it OOMs the executors.  The tok join is pinned shuffle-merge."""
    p = plan_of(spark, "q103_source_divergence")
    # exactly one small broadcast hash join (the per-source totals) —
    # a second one would mean the vocabulary flipped back to broadcast
    assert p.count("BroadcastHashJoin") == 1
    # r14 wave 5: the vocab margin rides a tok-partitioned window over
    # the checkpointed counts' one exchange — no vocab join at all
    assert "SortMergeJoin" not in p
    assert "Window" in p
    assert "CartesianProduct" not in p
    # the 2^53 fixed-point exactness guard survives into the plan
    assert "raise_error" in p and "2^53" in p


def test_sampling_weights_broadcast_normalizer(spark):
    """q104: one aggregation for shard totals; the Σ√tokens normalizer is
    a broadcast single row, not a shuffle or cartesian product."""
    p = plan_of(spark, "q104_sampling_weights")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
    assert "HashAggregate" in p


def test_kmeans_inertia_broadcast_centroids(spark):
    """q105: the per-label centroid arrays (one row per label) join the
    vector table by broadcast; the squared-distance fold happens in the
    scan stage, not after a vector-side shuffle."""
    p = plan_of(spark, "q105_kmeans_inertia")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_bigram_lm_never_broadcasts_bigram_vocab(spark):
    """q108: the bigram-count table is even larger than the unigram
    vocabulary that q103 refuses to broadcast — both prob joins must
    shuffle (pinned shuffle-merge), and the 2^53 guard must survive."""
    p = plan_of(spark, "q108_bigram_lm_score")
    assert "SortMergeJoin" in p
    assert "BroadcastHashJoin" not in p
    assert "CartesianProduct" not in p
    assert "raise_error" in p and "2^53" in p


def test_semantic_dedup_pairs_only_within_cluster(spark):
    """q109: candidate pairs come from a (cluster, salt)-keyed equi-join
    (never a cartesian product — salted per the q246/q248 r14 shape so
    pair generation parallelizes), and the kept set is a left-anti
    join."""
    p = plan_of(spark, "q109_semantic_dedup")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
    assert "LeftAnti" in p
    assert "salt" in p  # the explode/pmod salt must stay on the join key


def test_pagerank_iterations_constant_plan(spark):
    """q110: each iteration starts from a localCheckpoint, so the final
    plan contains the LAST round's joins only (constant size per round,
    not 2^rounds), and no cartesian product anywhere."""
    p = plan_of(spark, "q110_pagerank")
    assert "CartesianProduct" not in p
    # the checkpointed frame scans as an RDD — the one sanctioned use
    assert "ExistingRDD" in p


def test_seq_length_histogram_single_scan_broadcast_normalizer(spark):
    """q111: one aggregation over the scan; the doc-count normalizer is a
    broadcast single row, never a shuffle-side join."""
    p = plan_of(spark, "q111_seq_length_histogram")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
    assert "HashAggregate" in p


def test_repeated_ngrams_never_broadcast_gram_table(spark):
    """q113: the corpus-occurrence count attaches via a gram-partitioned
    window over ONE exchange (r14 wave 4) — no join at all, so the
    corpus-scale repeated-gram set can neither broadcast nor force a
    second derivation of the tokenize+explode; the documents scan
    appears exactly once."""
    p = plan_of(spark, "q113_repeated_ngram_spans")
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert "CartesianProduct" not in p
    assert "Window" in p
    assert p.count("Scan parquet") == 1


def test_exact_substring_spans_windowed_df_docwise_islands(spark):
    """q294: the repeated-window filter rides a gram-partitioned window
    over ONE exchange (q113's r14 shape — no join, scan appears once);
    the gaps-and-islands pass is a doc-partitioned window (bounded by
    doc length), never a single global sort."""
    p = plan_of(spark, "q294_exact_substring_spans")
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert "CartesianProduct" not in p
    assert p.count("Window") >= 2  # gram-df window + doc-island window
    assert p.count("Scan parquet") == 1


def test_did_pinned_user_join_bounded_cells(spark):
    """q305: the user-scale cohort join is pinned shuffle-merge (never
    broadcast — it grows with users); everything after reduces to the 4
    checkpointed cells. No cartesian."""
    p = plan_of(spark, "q305_difference_in_differences")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" not in p


def test_mobility_matrix_no_global_sort_rank(spark):
    """q304: both periods rank via the two-level value-bucket prefix sum
    behind checkpoints — the FINAL plan's only corpus-scale shuffle is
    the customer-keyed join of the two decile frames; no cartesian."""
    p = plan_of(spark, "q304_decile_mobility_matrix")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" in p  # the customer-keyed decile join
    assert "Window" in p


def test_neyman_one_corpus_scan_bounded_tail(spark):
    """q302: one corpus aggregate into the checkpointed per-source frame
    (declared substrate); the quota/rank/leftover tail is bounded — no
    sort-merge join, no cartesian."""
    p = plan_of(spark, "q302_neyman_allocation")
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "ExistingRDD" in p


def test_capture_recapture_no_cartesian_banded_only(spark):
    """q301: both detector pipelines stay banded/bucketed (never
    all-pairs) and the audit tail is three 1-row broadcast attaches —
    no cartesian product anywhere."""
    p = plan_of(spark, "q301_capture_recapture_dedup")
    assert "CartesianProduct" not in p


def test_kcenter_bounded_assembly_no_shuffle_join(spark):
    """q300: the per-round relaxations live behind localCheckpoints
    (declared substrate); the FINAL plan is the bounded k-row union of
    per-round (center, radius) frames — no sort-merge join, no
    cartesian product beyond the broadcast 1-row center attaches."""
    p = plan_of(spark, "q300_kcenter_coreset")
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_partition_advisor_stats_only_plan(spark):
    """q299: one aggregate per table feeds the 4-row checkpointed stats
    frame (declared substrate); the FINAL plan is pure bounded tail —
    no join of any kind, no cartesian, reading the checkpoint."""
    p = plan_of(spark, "q299_partition_sizing_advisor")
    assert "Join" not in p
    assert "CartesianProduct" not in p
    assert "ExistingRDD" in p


def test_rbo_reuses_tf_substrate_bounded_tail(spark):
    """q298: both rankings read the ONE cached tf checkpoint (declared
    substrate); the only sort-merge joins are the two inherited
    corpus-scale scorer joins (BM25's postings-x-doclength inner join
    from q191, QLD's grid left-join against the postings from q196 —
    both must shuffle); both top-50 reductions are TakeOrdered, and the
    bounded tail never introduces a cartesian product."""
    p = plan_of(spark, "q298_rank_biased_overlap")
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p
    assert p.count("SortMergeJoin") == 2  # the two scorer joins, nothing else


def test_wasserstein_bounded_pair_frames(spark):
    """q297: one corpus aggregate to the (source, length) histogram; the
    pair fan-out joins a BROADCAST bounded pair list (sources², tiny) —
    no sort-merge join, no cartesian product."""
    p = plan_of(spark, "q297_wasserstein_length_shift")
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "Window" in p
    assert "HashAggregate" in p


def test_temporal_reachability_bounded_output_no_cartesian(spark):
    """q296: the per-round relaxation joins live behind localCheckpoints
    (declared substrate); the FINAL plan is the bounded monthly-bucket
    aggregate over the checkpointed arrival table — no cartesian, no
    broadcast of the node-scale arrival frame."""
    p = plan_of(spark, "q296_temporal_reachability")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" not in p
    assert "HashAggregate" in p


def test_decision_stump_bounded_frame_no_corpus_shuffle_join(spark):
    """q295: corpus work is one histogram aggregate behind a broadcast
    min/max pre-pass; the prefix-sum/score/argmax stages run on the
    bounded ≤256-row checkpointed frame — no sort-merge join, no
    cartesian, ever."""
    p = plan_of(spark, "q295_decision_stump_split")
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "HashAggregate" in p
    assert "Window" in p


def test_per_source_caps_windowed_rank_limit(spark):
    """q114: one source-keyed window with the rank filter pushed into the
    window operator (Catalyst's rank-limit rewrite) — no join at all."""
    p = plan_of(spark, "q114_per_source_caps")
    assert "Window" in p
    assert "Join" not in p
    assert "CartesianProduct" not in p


def test_ngram_novelty_never_broadcasts_gram_table(spark):
    """q118: first occurrence attaches via min(doc_id) OVER a
    gram-partitioned window on ONE exchange (r14 wave 4) — no join, so
    the corpus-scale gram table can neither broadcast nor re-derive the
    explode; the documents scan appears exactly once."""
    p = plan_of(spark, "q118_ngram_novelty")
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert "CartesianProduct" not in p
    assert "Window" in p
    assert p.count("Scan parquet") == 1


def test_cross_source_overlap_shuffles_gram_self_join(spark):
    """q119: the (source, gram) distinct set is corpus-scale, so the
    pair-expansion self-join must be a shuffle join; only the per-source
    SIZE table (bounded by the source count) may broadcast."""
    p = plan_of(spark, "q119_cross_source_overlap")
    assert "SortMergeJoin" in p  # the gram self-join
    # the two size lookups only; the (source, gram) substrate itself is a
    # checkpoint built from the shared 8-gram artifact (round 7)
    assert p.count("BroadcastHashJoin") == 2
    assert "CartesianProduct" not in p


def test_cdc_chunk_dedup_is_scan_plus_one_aggregate(spark):
    """q120: boundary detection and chunk slicing are per-row expressions;
    the plan is a scan + explode + per-source aggregate, with no join."""
    p = plan_of(spark, "q120_cdc_chunk_dedup")
    assert "Join" not in p
    assert "Generate" in p  # the chunk explode
    assert "HashAggregate" in p or "ObjectHashAggregate" in p


def test_bloom_filter_broadcasts_only_the_fixed_size_bitmap(spark):
    """q121: exactly ONE broadcast — the <=1024-row bitmap words (a
    fixed-size sketch, the designed 100 TB shape).  The historical key
    set and the probe-result join are corpus-sized and must shuffle."""
    p = plan_of(spark, "q121_bloom_ingest_filter")
    assert p.count("BroadcastHashJoin") == 1
    assert p.count("SortMergeJoin") == 2
    assert "CartesianProduct" not in p


def test_curriculum_order_has_no_global_ntile_sort(spark):
    """q125: stage assignment must come from the two-level prefix-sum
    (histogram cumsum + per-length row_number + closed-form bucket math),
    never from ntile's corpus-wide single-partition window. The only
    single-partition window allowed is the one over the token-length
    HISTOGRAM (bounded by max sequence length)."""
    p = plan_of(spark, "q125_curriculum_order")
    assert "ntile" not in p
    assert p.count("BroadcastHashJoin") == 1  # the base-offset lookup
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_vocab_contribution_one_token_shuffle_then_source_sized_work(spark):
    """q126: the only corpus-sized shuffle is the token-keyed min; the
    marginal counts join the per-source totals by broadcast, and the
    cumulative window runs on the source-sized table."""
    p = plan_of(spark, "q126_vocab_contribution")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "Window" in p


def test_incremental_neardup_band_join_and_anti_join(spark):
    """q127: batch meets history through the band-keyed shuffle join (the
    persisted-sketch-index shape — never a cartesian or a broadcast of the
    corpus-sized history), and the keep-set is a left-anti join."""
    p = plan_of(spark, "q127_incremental_neardup")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" in p
    assert "LeftAnti" in p
    assert "BroadcastHashJoin" not in p


def test_mixture_materialize_broadcasts_rates_only(spark):
    """q128: the per-source rate table joins the corpus by broadcast; the
    copy decision is a per-row expression — no corpus-side shuffle join."""
    p = plan_of(spark, "q128_mixture_materialize")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_partition_pruned_read_has_partition_filters(spark):
    """q131: the source filter must prune at the DIRECTORY level — the
    scan carries a PartitionFilters entry on source, and no source
    predicate survives as a post-scan row filter."""
    p = plan_of(spark, "q131_partition_pruned_read")
    import re
    m = re.search(r"PartitionFilters: \[[^\]]*source[^\]]*\]", p)
    assert m, "source filter did not become a PartitionFilter"


def test_bucketed_join_eliminates_join_side_shuffle(spark):
    """q134: both scans must read the BUCKETED layout and the sort-merge
    join must consume them with NO Exchange on either input — the whole
    point of the bucketed write. The only Exchanges allowed in the full
    query are the final small-group aggregate's and the presentation
    orderBy's. A regression that drops the bucketed-scan path (bucketing
    conf off, bucket-count mismatch, a repartition sneaking in) puts a
    corpus-sized Exchange back and fails here."""
    p = plan_of(spark, "q134_bucketed_colocated_join")
    assert "SortMergeJoin" in p
    assert "Bucketed: true" in p
    assert "SelectedBucketsCount: 8 out of 8" in p
    # join side is exchange-free: the tree prints children below their
    # parent, so everything AFTER the SortMergeJoin line is its two
    # bucketed-scan inputs — no Exchange may appear there
    join_input = p[p.index("SortMergeJoin") :]
    assert "Exchange" not in join_input
    # whole plan: agg exchange + orderBy range exchange only
    assert p.count("Exchange") <= 2


def test_spread_for_cpu_noops_on_wide_input(spark):
    """sources.spread_for_cpu (round-5 verdict #2): at 100 TB the scan
    already has >= defaultParallelism partitions and an unconditional
    repartition would COALESCE it through a full all-data shuffle. The
    helper must (a) add NO Exchange for a pre-partitioned input — same
    physical plan object graph, in fact the identical frame — and
    (b) still spread a narrow (single-partition) input."""
    from database_migrator_spark.sources import spread_for_cpu

    par = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000, numPartitions=par * 4)
    out = spread_for_cpu(wide)
    assert out is wide  # strongest form of "no Exchange added"
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p

    capped = spread_for_cpu(wide, cap=16)
    assert capped is wide  # cap never coalesces a wide input either

    narrow = spark.range(0, 10_000, numPartitions=1)
    spread = spread_for_cpu(narrow)
    assert spread is not narrow
    assert spread.rdd.getNumPartitions() == par
    p2 = spread._jdf.queryExecution().executedPlan().toString()
    assert "Exchange RoundRobinPartitioning" in p2


def test_contamination_attribution_broadcasts_bench_grams(spark):
    """q145: like q98, the bounded benchmark shingle side must broadcast;
    the corpus side streams through one explode + probe — a shuffle on
    the corpus gram table here would be the 100 TB mistake."""
    p = plan_of(spark, "q145_contamination_attribution")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_bfs_final_plan_bounded(spark):
    """q147: the returned frame aggregates the materialized distance
    table — the per-round joins ran against localCheckpoints during
    build, so the final plan must be checkpoint-scan + aggregate with no
    cartesian product and no corpus re-scan."""
    p = plan_of(spark, "q147_bfs_reachability")
    assert "CartesianProduct" not in p
    assert "FileScan" not in p  # reads only the checkpointed distance table


def test_image_ahash_single_window_shuffle(spark):
    """q148: generate→decode→hash is partition-preserving mapInPandas;
    the only exchanges allowed are the conditional CPU-spread of the
    narrow test scan (a no-op at scale), the ahash window's hash
    partitioning, and the presentation orderBy. The scan must read ONLY
    doc_id (the generator needs nothing else)."""
    p = plan_of(spark, "q148_image_ahash_dupes")
    assert p.count("Exchange") <= 3
    assert "Window" in p and "CartesianProduct" not in p
    scan = p[p.index("FileScan") :]
    assert "ReadSchema: struct<doc_id:bigint>" in scan


def test_audio_silence_arrow_seam_bounded(spark):
    """q217: generate→decode→run-walk is partition-preserving
    mapInPandas (one ArrowEvalPython-free seam — mapInPandas shows as
    MapInPandas, never per-row PythonUDF); the only exchanges allowed
    are the conditional CPU-spread of the narrow scan and the
    presentation orderBy. The scan must read ONLY doc_id — the WAV is
    synthesized from the key, so a wider ReadSchema means the column
    pruning broke (the q148 discipline)."""
    p = plan_of(spark, "q217_audio_silence_segments")
    assert "MapInPandas" in p
    assert "BatchEvalPython" not in p  # no row-at-a-time Python UDF
    assert p.count("Exchange") <= 2
    assert "CartesianProduct" not in p and "Window" not in p
    scan = p[p.index("FileScan") :]
    assert "ReadSchema: struct<doc_id:bigint>" in scan


def test_skew_report_window_free(spark):
    """q154: the decile boundaries must come from ONE percentile aggregate
    broadcast back over the per-key counts (a one-row BroadcastNestedLoop
    side) — never a corpus-wide ntile/window, whose single-partition sort
    is the q125 trap. Both remaining shuffles are key-partitioned."""
    p = plan_of(spark, "q154_join_key_skew_report")
    assert "ntile(" not in p  # "ntile" alone would match percentile_approx
    assert p.count("BroadcastNestedLoopJoin") == 1  # one-row bounds frame
    assert "Window" not in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_event_anomalies_two_aggregates_plus_broadcast(spark):
    """q155: hourly counts and per-type stats are two map-side-combinable
    aggregates; the stats (one row per event type) rejoin by BROADCAST,
    and the top-20 comes from TakeOrderedAndProject — no window, no
    corpus-wide sort, no shuffle join."""
    p = plan_of(spark, "q155_event_rate_anomalies")
    assert p.count("BroadcastHashJoin") == 1
    assert "Window" not in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p


def test_sequence_motifs_single_user_shuffle(spark):
    """q157/q158: the per-user cap window and the sequence groupBy share
    ONE user_id hash partitioning (the groupBy reuses the window's
    exchange); the only other exchanges are the tiny motif-keyed
    aggregate and the presentation sort. The cap bounds every row, so no
    join strategy beyond the motif explode exists in the plan."""
    for name in ("q157_sequence_motif_match", "q158_gap_constrained_motif"):
        p = plan_of(spark, name)
        assert p.count("hashpartitioning(user_id") == 1, name
        assert p.count("Exchange") <= 3, name
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p, name


def test_time_window_funnel_keyed_join(spark):
    """q159: views meet purchases through a user_id-keyed join (broadcast
    at test scale, shuffle at 100 TB) with the 5-minute bound as a
    post-filter — never a time-cross join — and both aggregates are
    combinable; no window anywhere."""
    p = plan_of(spark, "q159_time_window_funnel")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert ("BroadcastHashJoin" in p) or ("SortMergeJoin" in p)
    assert "Window" not in p


def test_twap_single_user_shuffle(spark):
    """q160: the lead window and the per-user aggregate share ONE user_id
    hash partitioning; the only other exchange is the presentation sort."""
    p = plan_of(spark, "q160_time_weighted_value")
    assert p.count("hashpartitioning(user_id") == 1
    assert p.count("Exchange") <= 2
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_winnowing_pair_join_never_broadcasts(spark):
    """q161: the fingerprint table is corpus-sized (unbounded derived
    table) — the pair self-join must stay a shuffle sort-merge join
    (pinned via hint) and the boilerplate cap must come from a window
    count, not a join."""
    p = plan_of(spark, "q161_winnowing_fingerprints")
    assert "SortMergeJoin" in p
    assert "BroadcastHashJoin" not in p and "CartesianProduct" not in p
    assert "Window" in p


def test_prefix_filter_join_all_shuffle_merge(spark):
    """q162: every derived table (shingle df, sorted docs, prefixes) is
    corpus-sized — all joins must stay shuffle sort-merge (pinned), and
    the three-consumer sorted_docs frame must be a materialized
    checkpoint scan, not three recomputations."""
    p = plan_of(spark, "q162_prefix_filter_jaccard_join")
    assert "BroadcastHashJoin" not in p and "CartesianProduct" not in p
    assert "SortMergeJoin" in p
    # the checkpoint: payload sides read "Scan ExistingRDD", so the
    # shingle pipeline's FileScan of documents appears exactly once
    assert p.count("Scan ExistingRDD") >= 3


def test_last_touch_attribution_single_user_shuffle(spark):
    """q163: one user_id hash partitioning feeds the lookback window; the
    channel aggregate and presentation sort are the only other
    exchanges; no joins anywhere."""
    p = plan_of(spark, "q163_last_touch_attribution")
    assert p.count("hashpartitioning(user_id") == 1
    assert "Join" not in p
    assert "CartesianProduct" not in p


def test_chi_square_margins_broadcast(spark):
    """q164: the contingency cells shuffle once; row/col/total margins are
    bounded (5 types x 7 days) and must join back by broadcast."""
    p = plan_of(spark, "q164_chi_square_drift")
    assert p.count("BroadcastHashJoin") == 2
    assert p.count("BroadcastNestedLoopJoin") == 1  # one-row total
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_incremental_refresh_pushes_day_filters(spark):
    """q165: both partial-aggregate branches must push their day filter
    into the scan and aggregate map-side; the merge is a 5-row join."""
    p = plan_of(spark, "q165_incremental_agg_refresh")
    assert "FullOuter" in p
    assert "CartesianProduct" not in p
    assert p.count("HashAggregate") >= 4  # partial+final per branch


def test_concurrent_sessions_single_partition_window_is_hour_table_only(spark):
    """q166: the sweep's running sum must be the two-level prefix sum —
    the ONLY single-partition exchange feeds the bounded hour-total
    window (~720 rows/month), never the corpus-sized mark table; hour
    bases rejoin by broadcast."""
    p = plan_of(spark, "q166_concurrent_sessions")
    assert p.count("Exchange SinglePartition") == 1
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_rfm_window_free_quartiles(spark):
    """q168: quartile boundaries come from one percentile aggregate (a
    one-row broadcast side), never a corpus window — the q154 pattern on
    three axes at once."""
    p = plan_of(spark, "q168_rfm_segmentation")
    assert "Window" not in p
    assert p.count("BroadcastNestedLoopJoin") == 1  # one-row bounds frame
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_session_paths_single_user_shuffle(spark):
    """q169: gap window, session cumsum, per-session cap and the path
    groupBy all reuse ONE user_id hash partitioning — two exchanges
    total including the top-k."""
    p = plan_of(spark, "q169_top_session_paths")
    assert p.count("hashpartitioning(user_id") == 1
    assert p.count("Exchange") <= 2
    assert "Join" not in p and "CartesianProduct" not in p


def test_correlation_joins_bounded_sides_only(spark):
    """q170: after the single corpus shuffle (hourly counts), every join
    runs on bounded derived tables (hours x types grid, pair self-join)
    — broadcast by construction, no sort-merge, no cartesian of
    unbounded sides."""
    p = plan_of(spark, "q170_event_type_correlation")
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_forecast_eval_touches_corpus_once(spark):
    """q171: one corpus aggregate; the lag joins run on the bounded dense
    grid by broadcast — no sort-merge, no cartesian, no window."""
    p = plan_of(spark, "q171_seasonal_naive_forecast")
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    # all branches read the dense_hourly_counts checkpoint — the corpus
    # parquet appears NOWHERE in this plan (it was scanned once at
    # artifact build); re-deriving per branch measured 9 full scans
    assert "FileScan" not in p
    assert "Window" not in p


def test_ewma_fold_runs_on_bounded_per_type_arrays(spark):
    """q172: one corpus shuffle for hourly counts; the integer EWMA fold
    runs over per-type collected arrays (5 rows of ~720 structs) — no
    window at all, no joins beyond the bounded densify."""
    p = plan_of(spark, "q172_ewma_control_chart")
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "Window" not in p


def test_drift_family_no_corpus_rescans(spark):
    """q173/q174: the PSI bucket cells and the KS cents histogram are
    bounded checkpoints — the returned plans contain no corpus FileScan
    (the build stages scanned it: twice for PSI's baseline bounds +
    bucketing, once for KS), no shuffle joins, no cartesian."""
    for name in ("q173_psi_value_drift", "q174_ks_value_drift"):
        p = plan_of(spark, name)
        assert "FileScan" not in p, name
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p, name


def test_uninterrupted_funnel_keyed_join(spark):
    """q175: anchors meet the purchase+error stream through ONE
    user_id-keyed join (broadcast at test scale, shuffle at 100 TB) with
    the 5-minute bound and the negative condition as post-filter /
    conditional aggregates — never a time-cross join, no window, no
    second join for the error stream."""
    p = plan_of(spark, "q175_uninterrupted_funnel")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    joins = p.count("BroadcastHashJoin") + p.count("SortMergeJoin")
    assert joins == 1
    assert "Window" not in p


def test_variant_qualify_two_level_topk(spark):
    """q176: ONE corpus scan feeds the variant shred + rollup; the
    grouped top-k is two bounded windows (per-bucket, then per-type over
    the <=3x64 survivors) — never one event_type-only window over the
    full per-user table, and no join anywhere."""
    p = plan_of(spark, "q176_variant_qualify_topk")
    assert p.count("Scan ") + p.count("FileScan") >= 1
    scans = [l for l in p.splitlines() if "parquet" in l.lower() and "events" in l.lower()]
    assert len(scans) <= 1, scans
    assert p.count("Window [") == 2
    # level 1 must really shard by the user-hash bucket: its window spec
    # partitions on (event_type, _w0) where _w0 is the projected bucket
    assert ", _w0#" in p
    # Spark's rank-limit pushdown keeps only k rows per group BEFORE the
    # full window sort — the property that makes level 1 cheap at scale
    assert "WindowGroupLimit" in p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert "CartesianProduct" not in p


def test_acf_runs_on_bounded_grid(spark):
    """q177: the returned plan reads only the dense-hourly checkpoint
    (no corpus FileScan); the 24-lag expansion and the shifted-hour
    equi-join are broadcast over bounded tables — no shuffle join, no
    cartesian, no corpus-wide window."""
    p = plan_of(spark, "q177_hourly_autocorrelation")
    assert "FileScan" not in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "Window" not in p


def test_rank_stats_single_corpus_scan(spark):
    """q178/q179: the only corpus-sized work is the histogram aggregate,
    checkpointed (no FileScan in the returned plan); rank bases come
    from windows over BOUNDED histograms and join back broadcast —
    never a corpus-wide sort, never a shuffle join."""
    for name in ("q178_spearman_value_k", "q179_mann_whitney_value"):
        p = plan_of(spark, name)
        assert "FileScan" not in p, name
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p, name


def test_containment_join_all_shuffle_merge(spark):
    """q181: prefix side and full-index side are both corpus-sized —
    every join stays shuffle sort-merge (pinned), the shared rare-first
    substrate is a checkpoint scan (no documents re-scan per consumer)."""
    p = plan_of(spark, "q181_shingle_containment_join")
    assert "BroadcastHashJoin" not in p and "CartesianProduct" not in p
    assert "SortMergeJoin" in p
    assert p.count("Scan ExistingRDD") >= 3


def test_assortativity_pins_node_joins(spark):
    """q180: the degree table is node-sized (unbounded) — both endpoint
    joins must stay shuffle sort-merge; the union'd edge list is a
    checkpoint scan consumed by deg and the sums, not re-derived."""
    p = plan_of(spark, "q180_degree_assortativity")
    assert "SortMergeJoin" in p
    assert "CartesianProduct" not in p
    assert p.count("Scan ExistingRDD") >= 2


def test_triangle_joins_pinned_and_checkpointed(spark):
    """q182: the orientation joins, wedge self-join, and closure join are
    all node-keyed shuffle merges over unbounded derived tables; the
    union-lineage frames (pairs, deg, oriented edges) are checkpoint
    scans — never re-derived per consumer, never broadcast."""
    p = plan_of(spark, "q182_neardup_triangles")
    assert "SortMergeJoin" in p
    assert "CartesianProduct" not in p
    assert p.count("Scan ExistingRDD") >= 4


def test_weighted_sample_group_limit_pushdown(spark):
    """q186: the rank()<=5 per-source window must compile to
    WindowGroupLimit (per-partition pre-filter before the sort) — a
    source never sorts its full corpus on one task."""
    p = plan_of(spark, "q186_weighted_sample")
    assert "WindowGroupLimit" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_bitmap_rollup_merges_checkpoint_not_corpus(spark):
    """q189: the daily tier merges the HOURLY word-bitmap checkpoint —
    the returned plan contains no corpus FileScan (events shuffled once,
    at checkpoint build), no window, no cartesian; the per-day join of
    two day-keyed aggregates is bounded either way."""
    p = plan_of(spark, "q189_bitmap_distinct_rollup")
    assert "FileScan" not in p
    assert "Window" not in p and "CartesianProduct" not in p


def test_bitmap_retention_shuffle_joins_word_table(spark):
    """q190: the day-pair bitmap intersection joins the word table
    (user-space/63 rows per day — unbounded derived) on the fold's own
    (d, w) key as a SHUFFLE join, never broadcast; no corpus FileScan
    in the returned plan."""
    p = plan_of(spark, "q190_bitmap_retention")
    assert "FileScan" not in p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
    assert "CartesianProduct" not in p


def test_bm25_single_scan_and_topk(spark):
    """q191: the checkpointed tf table is the only corpus-sized
    artifact (no FileScan in the returned plan); scoring joins the
    3-term broadcast before the doc-length shuffle join; top-20 is
    TakeOrderedAndProject, never a global sort."""
    p = plan_of(spark, "q191_bm25_topk")
    assert "FileScan" not in p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_column_profile_mode_uses_window_group_limit(spark):
    """q192: ONE corpus FileScan feeds the unpivot; the per-column mode
    top-1 runs under rank-limit pushdown (WindowGroupLimit) so a
    corpus-sized distinct-value table is never globally sorted."""
    p = plan_of(spark, "q192_column_profile")
    assert "FileScan" not in p  # reads the checkpointed value-count table
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p


def test_cusum_runs_on_bounded_grid(spark):
    """q193: everything runs on the dense-hourly checkpoint — no corpus
    FileScan, no shuffle join, windows only over the bounded grid."""
    p = plan_of(spark, "q193_cusum_changepoint")
    assert "FileScan" not in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_kcore_returns_checkpointed_counts(spark):
    """q194: the peel rounds are checkpointed — the returned plan reads
    only the final/previous edge checkpoints (no corpus FileScan) and
    the three 1-row aggregates meet by broadcast."""
    p = plan_of(spark, "q194_kcore_3core")
    assert "FileScan" not in p
    assert "SortMergeJoin" not in p


def test_proximity_postings_single_doc_aggregate(spark):
    """q195 (r14 wave 4): both terms' capped postings reduce in ONE
    doc_id aggregate to in-row position arrays — no window cap passes,
    no pair join, the pair grid never crosses an exchange; top-20 is
    TakeOrderedAndProject; corpus scanned zero times in the returned
    plan (tokenized checkpoint)."""
    p = plan_of(spark, "q195_phrase_proximity")
    assert "FileScan" not in p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert "Window" not in p
    assert "TakeOrderedAndProject" in p


def test_qld_scores_all_docs_via_grid(spark):
    """q196: no corpus FileScan in the returned plan (cached tf
    substrate); the docs x 3-term grid comes from broadcast joins and
    the postings attach via the pinned shuffle join — no cartesian."""
    p = plan_of(spark, "q196_qld_topk")
    assert "FileScan" not in p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p


def test_rrf_windows_are_bounded(spark):
    """q197: ranks come from two <=100-row windows AFTER the top-100
    TakeOrderedAndProject — exactly two Window nodes, both over bounded
    inputs; fusion is one join; no corpus FileScan."""
    p = plan_of(spark, "q197_rrf_fusion")
    assert "FileScan" not in p
    assert p.count("Window [") == 2
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_stickiness_rolls_up_word_table(spark):
    """q198: the rolling 7-day union runs on the day-words checkpoint
    (no corpus FileScan); day-list semi join broadcasts; no cartesian,
    no corpus-wide window."""
    p = plan_of(spark, "q198_bitmap_stickiness")
    assert "FileScan" not in p
    assert "Window" not in p
    assert "CartesianProduct" not in p


def test_greedy_coverage_no_driver_collect_shape(spark):
    """q199: the returned plan unions five 1-row broadcast-carried
    picks — no corpus FileScan (tf substrate checkpoint), no cartesian;
    the per-round argmax is TakeOrderedAndProject."""
    p = plan_of(spark, "q199_greedy_coverage")
    assert "FileScan" not in p
    assert "CartesianProduct" not in p


def test_association_rules_pruned_shuffle_pairs(spark):
    """q200: the within-basket self-join and both count attachments run
    as pinned shuffle joins (never broadcast the parts-sized count
    table); top-20 is TakeOrderedAndProject; no cartesian."""
    p = plan_of(spark, "q200_association_rules")
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_conversion_quartiles_bounded_histogram(spark):
    """q201: percentiles come from the <=1801-row histogram checkpoint
    (no corpus FileScan in the returned plan), picks join by broadcast;
    no corpus-wide sort or window."""
    p = plan_of(spark, "q201_conversion_delay_quartiles")
    assert "FileScan" not in p
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" not in p  # no top-k path needed


def test_circular_stats_bounded_histogram(spark):
    """q202: everything after the 24 x types histogram checkpoint is
    scale-free — no corpus FileScan in the returned plan, the argmax
    window runs over the bounded histogram, no cartesian."""
    p = plan_of(spark, "q202_circular_peak_hour")
    assert "FileScan" not in p
    assert "CartesianProduct" not in p


def test_jsd_single_token_shuffle(spark):
    """q203: one (source, tok) checkpoint feeds the pair join (pinned
    shuffle on tok) and the broadcast totals; no corpus FileScan, no
    cartesian."""
    p = plan_of(spark, "q203_js_divergence_matrix")
    assert "FileScan" not in p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
    assert "CartesianProduct" not in p


def test_record_linkage_blocked_equi_join(spark):
    """q204: candidates come ONLY from the nationkey equi join — never
    a cross join; top-20 is TakeOrderedAndProject."""
    p = plan_of(spark, "q204_record_linkage")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p
    assert "TakeOrderedAndProject" in p


def test_sparse_cosine_inverted_index_join(spark):
    """q206 (r15): the pair dot products come from ONE term-keyed
    shuffle join over the postings checkpoint (never broadcast — the
    postings table is corpus-sized) whose parallelism is PINNED by an
    explicit repartition(npart, g, source) so AQE's byte-based
    coalescing cannot serialize pair generation; the doc norms ride the
    posting rows out of the checkpoint (doc_id window inside the build)
    instead of attaching via two more corpus-scale shuffle joins — the
    pair join is the ONLY join in the plan. Top-20 is
    TakeOrderedAndProject; no corpus FileScan, no cartesian."""
    p = plan_of(spark, "q206_sparse_cosine_pairs")
    assert "FileScan" not in p
    assert p.count("SortMergeJoin") == 1
    assert "REPARTITION_BY_NUM" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "TakeOrderedAndProject" in p


def test_segment_dedup_single_seg_shuffle(spark):
    """q207 (r14 wave 5): the keep-first key attaches via min(key) OVER
    a segment-partitioned window on ONE exchange — no join at all, so
    the corpus-sized segment table can neither broadcast nor re-derive
    the explode; the documents scan appears exactly once."""
    p = plan_of(spark, "q207_segment_dedup_yield")
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "Window" in p
    assert p.count("Scan parquet") == 1


def test_leadlag_runs_on_dense_grid(spark):
    """q208: no corpus FileScan in the returned plan (shared
    dense_hourly_counts checkpoint); the lag dimension and shifted grid
    attach via broadcast; argmax window over the bounded scored table."""
    p = plan_of(spark, "q208_leadlag_xcorrelation")
    assert "FileScan" not in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_gini_histogram_prefix_sum(spark):
    """q209: the only window runs over the bounded (source, token_count)
    histogram AFTER the corpus collapses to counts — no corpus-wide
    sort, no cartesian."""
    p = plan_of(spark, "q209_token_gini_concentration")
    assert "Window" in p
    assert "CartesianProduct" not in p


def test_minhash_fidelity_pinned_joins(spark):
    """q210: signature tables join the pair set via pinned shuffle
    (both corpus-sized derived tables); the 64-slot dimension is the
    only broadcast; no cartesian."""
    p = plan_of(spark, "q210_minhash_fidelity")
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
    assert "CartesianProduct" not in p


def test_anova_runs_on_dense_grid(spark):
    """q211: no corpus FileScan (shared dense_hourly_counts checkpoint);
    moment joins broadcast-bounded; windows only over the 24-row
    per-type hour table."""
    p = plan_of(spark, "q211_diurnal_variance_explained")
    assert "FileScan" not in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_logodds_topk_is_window_group_limit(spark):
    """q212: the vocab-sized y_w margin rides a tok-partitioned window
    over the checkpointed counts' one exchange (r14 wave 5 — formerly a
    groupBy + pinned shuffle join back; never broadcast either way);
    the per-source top-10 compiles to WindowGroupLimit, so no source
    partition is globally sorted."""
    p = plan_of(spark, "q212_distinctive_terms_logodds")
    assert "WindowGroupLimit" in p
    assert "SortMergeJoin" not in p  # the 1-row totals attach stays BNLJ
    assert "CartesianProduct" not in p


def test_tukey_outliers_single_scan_two_pass(spark):
    """q213: the (nation, cents) projection is checkpointed — the fence
    pass and the filter pass share it (no second corpus FileScan); the
    25-row fence table broadcasts back; no cartesian."""
    p = plan_of(spark, "q213_order_value_outliers")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_referential_integrity_no_cartesian(spark):
    """q214: every relationship is one equi left join folded to a
    4-number summary; the lineitem key projection is checkpointed for
    its three branches; no cartesian/nested-loop anywhere."""
    p = plan_of(spark, "q214_referential_integrity")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "Union" in p


def test_burstiness_windows_on_natural_key(spark):
    """q215: the lag window partitions by (user_id, event_type) — one
    corpus shuffle, never a single-partition window; moments fold
    immediately to the bounded per-type table."""
    p = plan_of(spark, "q215_interarrival_burstiness")
    assert "Window" in p
    assert "CartesianProduct" not in p


def test_stream_quantiles_final_plan_bounded(spark):
    """q218: the returned frame computes percentiles over the
    checkpointed MERGED histogram — the final plan must never rescan
    the corpus (no FileScan: the only inputs are the checkpoint's
    ExistingRDD scans) and the cumulative window must be the per-type
    partitioned one, not a corpus-wide sort."""
    p = plan_of(spark, "q218_stream_value_quantiles")
    assert "FileScan" not in p  # reads only the checkpointed histogram
    assert "Window" in p
    assert "CartesianProduct" not in p


def test_ivf_append_broadcast_centroids_anti_join(spark):
    """q219: the 16-row centroid table and cluster spine are the only
    broadcasts; the batch-vs-indexed membership check is a hash LeftAnti
    (never a nested loop), and no corpus-sized side ever broadcasts —
    at 100 TB the only big movers are the anti join and the argmin
    groupBy shuffle."""
    p = plan_of(spark, "q219_ivf_index_append")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p  # 16-row centroid cross join only
    assert "Window" not in p  # argmin is min-of-struct agg, not row_number


def test_prefix_templates_window_group_limit(spark):
    """q220: the per-source top-3 rank must plan with WindowGroupLimit
    (map-side per-partition top-k before the window shuffle — on a
    corpus-sized prefix table the full sort would be the 100 TB
    mistake); the per-source totals come back by ONE broadcast; the
    prefix projection is slice-only (no explode/Generate)."""
    p = plan_of(spark, "q220_doc_prefix_templates")
    assert "WindowGroupLimit" in p
    assert p.count("BroadcastHashJoin") == 1
    assert "Generate" not in p
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p
    # the (source, prefix) count frame is checkpointed before the tot
    # branch derives from it — without the checkpoint Catalyst re-runs
    # the whole tokenize+aggregate pipeline for tot (2 corpus FileScans,
    # the round-9 ADVICE finding); the corpus must be scanned ONCE
    assert p.count("FileScan") == 0  # both branches read the checkpoint
    assert p.count("Scan ExistingRDD") >= 2


def test_kmv_bottom_k_window_group_limit(spark):
    """q221: the per-type rank<=16 stage must plan with WindowGroupLimit
    (the map-side partial bottom-k that makes KMV mergeable-cheap at
    scale). That stage executes during the builder's checkpoint, so the
    final plan shows only the bounded post-sketch work — reconstruct
    the stage here and lock its shape, then assert the final plan stays
    cartesian-free with at most the 1-row exact-count nested loop."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from database_migrator_spark.sources import table

    du = (
        table(spark, SF_SMOKE, "events")
        .select("event_type", "user_id")
        .distinct()
        .withColumn("h", F.substring(F.md5(F.col("user_id").cast("string")), 1, 12))
    )
    w = Window.partitionBy("event_type").orderBy("h", "user_id")
    stage = du.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 16)
    sp = stage._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in sp
    p = plan_of(spark, "q221_kmv_distinct_fidelity")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 1  # 1-row exact-count frame


def test_trimmed_mean_histogram_only(spark):
    """q222: after the one corpus scan folds to the checkpointed
    (nation, cents) histogram, everything is bounded — the cumulative
    window and both aggregates read the checkpoint (no second corpus
    FileScan in the final plan's post-checkpoint section), the totals
    come back by broadcast, and there is no corpus-wide sort."""
    p = plan_of(spark, "q222_trimmed_order_stats")
    assert "CartesianProduct" not in p
    assert "Window" in p
    assert "SortMergeJoin" not in p


def test_hll_register_build_single_aggregate_no_distinct(spark):
    """q223: the register build must be ONE map-side-combinable
    aggregate over the RAW stream — no pre-distinct shuffle (duplicates
    cannot move a MAX), no join before the bounded register table, and
    the final plan (post-checkpoint) carries only bounded work with no
    corpus re-scan beyond the two exact ground-truth counts."""
    p = plan_of(spark, "q223_hll_register_fidelity")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
    # ground-truth exact counts are the only corpus scans in the final plan
    assert p.count("FileScan") <= 2


def test_functional_dependencies_aggregate_only(spark):
    """q224: each candidate is (X,Y)-count -> X-reaggregate — the plan
    must be pure aggregates + union: no joins of any kind, no windows,
    and every scan column-pruned to the candidate's X∪Y columns."""
    p = plan_of(spark, "q224_functional_dependencies")
    assert "Join" not in p
    assert "Window" not in p
    assert "CartesianProduct" not in p


def test_position_attribution_plan_bounded(spark):
    """q225: per-conversion position/length windows share ONE pid hash
    partitioning and run ONCE — the bounded 4-row by_channel frame is
    checkpointed so the grand-total broadcast reads it instead of
    re-deriving the whole join+window pipeline (Catalyst would); the
    only nested-loop is the 1-row total broadcast."""
    p = plan_of(spark, "q225_position_attribution")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 1  # 1-row total frame
    assert "Window" not in p  # windows ran inside the checkpoint build
    assert p.count("FileScan") == 0  # reads only the 4-row checkpoint


def test_nearest_join_equi_hash_no_window(spark):
    """q226: the symmetric nearest join must stay an equi hash join on
    (user, cell) — never a theta join — and the per-purchase argmin is
    a min-of-struct AGGREGATE, not a window."""
    p = plan_of(spark, "q226_nearest_event_join")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "Window" not in p
    assert "Generate explode" in p or "Generate" in p  # the 3-cell explode


def test_zipf_top100_window_group_limit(spark):
    """q227: the per-source top-100 rank must compile to
    WindowGroupLimit — on a web-scale vocabulary the full per-source
    sort would be the 100 TB mistake; the regression itself runs on
    <= 100 bounded rows per source."""
    p = plan_of(spark, "q227_zipf_slope")
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p


def test_delete_audit_join_free(spark):
    """q228: five artifact definitions, each a map-side-combinable
    aggregate over its own column-pruned scan — no joins, no windows
    anywhere (the audit must cost five scans, not a single shuffle
    more)."""
    p = plan_of(spark, "q228_delete_propagation_audit")
    assert "Join" not in p
    assert "Window" not in p
    assert "CartesianProduct" not in p


def test_index_refresh_vocab_joins_never_broadcast(spark):
    """q229: the old/delta per-term merges are FULL OUTER joins of two
    unbounded vocabulary tables — they must stay shuffle-merge (a
    broadcast of either side OOMs at web scale), and the top-20 must
    be a TakeOrderedAndProject, never a global sort."""
    p = plan_of(spark, "q229_incremental_index_refresh")
    assert "SortMergeJoin FullOuter" in p or ("SortMergeJoin" in p and "FullOuter" in p)
    assert "BroadcastHashJoin" not in p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_embedding_drift_aggregate_before_join(spark):
    """q230: the old/new pairing must join the label×64 AGGREGATES,
    never corpus-sized sides — the only Generate is the component
    posexplode, and there is no cartesian product or window."""
    p = plan_of(spark, "q230_embedding_centroid_drift")
    assert "CartesianProduct" not in p and "Window" not in p
    assert "Generate" not in p  # the posexplode ran inside the checkpoint
    assert "FileScan" not in p  # both branches read the bounded checkpoint


def test_point_in_time_join_free_single_user_shuffle(spark):
    """q231: the as-of enrichment is the UNION trick — no join operator
    at all; the running-stats window, the version collapse, and the
    carry-forward window all share user-keyed partitionings (at most 3
    user/hash exchanges + the bounded tier rollup), and there is no
    per-probe candidate scan."""
    p = plan_of(spark, "q231_point_in_time_features")
    assert "Join" not in p
    assert "CartesianProduct" not in p
    assert p.count("Exchange hashpartitioning") <= 4


def test_wilson_ci_conditional_max_fold(spark):
    """q232: the view x purchase lookahead folds by MAX per view (the
    q175 conditional-aggregate shape) — one user-keyed hash join, no
    window, no cartesian; the Wilson math is per-row on the bounded
    4-channel rollup."""
    p = plan_of(spark, "q232_conversion_wilson_ci")
    assert "CartesianProduct" not in p
    assert "Window" not in p
    assert "HashJoin" in p or "SortMergeJoin" in p


def test_cuped_single_user_shuffle_broadcast_moments(spark):
    """q233: one user-keyed conditional-sum aggregate is the only
    corpus-sized shuffle; the midpoint bound, pooled moments and theta
    come back as 1-row broadcasts over the checkpointed per-user table
    — no corpus re-scan in the final plan, no window, no sort-merge."""
    p = plan_of(spark, "q233_cuped_adjusted_lift")
    assert "FileScan" not in p  # reads only the per-user checkpoint
    assert "Window" not in p and "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_portable_minhash_lsh_sig_built_once_joins_pinned(spark):
    """q234: the md5 signature/banding pipeline (the dominant cost) must
    execute ONCE into the banded-table checkpoint — the final plan reads
    checkpoints only (no md5, no corpus FileScan) — and every
    corpus-sized join side (bucket self-join, both verify sides) stays
    pinned shuffle-merge: Catalyst's static stats would broadcast these
    unbounded derived tables at test scale."""
    p = plan_of(spark, "q234_minhash_lsh_portable")
    assert "md5" not in p  # signatures built once, inside the checkpoint
    assert p.count("FileScan") == 0
    assert p.count("Scan ExistingRDD") >= 3  # self-join + two verify sides
    assert p.count("SortMergeJoin") == 3
    assert "BroadcastHashJoin" not in p
    assert "CartesianProduct" not in p


def test_srp_portable_single_scan_topk(spark):
    """q235: bucket assignment is a per-row expression over the scan (the
    8 fixed planes fold into the expression — no plane-table join), the
    query row is the only broadcast (1-row nested loop), the probe
    filter prunes before the cosine, and top-k plans as
    TakeOrderedAndProject (never a global sort)."""
    p = plan_of(spark, "q235_srp_lsh_topk_portable")
    assert p.count("BroadcastNestedLoopJoin") == 1  # the 1-row query vec
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "Exchange hashpartitioning" not in p  # no shuffle at all


def test_ivf_portable_probe_prunes_before_distance(spark):
    """q236: the corpus-sized assignment join is pinned shuffle-merge
    (broadcasting it is the 100 TB mistake — in production it is the
    persisted partition key), the 4-cell probe set and the 1-row query
    vector are the only broadcasts, and the final top-k is
    TakeOrderedAndProject."""
    p = plan_of(spark, "q236_ivf_topk_portable")
    assert "SortMergeJoin" in p  # the assignment join
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p
    # broadcasts: 16-row centroid spine (assignment + probe ranking) and
    # the 1-row query vector — all bounded
    assert p.count("BroadcastHashJoin") <= 1  # the 4-row probe-cell semi join


def test_lloyd_step_single_scan_no_joins(spark):
    """q263: the single-Lloyd-iteration twin must assign via the
    literal-centroid fold (per-row expression — no centroid join, no
    window over the corpus, no second lineage expansion of the
    embeddings scan) and aggregate the update map-side onto the bounded
    1024-group domain; the only join is grid ← broadcast(upd), both
    sides bounded."""
    p = plan_of(spark, "q263_lloyd_step_portable")
    assert p.count("FileScan") == 1  # ONE corpus scan
    assert "SortMergeJoin" not in p
    assert "Window" not in p
    assert "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") == 1  # grid <- broadcast(upd)


def test_randomized_response_single_scan_no_joins(spark):
    """q264: the RR mechanism is per-row codegen (md5 coin) over ONE
    scan into a 5-group aggregate — no joins, no windows."""
    p = plan_of(spark, "q264_randomized_response_release")
    assert p.count("FileScan") == 1
    assert "Join" not in p and "Window" not in p


def test_rag_chunking_streams_scan_speed(spark):
    """q265: chunking is per-row expressions + posexplode over one scan —
    no joins, no windows, no aggregate shuffle (the only Exchange is the
    presentation sort)."""
    p = plan_of(spark, "q265_rag_token_chunking")
    assert p.count("FileScan") == 1
    assert "Join" not in p and "Window" not in p
    assert "HashAggregate" not in p


def test_cohens_kappa_single_scan_no_joins(spark):
    """q266: label expressions fold into the scan projection; one
    map-side-combinable per-source aggregate; no joins, no windows."""
    p = plan_of(spark, "q266_cohens_kappa_labelers")
    assert p.count("FileScan") == 1
    assert "Join" not in p and "Window" not in p


def test_sequence_packing_two_level_prefix(spark):
    """q267: the packed-span table is computed once into a checkpoint
    (two-level prefix sum inside it — the final plan reads the
    checkpoint twice: span groups + totals) and the only join is the
    1-row totals broadcast; no corpus window, no sort-merge, no
    cartesian in the final plan."""
    p = plan_of(spark, "q267_sequence_packing_report")
    assert p.count("FileScan") == 0  # spans checkpoint only
    assert p.count("Scan ExistingRDD") == 2
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "Window" not in p  # prefix windows live inside the checkpoint
    assert p.count("BroadcastNestedLoopJoin") == 1  # the 1-row totals


def test_shard_manifest_two_level_no_global_sort(spark):
    """q268: positions come from the shared q249 two-level prefix sum
    (two partitioned windows + the bounded bucket-base broadcast); the
    ordered-list fingerprints aggregate per ≤1000-doc file — no
    sort-merge join, no cartesian, no corpus-wide single-partition
    sort in the plan."""
    p = plan_of(spark, "q268_shard_manifest_fingerprint")
    assert p.count("Window") == 2  # level-1 rank + bounded bucket prefix
    assert p.count("BroadcastHashJoin") == 1  # the 128-row bucket base
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_norm_screen_bounded_window_one_scan(spark):
    """q269: the (label, n4) checkpoint is the only corpus pass (no
    FileScan in the final plan); the quartile machinery runs over the
    value-domain-bounded histogram and the fence frame broadcasts — no
    sort-merge join, no cartesian, no corpus window."""
    p = plan_of(spark, "q269_embedding_norm_screen")
    assert "FileScan" not in p  # reads the (label, n4) checkpoint only
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "Window" not in p  # the bounded-histogram window ran pre-checkpoint
    assert p.count("BroadcastNestedLoopJoin") == 1  # the 1-row fence frame


def test_maxscore_prunes_in_plan_and_topk(spark):
    """q237: the MaxScore gate is IN THE PLAN (the θ/Σrest 1-row
    broadcasts feed a nested-loop filter over the non-essential
    candidate set — no driver-side branching), the essential/candidate
    joins stay shuffle-merge or broadcast-of-bounded, the corpus is
    only touched through the tf checkpoint, and the final top-20 is
    TakeOrderedAndProject."""
    p = plan_of(spark, "q237_bm25_maxscore_topk")
    assert "FileScan" not in p  # tf checkpoint only
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p
    # the pruning gate: rest_ub_fp >= theta_fp appears as a join/filter
    # condition over the broadcast 1-row bound frames
    assert "theta_fp" in p and "rest_ub_fp" in p


def test_portable_simhash_sketch_once_join_pinned(spark):
    """q238: the md5 sketch fold (the dominant cost) must execute ONCE
    into the banded-table checkpoint — the final plan reads the
    checkpoint only (no md5, no corpus FileScan) — and the bucket
    self-join stays pinned shuffle-merge: both sides are the unbounded
    corpus-sized sketch table that Catalyst's static stats would
    broadcast at test scale."""
    p = plan_of(spark, "q238_simhash_hamming_portable")
    assert "md5" not in p
    assert p.count("FileScan") == 0
    assert p.count("Scan ExistingRDD") == 2  # the two self-join sides
    assert "SortMergeJoin" in p
    assert "BroadcastHashJoin" not in p
    assert "CartesianProduct" not in p


def test_nelson_aalen_windows_on_life_table_only(spark):
    """q239: the corpus is touched exactly twice (the per-user aggregate
    and the purchase projection — both column-pruned scans, the q232
    shape); the risk set is a SUFFIX window sum over the histogram — one
    lineage, no totals branch re-deriving the aggregate pipeline (the
    q220 doubled-FileScan failure mode) — so every window runs AFTER the
    hour-histogram reduction and the single-partition exchange feeds
    only the bounded life table."""
    p = plan_of(spark, "q239_nelson_aalen_hazard")
    assert p.count("FileScan") == 2
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # the life-table windows sort AFTER both corpus-keyed aggregates
    assert "SinglePartition" in p


def test_kruskal_wallis_single_scan_histogram_ranks(spark):
    """q240: ONE corpus scan builds the checkpointed (type, cents)
    histogram; every branch (pooled ranks, group fold, H totals, tie
    term) re-derives from that CHECKPOINT — histogram-sized work, never
    a corpus re-scan — so the final plan has zero FileScans; the
    pooled-rank join is pinned shuffle-merge (both sides histogram-sized
    but unbounded-domain derived tables); the k-row H frames broadcast."""
    p = plan_of(spark, "q240_kruskal_wallis_value")
    assert "FileScan" not in p  # reads the histogram checkpoint only
    assert p.count("Scan ExistingRDD") == 5  # all branches off the checkpoint
    assert "SortMergeJoin" in p
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") == 2  # 1-row tot + ties


def test_textrank_final_plan_reads_checkpoint_topk(spark):
    """q241: after 5 checkpointed rounds the FINAL plan reads only the
    last round's materialized labels — no corpus FileScan, no join, no
    recursive blow-up (the lazy-loop plan explosion q110 guards
    against) — and top-20 plans as TakeOrderedAndProject."""
    p = plan_of(spark, "q241_textrank_keywords")
    assert "FileScan" not in p
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_bootstrap_resamples_bounded_aggregate_only(spark):
    """q242: the corpus is scanned once into the daily checkpoint; the
    draw spine joins the BROADCAST bounded day table (resampling
    aggregates, never corpus rows); single-partition exchanges feed only
    the bounded day/replicate tables; no shuffle-merge join anywhere."""
    p = plan_of(spark, "q242_bootstrap_ci_daily_revenue")
    assert "FileScan" not in p  # day table is checkpointed
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p  # pick -> day_cents
    assert "CartesianProduct" not in p


def test_kneser_ney_vocab_joins_pinned_no_broadcast(spark):
    """q243: the marginals (c1/n1f by w1, continuation n1p by w2) come
    from vocabulary-partitioned WINDOWS over the one c2 table (r14: the
    former groupBy+join-back shape exchanged c2 twice per marginal);
    the only remaining vocabulary-sized join is the instance-stream
    prob join, pinned shuffle-merge — the bigram vocabulary NEVER
    broadcasts (q103's OOM lesson); the only broadcast is the 1-row
    type total."""
    p = plan_of(spark, "q243_kneser_ney_bigram_score")
    assert p.count("SortMergeJoin") == 1
    assert p.count("Window") >= 2
    assert "BroadcastHashJoin" not in p
    assert "BroadcastNestedLoopJoin" in p  # the 1-row T
    assert "CartesianProduct" not in p


def test_rm3_bounded_broadcasts_substrate_only_scans(spark):
    """q245: the corpus is touched only through the tf checkpoint (no
    FileScan); the feedback set, weighted query and 1-row totals are
    the only broadcasts; dl joins stay shuffle-merge; final top-20 is
    TakeOrderedAndProject."""
    p = plan_of(spark, "q245_rm3_expansion_rescore")
    assert "FileScan" not in p
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" in p  # the dl joins
    assert "CartesianProduct" not in p


def test_bitext_margin_final_plan_reads_scored_checkpoint(spark):
    """q246: the FINAL plan reads only the checkpointed margin-scored
    pair table (normalize/assign/pair/denominator work all landed in
    upstream checkpoints — no corpus FileScan, no re-derivation of the
    pair fan-out for each of the 3 consumers); the two mutual-best
    joins stay pinned shuffle-merge (both sides are the unbounded
    scored-pair table Catalyst's static stats would broadcast at test
    scale); top-20 is TakeOrderedAndProject."""
    p = plan_of(spark, "q246_margin_bitext_mining")
    assert "FileScan" not in p
    assert p.count("Scan ExistingRDD") == 3  # besta, bestb, final join
    assert p.count("SortMergeJoin") == 2
    assert "BroadcastHashJoin" not in p
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p


def test_calibration_final_plan_reads_bin_checkpoint(spark):
    """q247: the corpus lands in the ≤10-row per-bin checkpoint in one
    pass; the final plan (per-bin projection ∪ ALL-row re-aggregate)
    reads ONLY that checkpoint — no FileScan, no join, and the one
    single-partition exchange feeds the bounded bin table, never corpus
    rows (the q220 doubled-pipeline failure mode)."""
    p = plan_of(spark, "q247_calibration_report")
    assert "FileScan" not in p
    assert p.count("Scan ExistingRDD") == 2  # per-bin projection + ALL row
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert "CartesianProduct" not in p


def test_hard_negative_branches_read_pair_checkpoint(spark):
    """q248: the positive and negative rank branches both read the
    checkpointed in-cell pair table (the pair fan-out — the dominant
    cost — is computed once); their join stays pinned shuffle-merge
    (two unbounded derived tables Catalyst's static stats would
    broadcast at test scale); no cartesian anywhere."""
    p = plan_of(spark, "q248_hard_negative_mining")
    assert "FileScan" not in p
    assert p.count("Scan ExistingRDD") == 2  # pos branch + neg branch
    assert p.count("SortMergeJoin") == 1  # pos ⋈ neg, pinned
    assert "BroadcastHashJoin" not in p
    assert "CartesianProduct" not in p


def test_shuffle_shard_two_level_prefix_sum_shape(spark):
    """q249: the within-shard position must come from the two-level
    prefix sum — the per-(shard, bucket) rank window plus the bounded
    128-row bucket-base window broadcast back (BroadcastHashJoin) — with
    NO single-partition exchange and NO corpus-wide sort-merge join; the
    corpus is touched twice but both scans are column-pruned (doc_id,
    source vs doc_id alone for the bucket counts)."""
    p = plan_of(spark, "q249_training_shuffle_shard")
    assert p.count("FileScan") == 2
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "Exchange SinglePartition" not in p
    assert "CartesianProduct" not in p


def test_auc_branches_read_histogram_checkpoint(spark):
    """q250: the corpus lands once in the checkpointed (dow, score) cell
    table; the per-weekday rank branch and the pooled dow=-1 branch both
    derive from it — no FileScan in the final plan, no join anywhere
    (the AUC is pure windows + aggregates over the bounded histogram)."""
    p = plan_of(spark, "q250_groupwise_auc")
    assert "FileScan" not in p
    assert p.count("Scan ExistingRDD") == 2  # per-dow + pooled branches
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert "CartesianProduct" not in p


def test_isotonic_all_work_after_bin_checkpoint_is_bounded(spark):
    """q251: one corpus pass lands in the ≤10-row bin checkpoint; the
    prefix/interval/minimax machinery derives entirely from checkpoints
    (no FileScan in the final plan) and its nested-loop joins are
    bounded×bounded frames only — the q233 regime, not a corpus
    cartesian."""
    p = plan_of(spark, "q251_isotonic_calibration")
    assert "FileScan" not in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_markov_final_plan_reads_bounded_checkpoints_only(spark):
    """q252: after 16 checkpointed value-iteration rounds the FINAL plan
    reads only bounded checkpoints (no corpus FileScan, no lazy-loop
    plan blow-up — the q110 guard), its single-partition exchange feeds
    the ≤channels-row removal-effect table, and the only nested-loop
    join broadcasts the 1-row base/total frames."""
    p = plan_of(spark, "q252_markov_removal_attribution")
    assert "FileScan" not in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 1  # 1-row total broadcast


def test_ipw_branches_read_stratum_checkpoint(spark):
    """q253: one corpus pass lands in the ≤6-row stratum checkpoint;
    the per-stratum projection and the ALL-row aggregate both derive
    from it — no FileScan, no join in the final plan."""
    p = plan_of(spark, "q253_ipw_conversion_lift")
    assert "FileScan" not in p
    assert p.count("Scan ExistingRDD") == 2
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert "CartesianProduct" not in p


def test_unseen_mass_reads_term_checkpoint_only(spark):
    """q254: one corpus scan lands in the checkpointed (source, token, f)
    term table; the per-source rollup and the corpus-level ALL
    re-aggregate both read the checkpoint — no FileScan in the final
    plan, no joins, no windows (map-side combinable aggregates only)."""
    p = plan_of(spark, "q254_unseen_mass_estimate")
    assert "FileScan" not in p
    assert p.count("Scan ExistingRDD") == 2
    assert "Join" not in p and "Window" not in p
    assert "CartesianProduct" not in p


def test_stream_hll_final_plan_is_bounded_registers_only(spark):
    """q255: the final plan reads the merged-register checkpoint
    (≤types×256 rows) — no raw-events FileScan (the corpus flowed
    through the streaming sink), the spine/union/estimate work joins
    only bounded frames, no sort-merge join, no cartesian."""
    p = plan_of(spark, "q255_stream_hll_partials")
    assert "FileScan" not in p  # partials landed during build; final reads checkpoint
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_mmr_final_plan_reads_selection_checkpoint(spark):
    """q256: the corpus-sized work (BM25 over the tf checkpoint) happens
    BEFORE the candidate checkpoint; after 10 greedy rounds the final
    plan reads only the ≤10-row selection checkpoint — no FileScan, no
    join, no greedy-loop lazy-plan blow-up (the q110/q199 guard)."""
    p = plan_of(spark, "q256_mmr_diversified_topk")
    assert "FileScan" not in p
    assert "Join" not in p
    assert "CartesianProduct" not in p


def test_k_anonymity_join_pinned_and_band_checkpoint(spark):
    """q257: the orders⋈customer key join stays pinned shuffle-merge
    (both sides unbounded at scale — a forced dimension broadcast is the
    100 TB OOM); the final plan reads the ≤4-row band checkpoint for
    both the projection and the ALL row."""
    p = plan_of(spark, "q257_k_anonymity_audit")
    assert "FileScan" not in p  # final plan reads the band checkpoint
    assert p.count("Scan ExistingRDD") == 3  # projection, totals, ALL row
    assert "CartesianProduct" not in p


def test_woe_iv_reads_bin_checkpoint_only(spark):
    """q258: one corpus pass lands in the ≤6-row bin checkpoint; the
    totals broadcast and the per-bin/ALL branches all derive from
    checkpoints — no FileScan, no sort-merge join in the final plan."""
    p = plan_of(spark, "q258_woe_information_value")
    assert "FileScan" not in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_waiting_suppliers_single_window_pass_topk(spark):
    """q259: the double-correlated EXISTS/NOT-EXISTS shape must compile
    to ONE orderkey-partitioned window pass over the joined fact —
    never a second or third lineitem self-join (count the lineitem
    scans) — with pinned shuffle-merge joins and TakeOrderedAndProject
    top-20."""
    p = plan_of(spark, "q259_waiting_suppliers")
    assert p.count("FileScan") == 3  # lineitem + orders + supplier, once each
    assert "TakeOrderedAndProject" in p
    assert p.count("SortMergeJoin") == 2  # fact join + supplier join
    assert "CartesianProduct" not in p


def test_index_delete_refresh_reads_tf_checkpoint_only(spark):
    """q260: both the standing index and the deletion partial derive
    from the session tf checkpoint — no corpus FileScan; the
    vocabulary-sized old⋈delta join stays pinned shuffle-merge (never
    broadcast); top-20 is TakeOrderedAndProject."""
    p = plan_of(spark, "q260_index_delete_refresh")
    assert "FileScan" not in p
    assert "SortMergeJoin" in p
    assert "BroadcastHashJoin" not in p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_sampled_quantiles_single_histogram_pass(spark):
    """q261: ONE corpus pass lands both populations in the checkpointed
    (type, cents) histogram — the sample adds zero extra scans; all
    windows/joins downstream run over the bounded histogram (no
    FileScan, no sort-merge join in the final plan)."""
    p = plan_of(spark, "q261_sampled_quantile_fidelity")
    assert "FileScan" not in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_join_cardinality_sketch_bottom_k_is_take_ordered(spark):
    """q262: the per-side bottom-16 KMV rank window must compile to
    TakeOrderedAndProject(limit=16) — map-side top-k over the distinct
    keys, never a single-partition corpus sort (checked on the build
    plan of the sketch; the final plan then only joins ≤16-row
    checkpoints, bounded 1-row broadcasts and the pinned exact join)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from database_migrator_spark.sources import table

    o = table(spark, SF_SMOKE, "orders").select(F.col("o_custkey").alias("k"))
    h = o.distinct().select(
        "k", F.substring(F.md5(F.col("k").cast("string")), 1, 12).alias("h")
    )
    sk = (
        h.withColumn("rn", F.row_number().over(Window.orderBy("h", "k")))
        .where(F.col("rn") <= 16)
    )
    build = sk._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject(limit=16" in build
    assert "Exchange SinglePartition" not in build
    p = plan_of(spark, "q262_join_cardinality_sketch")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" in p  # the exact join, pinned


def test_skyline_single_scan_partitioned_windows(spark):
    """q270: the per-part frame is checkpointed (one lineitem scan); the
    dominance pass = one bounded-bucket broadcast + partitioned windows —
    no sort-merge join, no cartesian."""
    p = plan_of(spark, "q270_pareto_skyline_parts")
    assert "FileScan" not in p  # pp checkpoint only
    assert p.count("Scan ExistingRDD") == 2  # bucket maxima + dominance pass
    assert p.count("BroadcastHashJoin") == 1  # bounded bucket-prefix frame
    assert p.count("Window") == 3  # bounded prefix + per-bucket + same-price
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_ivm_base_is_materialized_deltas_prune(spark):
    """q271: the historical base aggregate is served from the
    materialization (exactly one RDD scan); the delta terms re-join only
    the cutoff-filtered scans (date predicates pushed); customer
    broadcasts; no cartesian, no shuffled-hash join."""
    p = plan_of(spark, "q271_join_view_delta_refresh")
    assert p.count("Scan ExistingRDD") == 1  # the stored base view
    assert "CartesianProduct" not in p and "ShuffledHashJoin" not in p
    assert "PushedFilters: [IsNotNull(o_orderdate)" in p or "orderdate" in p


def test_lpa_final_plan_reads_last_round_only(spark):
    """q272: per-round localCheckpoint keeps the lazy plan constant — the
    final plan is ONE aggregate over the round-4 labels checkpoint (no
    joins, no file scans, no window)."""
    p = plan_of(spark, "q272_label_propagation_communities")
    assert "FileScan" not in p
    assert p.count("Scan ExistingRDD") == 1
    assert "Join" not in p and "Window" not in p


def test_conformal_bounded_rank_machinery(spark):
    """q273: every corpus-scale pass reads a checkpoint (pop/calib), the
    order-statistic runs on the bounded histogram + candidate buckets,
    and all five auxiliary frames broadcast — no sort-merge join, no
    cartesian, no window in the final plan."""
    p = plan_of(spark, "q273_split_conformal_coverage")
    assert "FileScan" not in p
    assert p.count("Scan ExistingRDD") == 6
    assert p.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "Window" not in p  # rank machinery ran inside the checkpoints


def test_postings_one_text_scan_segment_local(spark):
    """q274: the tokenized corpus is checkpointed (one text scan feeds tf
    AND the posting build); gap lists assemble per (term, shard) — no
    corpus-wide per-term window, no sort-merge join, no cartesian."""
    p = plan_of(spark, "q274_postings_delta_index")
    assert "FileScan" not in p  # tokenized checkpoint only
    assert p.count("Scan ExistingRDD") == 2
    assert p.count("BroadcastHashJoin") == 1  # bounded term-level tf join
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "Window" not in p  # gaps computed inside bounded per-shard arrays


def test_wordpiece_one_corpus_scan_broadcast_vocab(spark):
    """q275: one documents scan (vocab derivation), the bounded part-word
    frame checkpointed, the top-100 vocab broadcast into the candidate
    equi-join (no LIKE theta join → no nested-loop), walk = one fold."""
    p = plan_of(spark, "q275_wordpiece_greedy_tokenize")
    assert p.count("FileScan") == 1  # documents only (part words checkpointed)
    assert p.count("BroadcastHashJoin") == 2  # vocab match + occurrence join
    assert "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_power_step_single_scan_no_matrix(spark):
    """q276: the rank-1 identity keeps the plan at ONE corpus pass into
    the 64-row checkpoint — no 64x64 materialization, no join except the
    1-row max broadcast."""
    p = plan_of(spark, "q276_power_iteration_step")
    assert "FileScan" not in p  # y checkpoint only
    assert p.count("Scan ExistingRDD") == 2  # y + its max frame
    assert p.count("BroadcastNestedLoopJoin") == 1  # 1-row ymax
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_zonemap_audit_one_scan_bounded_cross(spark):
    """q277: ONE corpus scan builds both layouts' zone maps (exploded
    layout tag before a single aggregate, checkpointed); the workload
    evaluation is a bounded files x months nested-loop — no sort-merge,
    no corpus-scale join."""
    p = plan_of(spark, "q277_zone_map_prunability")
    assert "FileScan" not in p  # zone-map checkpoint only
    assert p.count("Scan ExistingRDD") == 2  # files + its clustered slice
    assert p.count("BroadcastNestedLoopJoin") == 1  # bounded workload cross
    assert "SortMergeJoin" not in p


def test_feature_hash_join_free(spark):
    """q278: one corpus scan -> bigram-type aggregate -> 256-bucket
    rollup; no joins, no windows anywhere."""
    p = plan_of(spark, "q278_feature_hash_collisions")
    assert p.count("FileScan") == 1
    assert "Join" not in p and "Window" not in p


def test_mad_screen_histogram_only(spark):
    """q279: the corpus is scanned once into the (nation, cents)
    histogram checkpoint; median, MAD and the outlier rollup all derive
    from histogram-sized frames (windows partitioned per nation over
    bounded cells, broadcasts only)."""
    p = plan_of(spark, "q279_mad_robust_screen")
    assert "FileScan" not in p  # histogram checkpoint only
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") == 7


def test_streaks_windows_partitioned_per_user(spark):
    """q280: the islands trick runs in per-user windows only — no
    single-partition window, no join anywhere."""
    p = plan_of(spark, "q280_activity_streaks")
    assert p.count("Window") == 1
    assert "Join" not in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_lateness_two_level_prefix_max(spark):
    """q281: the global running max is two-level — the only
    single-partition window is the bounded arrival-cell prefix; the
    corpus-side window is partitioned per cell; one checkpoint scan
    feeds cells + the lateness pass + the total."""
    p = plan_of(spark, "q281_watermark_lateness_audit")
    assert "FileScan" not in p  # arrival checkpoint only
    assert p.count("Window") == 2  # bounded cell prefix + per-cell running max
    assert p.count("BroadcastHashJoin") == 1  # bounded cell-prefix frame
    assert p.count("BroadcastNestedLoopJoin") == 1  # 1-row total
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_bin_packing_single_scan_single_planning_row(spark):
    """q282: one corpus scan (size aggregate), the FFD greedy folds over
    ONE collected planning row — no joins, no windows in the plan."""
    p = plan_of(spark, "q282_compaction_bin_packing")
    assert p.count("FileScan") == 1
    assert "Join" not in p and "Window" not in p


def test_selectivity_audit_one_grouping_sets_pass(spark):
    """q283: the three pairwise actuals come from ONE Expand +
    aggregate (GROUPING SETS) over the corpus checkpoint; estimates are
    bounded stat-frame crosses (nested-loop over tens of rows)."""
    p = plan_of(spark, "q283_selectivity_independence")
    assert "FileScan" not in p
    assert p.count("Expand") == 1  # grouping sets, not three scans
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_recall_curve_shares_distances_topk_two_level(spark):
    """q284: the final plan reads the top-k checkpoint (distances and
    the chunked two-level rank ran inside it once for all levels); the
    scanned counts come from bounded rank x cell-size frames."""
    p = plan_of(spark, "q284_ivf_recall_curve")
    assert "FileScan" not in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") == 3


def test_encoding_advisor_single_scan(spark):
    """q285: one orders scan (candidates explode per row before the
    checkpoint); stats + dictionary sizes are bounded aggregates over
    it; no sort-merge join."""
    p = plan_of(spark, "q285_encoding_advisor")
    assert "FileScan" not in p  # unpivot checkpoint only
    assert p.count("Scan ExistingRDD") == 2
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_bloom_pruning_bounded_broadcasts(spark):
    """q286: one lineitem pass (probe-key checkpoint), bounded bit-table
    and build-key broadcasts; no sort-merge join, no cartesian."""
    p = plan_of(spark, "q286_bloom_join_pruning")
    assert "FileScan" not in p
    assert p.count("Scan ExistingRDD") == 3  # build, bit set, probe keys
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_clustering_factor_one_window_pass(spark):
    """q287: the lag + first/last machinery runs ONCE inside the lagged
    checkpoint; the final plan just re-reads the 1-row wide frame for
    the four candidates."""
    p = plan_of(spark, "q287_clustering_factor")
    assert "FileScan" not in p
    assert p.count("Scan ExistingRDD") == 4  # the 1-row wide frame, 4 selects
    assert "Window" not in p  # all windows ran inside the checkpoints
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_apportionment_bounded_frames(spark):
    """q288: one corpus scan into the per-source checkpoint; quotas,
    leftover and the remainder rank are bounded-frame work."""
    p = plan_of(spark, "q288_largest_remainder_allocation")
    assert "FileScan" not in p
    assert p.count("Scan ExistingRDD") == 2
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_stitch_one_smj_is_the_user_merge(spark):
    """q289: per-user windows on each half; the ONE sort-merge join is
    the full-outer user-level boundary merge (both sides corpus-keyed —
    broadcast is impossible and SMJ is the right 100 TB plan); no
    cartesian, no single-partition window."""
    p = plan_of(spark, "q289_incremental_sessionize_stitch")
    assert p.count("SortMergeJoin") == 1
    assert "CartesianProduct" not in p
    assert p.count("FileScan") == 2  # the two half scans
    assert p.count("Window") == 4  # lag + running sum per half


def test_quantile_normalization_bounded_mapping(spark):
    """q290: the corpus contributes two filtered aggregates into bounded
    histogram checkpoints; the cross-multiplied mapping join is a
    bounded nested loop."""
    p = plan_of(spark, "q290_quantile_normalization")
    assert "FileScan" not in p
    assert p.count("Scan ExistingRDD") == 4
    assert "SortMergeJoin" not in p
    assert "Window" not in p  # cumulative sums ran inside the checkpoints


def test_broadcast_audit_stats_shape(spark):
    """q291: one aggregate per table for the stats, four join counts;
    the audit frame assembly is bounded broadcasts."""
    p = plan_of(spark, "q291_broadcast_decision_audit")
    assert "CartesianProduct" not in p
    assert p.count("Scan ExistingRDD") == 2  # the 5-row stats frame, twice


def test_retrieval_metrics_two_level_topk(spark):
    """q292: tf and the tokenized corpus are checkpointed (one text
    scan), idf/query frames broadcast, per-query top-k is the chunked
    two-level rank — no corpus-wide single-partition window, no
    cartesian."""
    p = plan_of(spark, "q292_retrieval_metrics_report")
    assert "FileScan" not in p
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p


def test_vocab_growth_single_text_scan(spark):
    """q293: one text scan into the tokenized checkpoint; decile windows
    run on the 10-row frame only."""
    p = plan_of(spark, "q293_vocab_growth_curve")
    assert "FileScan" not in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert p.count("Window") == 1  # the bounded decile cumulative


def test_charngram_nb_one_vocab_join_no_cartesian(spark):
    """q307: the only corpus-scale join is the test-grams × gram-weights
    sort-merge (vocabulary-keyed, NEVER broadcast — web-scale gram
    vocabularies are unbounded); class stats attach as 5-row/1-row
    broadcasts; argmax is a per-doc window, never single-partition."""
    p = plan_of(spark, "q307_charngram_naive_bayes_langid")
    assert p.count("SortMergeJoin") == 1  # test grams x weights, nothing else
    assert "CartesianProduct" not in p
    assert "ExistingRDD" in p  # the dg / cnt checkpoints (declared substrate)


def test_unigram_lm_histogram_only_final_plan(spark):
    """q306: the corpus is touched once inside the word-histogram
    checkpoint (declared substrate) — the FINAL plan reads checkpoints
    only (no FileScan), the piece vocabulary joins as a broadcast
    (bounded BY CONSTRUCTION: all single chars + top-20 multi-char
    seeds, unlike an unbounded word vocabulary), and the top-20 is a
    TakeOrdered, never a global sort."""
    p = plan_of(spark, "q306_unigram_lm_vocabulary")
    assert "FileScan" not in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p
    assert "ExistingRDD" in p


def test_bradley_terry_corpus_pair_join_shuffle_merge(spark):
    """q308: the one corpus-scale stage is the adjacent-doc pair join —
    BOTH sides are the unbounded corpus, so it must run sort-merge
    (Catalyst's static stats would broadcast at test scale; banned for
    growing frames) and never cartesian.  Everything downstream of the
    first aggregate is item-domain-scale, so the FINAL plan reads the
    loop checkpoints only (declared substrate)."""
    from database_migrator_spark.operators.preference import bt_comparisons

    comp = bt_comparisons(spark, SF_SMOKE)
    cp = comp._jdf.queryExecution().executedPlan().toString()
    assert cp.count("SortMergeJoin") == 1
    assert "BroadcastHashJoin" not in cp and "CartesianProduct" not in cp
    p = plan_of(spark, "q308_bradley_terry_preference")
    assert "FileScan" not in p  # corpus touched once, inside the substrate
    assert "CartesianProduct" not in p
    assert "ExistingRDD" in p


def test_kappa_single_scan_partial_agg_no_join(spark):
    """q309: one corpus scan, one partial+final aggregation pair, no join
    anywhere — the confusion counts reduce map-side before the bounded
    source-domain shuffle."""
    p = plan_of(spark, "q309_annotator_agreement_kappa")
    assert p.count("FileScan") == 1
    assert p.count("HashAggregate") == 2
    assert "Join" not in p and "CartesianProduct" not in p


def test_ind_discovery_reads_checkpoint_bounded_joins(spark):
    """q310: the final plan reads the ONE value-set checkpoint (no
    FileScan — the 21 column-pruned table scans happen once, inside the
    checkpointed substrate build), expands pairs via Generate bounded
    by the per-value attribute set, and attaches the two column-domain
    counts via broadcast only — a corpus-scale sort-merge join or a
    cartesian here would mean the Sindy shape regressed into a
    values x values self-join."""
    p = plan_of(spark, "q310_inclusion_dependency_discovery")
    assert "FileScan" not in p          # reads the checkpointed substrate
    assert "Scan ExistingRDD" in p
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p and "Cartesian" not in p
    assert "Generate" in p              # bounded per-value pair expansion
