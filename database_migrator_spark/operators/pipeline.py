"""End-to-end training-corpus preparation: the composition a user of this
engine actually runs — quality filter → exact dedup → near-dup canonical
pick → benchmark decontamination → split assignment — built entirely from
the declared operators so every stage is individually oracle-verified.

Each stage is lazy DataFrame algebra; nothing collects to the driver. The
near-dup stage triggers the jobs its sketch materialization and label
propagation need (same as q72/q90); everything else defers to the caller's
action. At 100 TB each intermediate would be persisted between stages —
the composition is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import spread_for_cpu, table

from database_migrator_spark.operators.dedup import (
    connected_components,
    minhash_near_duplicates,
    tokens_of,
    word_shingles,
)
from database_migrator_spark.operators.textops import (
    benchmark_decontamination,
    train_val_test_split,
)


def _width(df: DataFrame) -> int:
    """Target fan-out for the materialize sites: defaultParallelism,
    read from the session (NOT from the frame's RDD — see
    spread_for_cpu's pending-shuffle caveat)."""
    return df.sparkSession.sparkContext.defaultParallelism


def prepare_training_corpus(
    docs: DataFrame,
    bench_docs: DataFrame | None = None,
    min_tokens: int = 60,
    max_tokens: int = 500,
    max_dup3: float = 0.6,
    neardup_threshold: float = 0.6,
    decontaminate_k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Run the full preparation pipeline; returns ``(kept, report)``.

    ``kept``: the surviving documents (original columns + 'split').
    ``report``: one (stage, n_docs) row per pipeline stage, in order.

    ``materialize=True`` localCheckpoints the two expensive stage
    boundaries (exact-dedup output before sketching; neardup output
    before decontamination) so the multiple consumers of each — the next
    stage, the stage-count report, and ``kept`` — compute the stage once
    instead of re-running its window/join lineage per action. At 100 TB
    the same boundaries would persist to storage; the composition is
    identical.

    Stages:
      1. quality  — min/max token count + duplicate-trigram cap (q99's
         signals);
      2. exact    — one survivor per content digest, lowest id wins
         (q58/q97's digest);
      3. neardup  — MinHash-LSH pairs → connected components → keep the
         longest doc per cluster, lowest id on ties (q28/q72/q90);
      4. decontam — drop docs sharing any k-token shingle with
         ``bench_docs`` (q98), skipped when ``bench_docs`` is None;
      5. split    — deterministic train/val/test hash assignment (q93).
    """
    sid = F.col(id_col)

    # the quality stage is CPU-bound per-row HOF work (tokenize +
    # trigram shingles) and single-file inputs arrive as ONE partition —
    # spread across all cores before any per-row expression runs
    docs = spread_for_cpu(docs)

    toks = tokens_of(text_col)
    n = F.size(toks)
    sh3 = word_shingles(toks, 3)
    dup3 = F.when(
        n >= 3,
        F.lit(1.0) - F.size(F.array_distinct(sh3)).cast("double") / (n - 2).cast("double"),
    ).otherwise(F.lit(1.0))
    quality = docs.where(
        (n >= min_tokens) & (n <= max_tokens) & (dup3 <= F.lit(max_dup3))
    )

    from pyspark.sql import Window

    digest = F.md5(F.encode(text_col, "UTF-8"))
    w_digest = Window.partitionBy("__digest").orderBy(sid)
    exact = (
        quality.withColumn("__digest", digest)
        .withColumn("__rn", F.row_number().over(w_digest))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    if materialize:
        # consumed by the sketch, the members join, the anti-join AND two
        # stage counts — compute the scan+filter+window exactly once.
        # Re-spread first: AQE coalesces the tiny-by-bytes digest-window
        # shuffle to ONE partition, which would serialize every
        # downstream CPU-bound shingle lambda onto a single core.
        # UNCONDITIONAL repartition, not spread_for_cpu: this frame has a
        # pending shuffle, and spread_for_cpu's RDD probe would execute
        # the whole upstream stage as an extra job (see its docstring);
        # AQE's coalescing means the frame is narrow here by construction.
        exact = exact.repartition(_width(exact)).localCheckpoint(eager=True)

    pairs = minhash_near_duplicates(
        exact, id_col=id_col, text_col=text_col, threshold=neardup_threshold, bands=32
    )
    comp = connected_components(pairs)
    members = comp.join(exact, comp["id"] == sid).select(
        "component", sid.alias("__m_id"), F.length(text_col).alias("__len")
    )
    w_comp = Window.partitionBy("component").orderBy(
        F.col("__len").desc(), F.col("__m_id")
    )
    losers = (
        members.withColumn("__rn", F.row_number().over(w_comp))
        .where(F.col("__rn") > 1)
        .select(F.col("__m_id").alias(id_col))
    )
    neardup = exact.join(losers, id_col, "left_anti")
    if materialize:
        # consumed by decontamination's shingle explode, a stage count,
        # and (via clean) the split — the most expensive frame to
        # re-derive; keep it spread for the k-gram lambdas downstream.
        # Same pending-shuffle rule as above: repartition unconditionally.
        neardup = neardup.repartition(_width(neardup)).localCheckpoint(eager=True)

    if bench_docs is not None:
        contaminated = benchmark_decontamination(
            neardup, bench_docs, k=decontaminate_k, id_col=id_col, text_col=text_col
        ).select(F.col("doc_id").alias(id_col))
        clean = neardup.join(contaminated, id_col, "left_anti")
    else:
        clean = neardup

    kept = train_val_test_split(clean, key_col=id_col).drop("__digest")

    def stage_count(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.lit(name).alias("stage"), F.count("*").alias("n_docs"))

    report = (
        stage_count("0_input", docs)
        .unionByName(stage_count("1_quality", quality))
        .unionByName(stage_count("2_exact_dedup", exact))
        .unionByName(stage_count("3_neardup_canonical", neardup))
        .unionByName(stage_count("4_decontaminated", clean))
        .unionByName(stage_count("5_split_total", kept))
    )
    return kept, report


@query(
    "q101_corpus_pipeline_report",
    oracle=r"""
    WITH RECURSIVE train_docs AS (
        SELECT * FROM documents WHERE doc_id % 97 <> 0
    ), m AS (
        SELECT doc_id,
               len(t) AS n_toks,
               CASE WHEN len(t) >= 3 THEN
                 CAST(1 AS DOUBLE)
                   - CAST(len(list_distinct(list_transform(
                         generate_series(1, len(t) - 2),
                         i -> array_to_string(t[i:i+2], ' ')))) AS DOUBLE)
                     / CAST(len(t) - 2 AS DOUBLE)
               ELSE CAST(1 AS DOUBLE) END AS dup3
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 t -> len(t) > 0) AS t
              FROM train_docs)
    ), quality AS (
        SELECT d.* FROM train_docs d JOIN m USING (doc_id)
        WHERE m.n_toks >= 60 AND m.n_toks <= 500 AND m.dup3 <= 0.6
    ), exact AS (
        SELECT * FROM (
            SELECT q.*, row_number() OVER (PARTITION BY md5(text)
                                           ORDER BY doc_id) AS rn
            FROM quality q
        ) WHERE rn = 1
    ), sh AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_distinct(list_transform(
                             generate_series(1, len(t) - 2),
                             i -> array_to_string(t[i:i+2], ' ')))
                    ELSE [array_to_string(t, ' ')]
               END AS s
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 t -> len(t) > 0) AS t
              FROM exact)
    ), pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.6
    ), edges AS (
        SELECT a_id AS src, b_id AS dst FROM pairs
        UNION ALL
        SELECT b_id AS src, a_id AS dst FROM pairs
    ), reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ), comp AS (
        SELECT src AS id, LEAST(src, MIN(dst)) AS component
        FROM reach GROUP BY src
    ), losers AS (
        SELECT doc_id FROM (
            SELECT e.doc_id,
                   row_number() OVER (PARTITION BY c.component
                                      ORDER BY length(e.text) DESC, e.doc_id) AS crn
            FROM comp c JOIN exact e ON c.id = e.doc_id
        ) WHERE crn > 1
    ), neardup AS (
        SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM losers)
    ), bench8 AS (
        SELECT DISTINCT unnest(s) AS g FROM (
            SELECT list_distinct(CASE WHEN len(t) >= 8
                 THEN list_transform(generate_series(1, len(t) - 7),
                                     i -> array_to_string(t[i:i+7], ' '))
                 ELSE [array_to_string(t, ' ')] END) AS s
            FROM (SELECT list_filter(string_split_regex(lower(text), '\s+'),
                                     t -> len(t) > 0) AS t
                  FROM documents WHERE doc_id % 97 = 0)
        )
    ), contaminated AS (
        SELECT DISTINCT doc_id FROM (
            SELECT doc_id, unnest(s) AS g FROM (
                SELECT doc_id,
                       list_distinct(CASE WHEN len(t) >= 8
                            THEN list_transform(generate_series(1, len(t) - 7),
                                                i -> array_to_string(t[i:i+7], ' '))
                            ELSE [array_to_string(t, ' ')] END) AS s
                FROM (SELECT doc_id,
                             list_filter(string_split_regex(lower(text), '\s+'),
                                         t -> len(t) > 0) AS t
                      FROM neardup)
            )
        ) t JOIN bench8 b ON t.g = b.g
    ), clean AS (
        SELECT * FROM neardup
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT stage, n_docs FROM (
        SELECT '0_input' AS stage, COUNT(*) AS n_docs FROM train_docs
        UNION ALL SELECT '1_quality', COUNT(*) FROM quality
        UNION ALL SELECT '2_exact_dedup', COUNT(*) FROM exact
        UNION ALL SELECT '3_neardup_canonical', COUNT(*) FROM neardup
        UNION ALL SELECT '4_decontaminated', COUNT(*) FROM clean
        UNION ALL SELECT '5_split_total', COUNT(*) FROM clean
    )
    ORDER BY stage
    """,
    tags=("pipeline", "llm-pipeline", "e2e"),
    checkpointed_substrate=True,
    bench=False,  # the composition of q99+q58+q28+q72+q90+q98+q93, each
    # of which the headline bench already times individually — benching
    # the composed run would double-count ~15s of identical stage CPU
)
def q101_corpus_pipeline_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible CORRECTNESS row for the flagship end-to-end corpus
    pipeline: every docs with doc_id % 97 == 0 plays the benchmark set
    (same carve as q98), the rest flow through quality filter → exact
    dedup → near-dup canonical pick → decontamination → split, and the
    result is the per-stage document-count report. The oracle replays
    each stage in DuckDB from the pieces the gate already hash-verified
    stage-by-stage (q99 quality, q58 digest dedup, q66 O(N²) Jaccard
    pairs, q72 recursive-CTE components, q90 canonical pick, q98
    8-gram decontamination). Like q66/q72/q90, the O(N²) oracle is
    sf0.01-only; sf0.1 runs Spark-side (LSH + pointer-jumping CC)."""
    d = table(spark, sf_dir, "documents")
    bench_docs = d.where(F.col("doc_id") % 97 == 0)
    train = d.where(F.col("doc_id") % 97 != 0)
    _, report = prepare_training_corpus(train, bench_docs=bench_docs)
    return report.orderBy("stage")
