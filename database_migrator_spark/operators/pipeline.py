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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
) -> tuple[DataFrame, DataFrame]:
    """Run the full preparation pipeline; returns ``(kept, report)``.

    ``kept``: the surviving documents (original columns + 'split').
    ``report``: one (stage, n_docs) row per pipeline stage, in order.

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
