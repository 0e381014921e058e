"""Human-feedback analytics: pairwise-preference aggregation and
annotation quality — the two data shapes an RLHF / labeled-data pipeline
adds on top of raw-corpus curation.

q308 — Bradley-Terry preference-strength fit (Zermelo/MM fixed point):
the canonical model behind RLHF reward-data aggregation and chatbot-arena
leaderboards.  Comparisons are derived deterministically from the
documents table (adjacent doc_ids compete, longer document wins), the
items are the bounded ``source`` domain, and the MM update

    p_i' = W_i / sum_j n_ij / (p_i + p_j)

runs a fixed 5 rounds in BIGINT fixed point so both engines iterate
bit-identically (the q110/q306 integer-recurrence discipline).  The
oracle replays the identical recurrence as one recursive CTE with two
references to the working table (p_i and the opponent p_j — allowed in
DuckDB 1.0, q306 precedent).

q309 — Cohen's kappa inter-annotator agreement: two deterministic
pseudo-annotators label every document ("substantial" by raw length vs
by distinct-word count — thresholds probed to give mid-range kappa
0.25-0.92 at sf0.001/0.01/0.1, never saturated, never a 0/0), and kappa
is assembled per source from exact BIGINT confusion counts with ONE
double division at the end — the money-pattern rule, so partial-agg
order cannot move the hash.

Scale shape: each query touches the corpus exactly once (q308: the
adjacent-pair self-join, pinned shuffle_merge because both sides are the
unbounded corpus; q309: one groupBy).  Everything downstream of the
first aggregate is item-domain-scale (sources × sources at most), so the
5-round BT loop shuffles only vocabulary-sized frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_migrator_spark.functions.exact import exactness_guard
from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import spread_for_cpu, table

_BT_SCALE = 1_000_000  # strengths in millionths
_BT_NUM = 1_000_000_000_000  # per-division numerator rescale (10^12)
_BT_ITERATIONS = 5

# 2^63 as a double, for exactness guards evaluated outside int64
_INT64_MAX_D = float(2**63)


def bt_comparisons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q308's comparison frame: adjacent doc_ids compete, the longer
    document's source wins; same-source and tied pairs are dropped.  The
    one corpus-scale stage of the BT fit — factored out so
    tests/test_plans.py can lock its join strategy (both sides are the
    unbounded corpus, so the pair join is pinned shuffle-merge; Catalyst's
    static stats would pick broadcast at test scale, banned for growing
    frames)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    lhs = docs.select(
        "doc_id", F.col("source").alias("src_a"), F.col("n_chars").alias("nc_a")
    )
    rhs = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.col("source").alias("src_b"),
        F.col("n_chars").alias("nc_b"),
    )
    return (
        lhs.hint("shuffle_merge")
        .join(rhs, "doc_id")
        .where((F.col("src_a") != F.col("src_b")) & (F.col("nc_a") != F.col("nc_b")))
        .select(
            F.when(F.col("nc_a") > F.col("nc_b"), F.col("src_a"))
            .otherwise(F.col("src_b"))
            .alias("winner"),
            F.when(F.col("nc_a") > F.col("nc_b"), F.col("src_b"))
            .otherwise(F.col("src_a"))
            .alias("loser"),
        )
    )


def bt_fixed_point(comp: DataFrame, iterations: int = _BT_ITERATIONS) -> DataFrame:
    """Bradley-Terry strengths over a (winner, loser) comparison frame via
    ``iterations`` rounds of the Zermelo/MM update in BIGINT millionths:

        t_ij = (n_ij * 10^12) DIV (p_i + p_j)       per observed pair
        p_i' = GREATEST((W_i * 10^12) DIV sum_j t_ij, 1)

    starting from p_i = 10^6.  All divisions floor on non-negative
    operands, so Spark ``DIV`` and DuckDB ``//`` agree bit-for-bit.
    Items with zero wins clamp to strength 1 millionth instead of zero so
    later rounds never divide by p_i + p_j = 0.  ``p`` can at most double
    per round (p_i' <= (W_i/N_i)·max_j(p_i+p_j) <= 2·max p), so 5 rounds
    stay under 2^5·10^6 and every t_ij stays positive; the 2^63 guards
    protect the n·10^12 and W·10^12 products at scale.

    Returns (i, w, games, p): item, total wins, total games, final
    fixed-point strength.  Everything here is item-domain-scale — the
    only corpus-scale work is building ``comp`` upstream.
    """
    wdir = (
        comp.groupBy("winner", "loser")
        .agg(F.count("*").alias("w"))
        .localCheckpoint(eager=True)  # static pair counts, reused 5+1 times
    )
    games = (
        wdir.select(F.col("winner").alias("i"), F.col("loser").alias("j"), "w")
        .union(wdir.select(F.col("loser").alias("i"), F.col("winner").alias("j"), "w"))
        .groupBy("i", "j")
        .agg(F.sum("w").alias("n"))
        .where(
            exactness_guard(
                F.col("n").cast("double") * _BT_NUM < _INT64_MAX_D,
                "q308: pair game count * 10^12 exceeds int64 — shrink _BT_NUM",
            )
        )
        .localCheckpoint(eager=True)
    )
    wins = (
        wdir.groupBy(F.col("winner").alias("i"))
        .agg(F.sum("w").alias("w"))
        .where(
            exactness_guard(
                F.col("w").cast("double") * _BT_NUM < _INT64_MAX_D,
                "q308: win count * 10^12 exceeds int64 — shrink _BT_NUM",
            )
        )
    )
    items = (
        games.select("i")
        .distinct()
        .join(wins, "i", "left")
        .select("i", F.coalesce(F.col("w"), F.lit(0).cast("long")).alias("w"))
    )
    p = items.select("i", "w", F.lit(_BT_SCALE).cast("long").alias("p"))
    for _ in range(iterations):
        pj = p.select(F.col("i").alias("j"), F.col("p").alias("pj"))
        d = (
            games.join(p.select("i", "p"), "i")
            .join(pj, "j")
            .select("i", F.expr(f"(n * {_BT_NUM}L) DIV (p + pj)").alias("t"))
            .groupBy("i")
            .agg(F.sum("t").alias("d"))
        )
        p = (
            p.select("i", "w")
            .join(d, "i")
            .select(
                "i",
                "w",
                F.greatest(
                    F.expr(f"(w * {_BT_NUM}L) DIV d"), F.lit(1).cast("long")
                ).alias("p"),
            )
            .localCheckpoint(eager=True)  # constant plan per round (q110 rule)
        )
    totals = games.groupBy("i").agg(F.sum("n").alias("games"))
    return p.join(totals, "i").select("i", "w", "games", "p")


@query(
    "q308_bradley_terry_preference",
    oracle=f"""
    WITH RECURSIVE comp AS (
        SELECT CASE WHEN a.n_chars > b.n_chars THEN a.source ELSE b.source END
                   AS winner,
               CASE WHEN a.n_chars > b.n_chars THEN b.source ELSE a.source END
                   AS loser
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        WHERE a.source <> b.source AND a.n_chars <> b.n_chars
    ), wdir AS (
        SELECT winner, loser, CAST(COUNT(*) AS BIGINT) AS w
        FROM comp GROUP BY 1, 2
    ), games AS (
        SELECT i, j, CAST(SUM(w) AS BIGINT) AS n FROM (
            SELECT winner AS i, loser AS j, w FROM wdir
            UNION ALL
            SELECT loser AS i, winner AS j, w FROM wdir
        ) GROUP BY 1, 2
    ), wins AS (
        SELECT winner AS i, CAST(SUM(w) AS BIGINT) AS w FROM wdir GROUP BY 1
    ), items AS (
        SELECT d.i, COALESCE(wins.w, CAST(0 AS BIGINT)) AS w
        FROM (SELECT DISTINCT i FROM games) d
        LEFT JOIN wins ON wins.i = d.i
    ), bt AS (
        SELECT i, w, CAST({_BT_SCALE} AS BIGINT) AS p, 0 AS it FROM items
        UNION ALL
        SELECT bt.i, bt.w,
               GREATEST(
                   CAST((bt.w * {_BT_NUM})
                        // SUM((g.n * {_BT_NUM}) // (bt.p + pj.p))
                        AS BIGINT),
                   CAST(1 AS BIGINT)) AS p,
               bt.it + 1 AS it
        FROM bt
        JOIN games g ON g.i = bt.i
        JOIN bt pj ON pj.i = g.j
        WHERE bt.it < {_BT_ITERATIONS}
        GROUP BY bt.i, bt.w, bt.it
    ), tot AS (
        SELECT i, CAST(SUM(n) AS BIGINT) AS games FROM games GROUP BY i
    )
    SELECT bt.i AS source, bt.w AS wins, tot.games AS games,
           CAST(bt.p AS DOUBLE) / CAST({_BT_SCALE} AS DOUBLE) AS strength
    FROM bt JOIN tot ON tot.i = bt.i
    WHERE bt.it = {_BT_ITERATIONS}
    ORDER BY strength DESC, source
    """,
    tags=("preference", "rlhf", "iterative", "llm-pipeline"),
    checkpointed_substrate=True,
)
def q308_bradley_terry_preference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference strengths over the document sources — the
    RLHF reward-data / arena-leaderboard aggregation.  Comparisons pair
    adjacent doc_ids (a deterministic stand-in for "two responses to the
    same prompt"); the longer document wins; same-source and tied pairs
    are dropped.  Five MM rounds in BIGINT millionths (see
    ``bt_fixed_point``); the oracle replays the identical integer
    recurrence as one recursive CTE.  A planted-corpus unit test pins the
    round-2 strengths where they DIFFER from round 1, so a refactor that
    stops the loop cannot stay green (the q306 lesson)."""
    fit = bt_fixed_point(bt_comparisons(spark, sf_dir))
    return (
        fit.select(
            F.col("i").alias("source"),
            F.col("w").alias("wins"),
            "games",
            (F.col("p").cast("double") / F.lit(float(_BT_SCALE))).alias("strength"),
        )
        .orderBy(F.col("strength").desc(), "source")
    )


_KAPPA_NCHARS_MIN = 300  # annotator A: "substantial" by raw length
_KAPPA_DISTINCT_MIN = 28  # annotator B: "substantial" by distinct words


@query(
    "q309_annotator_agreement_kappa",
    oracle=f"""
    WITH lab AS (
        SELECT source,
               CASE WHEN n_chars >= {_KAPPA_NCHARS_MIN}
                    THEN 1 ELSE 0 END AS a,
               CASE WHEN len(list_distinct(string_split(text, ' ')))
                         >= {_KAPPA_DISTINCT_MIN}
                    THEN 1 ELSE 0 END AS b
        FROM documents
    ), c AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a * b) AS BIGINT) AS n11,
               CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00,
               CAST(SUM(a) AS BIGINT) AS a1,
               CAST(SUM(b) AS BIGINT) AS b1
        FROM lab GROUP BY 1
    )
    SELECT source,
           n AS n_docs,
           n11 + n00 AS n_agree,
           a1 AS pos_a,
           b1 AS pos_b,
           CAST(n * (n11 + n00) - (a1 * b1 + (n - a1) * (n - b1)) AS DOUBLE)
               / CAST(n * n - (a1 * b1 + (n - a1) * (n - b1)) AS DOUBLE)
               AS kappa
    FROM c
    ORDER BY source
    """,
    tags=("preference", "annotation", "agreement", "llm-pipeline"),
)
def q309_annotator_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa inter-annotator agreement per source — the labeled-
    data QA statistic (do two annotators agree beyond chance?).  Two
    deterministic pseudo-annotators label every document "substantial":
    A by raw length (n_chars >= {_KAPPA_NCHARS_MIN}), B by distinct-word
    count (>= {_KAPPA_DISTINCT_MIN}); both thresholds were probed against
    the synthetic corpus to give mid-range kappa (0.25-0.92 across
    sf0.001/0.01/0.1 — never saturated at 1, denominator never 0).
    kappa = (n·agree − Σ marginal products) / (n² − Σ marginal products)
    is assembled from exact BIGINT confusion counts with ONE double
    division, so aggregation order cannot move the hash.  One corpus
    scan, one groupBy — nothing downstream exceeds the source domain."""
    docs = spread_for_cpu(
        table(spark, sf_dir, "documents").select("source", "n_chars", "text")
    )
    lab = docs.select(
        "source",
        (F.col("n_chars") >= _KAPPA_NCHARS_MIN).cast("long").alias("a"),
        (
            F.size(F.array_distinct(F.split(F.col("text"), " ")))
            >= _KAPPA_DISTINCT_MIN
        )
        .cast("long")
        .alias("b"),
    )
    c = lab.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum(F.col("a") * F.col("b")).alias("n11"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).alias("n00"),
        F.sum("a").alias("a1"),
        F.sum("b").alias("b1"),
    )
    # n² must stay exact in int64 (fine to ~3e9 docs per source; at 100 TB
    # shard the source domain or lift to DECIMAL before this bites)
    c = c.where(
        exactness_guard(
            F.col("n").cast("double") * F.col("n").cast("double") < _INT64_MAX_D,
            "q309: per-source doc count squared exceeds int64",
        )
    )
    pe_mass = F.col("a1") * F.col("b1") + (F.col("n") - F.col("a1")) * (
        F.col("n") - F.col("b1")
    )
    return c.select(
        "source",
        F.col("n").alias("n_docs"),
        (F.col("n11") + F.col("n00")).alias("n_agree"),
        F.col("a1").alias("pos_a"),
        F.col("b1").alias("pos_b"),
        (
            (F.col("n") * (F.col("n11") + F.col("n00")) - pe_mass).cast("double")
            / (F.col("n") * F.col("n") - pe_mass).cast("double")
        ).alias("kappa"),
    ).orderBy("source")
