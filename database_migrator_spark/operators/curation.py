"""Corpus-curation operators beyond per-document scoring: novelty against
corpus order, cross-source contamination, content-defined chunk dedup,
approximate-membership (Bloom) ingest pre-filters, and data-constrained
mixing budgets.

These extend the LLM-data-pipeline surface (SURVEY.md §2B E14/E15 family)
with the *between-document* and *between-source* signals a 100 TB curation
run needs. Reference parity note: the reference (Database::Migrator,
`/root/reference/lib/Database/Migrator/Core.pm`) has no analytics surface;
these operators belong to the driver-mandated extension inventory, not the
§2A port.

Every query here follows the repo determinism contract (plans/registry.py):
total ORDER BY, identical aliases on both engines, BIGINT/DOUBLE/STRING
output columns only, and exact integer numerators under every DOUBLE
division so hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from database_migrator_spark.functions.exact import EXACT_DOUBLE_BOUND, exactness_guard, int_div
from database_migrator_spark.operators.dedup import tokens_of, word_shingles
from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import spread_for_cpu, table


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Re-spread a (possibly single-file, hence single-partition) scan
    before CPU-heavy per-row HOF work — see CLAUDE.md invariants.
    Conditional: no-ops on already-wide inputs (sources.spread_for_cpu)."""
    return spread_for_cpu(df)


# ---------------------------------------------------------------------------
# q118 — n-gram novelty against corpus order
# ---------------------------------------------------------------------------


@query(
    "q118_ngram_novelty",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           t -> len(t) > 0) AS t
        FROM documents
    ), grams AS (
        SELECT DISTINCT doc_id, list_aggregate(t[i:i+7], 'string_agg', ' ') AS g
        FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
        WHERE len(t) >= 8
    ), firsts AS (
        SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
    )
    SELECT grams.doc_id,
           COUNT(*) AS n_distinct_grams,
           CAST(SUM(CASE WHEN firsts.first_doc = grams.doc_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN firsts.first_doc = grams.doc_id
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS novelty_frac
    FROM grams JOIN firsts USING (g)
    GROUP BY grams.doc_id
    ORDER BY grams.doc_id
    """,
    tags=("text", "dedup", "novelty", "curation", "llm-pipeline"),
)
def q118_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence novelty score: for each document with ≥ 8 tokens,
    the fraction of its DISTINCT 8-token windows whose first appearance in
    corpus order (min doc_id) is this document. The diversity-ordered
    curation signal: a recrawl or boilerplate-heavy shard scores near 0,
    genuinely new text near 1 — the per-document complement of q113's
    corpus-wide repeated-span fraction.

    Shape at scale: one explode to (doc, gram) with an in-row
    array_distinct (so a gram repeated within one document costs one
    shuffle row, not many), then the first-occurrence attaches via
    min(doc_id) OVER (PARTITION BY gram) — ONE gram-keyed exchange whose
    per-gram groups are df-sized, instead of the former gram-keyed min
    aggregate + shuffle-merge join back that re-derived the explode on
    both join sides and crossed two exchanges (the q162-substrate
    lesson, r14 wave 3/4; the distinct-gram table is corpus-sized and
    must never be broadcast either way — q103's lesson). Production
    would fold grams to 128-bit digests before the shuffle; the string key
    keeps this oracle exact cross-engine."""
    from pyspark.sql import Window

    d = _spread(spark, table(spark, sf_dir, "documents"))
    toks = tokens_of("text")
    g = d.where(F.size(toks) >= 8).select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(toks, 8))).alias("g"),
    )
    first_doc = F.min("doc_id").over(Window.partitionBy("g"))
    novel = (F.col("first_doc") == F.col("doc_id")).cast("long")
    return (
        g.withColumn("first_doc", first_doc)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_distinct_grams"),
            F.sum(novel).alias("n_novel"),
            (F.sum(novel).cast("double") / F.count("*")).alias("novelty_frac"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q119 — cross-source n-gram contamination matrix
# ---------------------------------------------------------------------------


@query(
    "q119_cross_source_overlap",
    oracle=r"""
    WITH toks AS (
        SELECT source,
               list_filter(string_split_regex(lower(text), '\s+'),
                           t -> len(t) > 0) AS t
        FROM documents
    ), grams AS (
        SELECT DISTINCT source, list_aggregate(t[i:i+7], 'string_agg', ' ') AS g
        FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
        WHERE len(t) >= 8
    ), sizes AS (
        SELECT source, COUNT(*) AS n FROM grams GROUP BY source
    ), shared AS (
        SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
        FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_shared,
           CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    ORDER BY source_a, source_b
    """,
    tags=("text", "contamination", "curation", "llm-pipeline"),
    checkpointed_substrate=True,
)
def q119_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-level 8-gram Jaccard overlap — the cross-source
    contamination matrix (mirror syndication, scraped-twice domains)
    curation reads before setting mixing weights; only pairs that share at
    least one gram appear.

    Shape at scale: the (source, gram) set is built with one distinct
    shuffle; the pair expansion self-joins on the gram key, so each gram
    contributes C(s,2) rows where s = how many sources contain it — bounded
    by the source count, NOT the corpus size. This is a source-level
    (dozens-to-hundreds of shards) diagnostic: at domain granularity one
    first buckets domains, and a gram shared by all S sources is
    boilerplate to cap or drop before the join (same cap instrumentation as
    the MinHash band buckets). The per-source size table is a few hundred
    rows — the one legitimately broadcast side."""
    # Grams come from the SHARED 8-gram ingest artifact (q98/q145's
    # doc_shingles_cached, built once per session and reported under
    # ingest.gram_fit) joined back to sources — re-shingling here ran
    # the 8-gram HOF three times (sizes + both self-join sides; round-7
    # rescan audit). Short-doc fallback grams (< 8 tokens, excluded by
    # the original size(toks) >= 8 guard) are filtered by word count —
    # every regular-path gram has exactly 8.
    from database_migrator_spark.operators.textops import doc_shingles_cached

    sh = doc_shingles_cached(spark, sf_dir)
    src = table(spark, sf_dir, "documents").select("doc_id", "source")
    g = (
        sh.join(src, "doc_id")
        .select("source", F.explode("s").alias("g"))
        .where(F.size(F.split(F.col("g"), " ")) == 8)
        .distinct()
        # read by the size table AND both self-join sides — materialize
        # the distinct (source, gram) set once
        .localCheckpoint(eager=True)
    )
    sizes = g.groupBy("source").agg(F.count("*").alias("n"))
    # the distinct (source, gram) table is corpus-sized: the self-join must
    # stay a shuffle join (Catalyst's static stats would happily broadcast
    # it at test scale — the q103 lesson, locked in test_plans.py)
    a, b = g.alias("a"), g.hint("shuffle_merge").alias("b")
    shared = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count("*").alias("n_shared"))
    )
    sa = F.broadcast(sizes).withColumnRenamed("source", "source_a").withColumnRenamed("n", "na")
    sb = F.broadcast(sizes).withColumnRenamed("source", "source_b").withColumnRenamed("n", "nb")
    return (
        shared.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            (
                F.col("n_shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_shared"))
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# q120 — content-defined chunking + chunk-level dedup stats
# ---------------------------------------------------------------------------

_CDC_WINDOW = 8  # rolling window width (chars)
_CDC_HEX_PREFIX = "0"  # boundary iff md5(window) starts with this ⇒ P=1/16


def cdc_chunks(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode documents into content-defined chunks: a boundary closes at
    character position i (1-indexed, i ≥ 8) iff the md5 of the 8-char
    window ending at i starts with hex '0' (P = 1/16 ⇒ ~16-char mean
    chunks at this test scale; production tunes window/prefix for ~1-4 KB
    chunks). Boundaries depend only on local content, so a span shared by
    two documents yields identical interior chunks regardless of its
    offset — the property that makes chunk-level dedup robust to
    insertions, where fixed-size blocking is not (the FastCDC/LBFS
    rationale). Returns (doc_id, source, chunk).

    Real CDC imposes min/max chunk bounds with a stateful scan; the
    windowed-hash form here keeps the operator a pure per-row column
    expression (JVM-side, no UDF) and, deliberately, keeps it expressible
    in one SQL statement for the cross-engine oracle.

    ``chunk_idx`` is the 0-based position of the chunk within its
    document — rows shuffle freely, so any consumer that reassembles
    documents (or packs chunks in order) must sort on it."""
    bounds = F.expr(
        f"""
        CASE WHEN length({text_col}) >= {_CDC_WINDOW} THEN
            filter(sequence({_CDC_WINDOW}, length({text_col})),
                   i -> substring(md5(encode(substring({text_col}, i - {_CDC_WINDOW - 1}, {_CDC_WINDOW}), 'UTF-8')), 1, {len(_CDC_HEX_PREFIX)}) = '{_CDC_HEX_PREFIX}')
        ELSE CAST(array() AS array<int>) END
        """
    )
    with_b = docs.select("doc_id", "source", F.col(text_col).alias("__t"), bounds.alias("__b"))
    chunks = F.expr(
        """
        filter(
            zip_with(
                concat(array(1), transform(__b, b -> b + 1)),
                concat(__b, array(length(__t))),
                (s, e) -> substring(__t, s, e - s + 1)),
            c -> length(c) > 0)
        """
    )
    return with_b.select(
        "doc_id", "source", F.posexplode(chunks).alias("chunk_idx", "chunk")
    )


@query(
    "q120_cdc_chunk_dedup",
    oracle=r"""
    WITH docs AS (
        SELECT doc_id, source, text, length(text) AS L FROM documents
    ), b AS (
        SELECT doc_id, i
        FROM docs, unnest(range(8, L + 1)) AS u(i)
        WHERE substr(md5(substr(text, CAST(i AS INT) - 7, 8)), 1, 1) = '0'
    ), bl AS (
        SELECT doc_id, list_sort(list(i)) AS bs FROM b GROUP BY doc_id
    ), withb AS (
        SELECT d.doc_id, d.source, d.text, d.L,
               COALESCE(bl.bs, CAST([] AS BIGINT[])) AS bs
        FROM docs d LEFT JOIN bl USING (doc_id)
    ), spans AS (
        SELECT doc_id, source, text,
               unnest(list_prepend(CAST(1 AS BIGINT),
                                   list_transform(bs, x -> x + 1))) AS s,
               unnest(list_append(bs, L)) AS e
        FROM withb
    ), chunks AS (
        SELECT doc_id, source,
               substr(text, CAST(s AS INT), CAST(e - s + 1 AS INT)) AS chunk
        FROM spans
        WHERE e >= s
    )
    SELECT source,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_chunks,
           COUNT(DISTINCT chunk) AS n_distinct_chunks,
           1 - CAST(COUNT(DISTINCT chunk) AS DOUBLE) / COUNT(*) AS dup_frac,
           CAST(SUM(length(chunk)) AS DOUBLE) / COUNT(*) AS avg_chunk_chars
    FROM chunks
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "dedup", "cdc", "chunking", "curation", "llm-pipeline"),
)
def q120_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (rolling-hash boundaries) with per-source
    chunk-level dedup stats — the storage/dedup tier below document-level
    (q25/q58) and span-level (q113) dedup: chunk boundaries move with the
    content, so shared spans dedup even when their byte offsets differ.

    Shape at scale: boundary detection and chunk slicing are per-row array
    expressions (no shuffle); the only shuffles are the per-source
    aggregate's two count-distincts. Chunk TEXT is carried here to stay
    oracle-exact; production shuffles 16-byte chunk digests instead, and
    tunes window/prefix to KB-scale chunks so the explode factor is
    ~doc_len/chunk_len. HOF lambdas are interpreted ⇒ the scan is
    re-spread across cores first (CLAUDE.md)."""
    d = _spread(spark, table(spark, sf_dir, "documents"))
    ch = cdc_chunks(d)
    return (
        ch.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_chunks"),
            F.countDistinct("chunk").alias("n_distinct_chunks"),
            (
                F.lit(1)
                - F.countDistinct("chunk").cast("double") / F.count("*")
            ).alias("dup_frac"),
            (F.sum(F.length("chunk")).cast("double") / F.count("*")).alias(
                "avg_chunk_chars"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q121 — Bloom-filter approximate-membership ingest pre-filter
# ---------------------------------------------------------------------------

_BLOOM_K = 4  # hash functions = 4 disjoint 16-bit slices of md5
_BLOOM_BITS = 1 << 16  # m = 65,536 bits (one 16-bit slice addresses all)


def _bloom_positions(h: Column) -> Column:
    """Array of k=4 bit positions in [0, 65536): four disjoint 16-bit
    slices of the md5 hex digest — deterministic and computable by any
    engine, which is what makes the whole approximate structure
    hash-checkable cross-engine."""
    return F.array(
        *[
            F.conv(F.substring(h, 1 + 4 * j, 4), 16, 10).cast("long")
            for j in range(_BLOOM_K)
        ]
    )


@query(
    "q121_bloom_ingest_filter",
    oracle=r"""
    WITH d AS (
        SELECT doc_id, md5(lower(text)) AS h FROM documents
    ), pos AS (
        SELECT doc_id,
               ( (strpos('0123456789abcdef', substr(h, 1 + 4*j, 1)) - 1) * 4096
               + (strpos('0123456789abcdef', substr(h, 2 + 4*j, 1)) - 1) * 256
               + (strpos('0123456789abcdef', substr(h, 3 + 4*j, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(h, 4 + 4*j, 1)) - 1) ) AS p
        FROM d, unnest([0, 1, 2, 3]) AS u(j)
    ), histset AS (
        SELECT DISTINCT p FROM pos WHERE doc_id % 10 < 8
    ), histkeys AS (
        SELECT DISTINCT h FROM d WHERE doc_id % 10 < 8
    ), probe AS (
        SELECT doc_id, h FROM d
        WHERE doc_id % 10 >= 8 OR (doc_id % 10 < 8 AND doc_id % 3 = 0)
    ), probed AS (
        SELECT pr.doc_id, CAST(COUNT(hs.p) AS BIGINT) AS n_set
        FROM probe pr
        JOIN pos ON pos.doc_id = pr.doc_id
        LEFT JOIN histset hs ON pos.p = hs.p
        GROUP BY pr.doc_id
    )
    SELECT pr.doc_id,
           CAST(CASE WHEN probed.n_set = 4 THEN 1 ELSE 0 END AS BIGINT) AS flagged,
           CAST(CASE WHEN hk.h IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dup
    FROM probe pr
    JOIN probed ON probed.doc_id = pr.doc_id
    LEFT JOIN histkeys hk ON hk.h = pr.h
    ORDER BY pr.doc_id
    """,
    tags=("dedup", "bloom", "incremental", "ingest", "E14", "llm-pipeline"),
    checkpointed_substrate=True,
)
def q121_bloom_ingest_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter approximate-membership pre-filter for incremental
    ingest: the historical corpus (doc_id%10 < 8, as q97) is folded into a
    65,536-bit Bloom filter (k=4 hash slices of the content md5); the
    probe batch — the new slice plus a re-presented recrawl slice
    (doc_id%3 == 0 of history, the true duplicates) — checks its k bits.
    Output per probe document: `flagged` (Bloom says maybe-seen) and
    `is_dup` (exact ground truth), so the driver's hash gate verifies BOTH
    the no-false-negative invariant (is_dup=1 ⇒ flagged=1) and the exact
    deterministic false-positive set.

    Why this is the 100 TB shape: the filter is a FIXED-SIZE sketch
    (8 KiB here; GB-scale for 10^11 keys) built with one map-side
    aggregate over 16-byte digests and broadcast to every ingest executor
    — probing is then shuffle-free, and only the ~p fraction of
    maybe-seen survivors pays q97's exact digest anti-join. Spark's own
    runtime-filter machinery ships blooms the same way. The bit positions
    are md5 slices (not xxhash) precisely so the sketch is
    engine-reproducible and the oracle can check it bit-for-bit.

    Here the bitmap lives as a ≤1024-row (word, bits) table — built
    distributed, broadcast like any fixed-size dimension; nothing is
    collected to the driver."""
    # (doc_id, digest) is read by the history positions, the probe set
    # and the ground-truth join — checkpoint the 16-byte digests so the
    # full text is md5'd once, not four times (round-7 rescan audit)
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.md5(F.encode(F.lower(F.col("text")), "UTF-8")).alias("h"))
        .localCheckpoint(eager=True)
    )
    pos = d.select("doc_id", "h", F.explode(_bloom_positions(F.col("h"))).alias("p"))
    hist_pos = pos.where(F.col("doc_id") % 10 < 8)
    # the Bloom bitmap: 65,536 bits packed into <=1024 int64 words
    words = hist_pos.groupBy(F.shiftright("p", 6).alias("word")).agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(p % 64 AS INT))")).alias("bits")
    )
    probe = d.where(
        (F.col("doc_id") % 10 >= 8)
        | ((F.col("doc_id") % 10 < 8) & (F.col("doc_id") % 3 == 0))
    )
    probe_bits = (
        probe.select("doc_id", F.explode(_bloom_positions(F.col("h"))).alias("p"))
        .join(F.broadcast(words), F.shiftright("p", 6) == F.col("word"), "left")
        .select(
            "doc_id",
            F.coalesce(
                F.expr("CAST(shiftright(bits, CAST(p % 64 AS INT)) & 1L AS INT)"),
                F.lit(0),
            ).alias("hit"),
        )
        .groupBy("doc_id")
        .agg((F.min("hit") == 1).cast("long").alias("flagged"))
    )
    # ground truth: q97's exact digest check — the historical key set is
    # corpus-sized, so both it and the probe-sized result join are pinned
    # to shuffle joins; ONLY the fixed-size bitmap above may broadcast
    hist_keys = d.where(F.col("doc_id") % 10 < 8).select("h").distinct()
    truth = probe.join(
        hist_keys.withColumn("__seen", F.lit(1)).hint("shuffle_merge"), "h", "left"
    ).select("doc_id", F.coalesce(F.col("__seen"), F.lit(0)).cast("long").alias("is_dup"))
    return (
        probe_bits.join(truth.hint("shuffle_merge"), "doc_id")
        .select("doc_id", "flagged", "is_dup")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q122 / q128 — data-constrained mixing: the shared rate pipeline
# ---------------------------------------------------------------------------

# ONE definition of the mixing algebra (alpha=0.5 temperature weights,
# 2× budget, 1e6 fixed-point scale) serving BOTH the plan (q122) and its
# materialization (q128) on BOTH engines — a tweak applied to one query
# but not the other would silently desynchronize the materialized corpus
# from the plan it claims to implement.
_RATES_CTES = r"""g AS (
        SELECT source,
               CAST(SUM(CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                             t -> len(t) > 0)) AS BIGINT))
                    AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY source
    ), w AS (
        SELECT *, CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS wq
        FROM g
    ), t AS (
        SELECT CAST(SUM(wq) AS BIGINT) AS total_wq,
               CAST(SUM(n_tokens) AS BIGINT) * 2 AS budget
        FROM w
    )"""


def _mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source fixed-point temperature weights + the 2× token budget:
    columns (source, n_tokens, wq, total_wq, budget) — the Spark twin of
    ``_RATES_CTES``. Guarded: the BIGINT→DOUBLE weight division is exact
    only below 2^53 (q104's bound), asserted loudly in-plan."""
    d = _spread(spark, table(spark, sf_dir, "documents"))
    g = d.groupBy("source").agg(
        F.sum(F.size(tokens_of("text")).cast("long")).alias("n_tokens")
    )
    w = g.withColumn(
        "wq",
        F.round(F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1000000.0)).cast(
            "long"
        ),
    )
    t = w.agg(
        F.sum("wq").alias("total_wq"),
        (F.sum("n_tokens") * F.lit(2)).alias("budget"),
    )
    return w.crossJoin(F.broadcast(t)).where(
        exactness_guard(
            (F.col("total_wq").cast("double") < F.lit(EXACT_DOUBLE_BOUND))
            & (F.col("budget").cast("double") < F.lit(EXACT_DOUBLE_BOUND)),
            "mixture rates: Σ√tokens normalizer or budget >= 2^53 — the "
            "BIGINT→DOUBLE division would silently round; rescale the 1e6 "
            "fixed-point factor",
        )
    )


# Repetition ceiling for q122.  The Muennighoff et al. (2023) guidance is
# ~4 epochs, but under the shared 2x budget the near-uniform synthetic
# sources all imply ~2.0 epochs (temperature alpha=0.5 barely moves
# near-equal weights), so a 4.0 ceiling NEVER bound — over_cap was
# identically 0 at every SF while hash-green (the r14 constant-column
# audit's catch).  2.0 sits at the median implied epochs, so the
# redistribution branch genuinely splits the sources at every SF; the
# production number is a policy knob either way.
_EPOCH_CAP = 2.0


@query(
    "q122_mixture_epochs",
    oracle=f"""
    WITH {_RATES_CTES}
    SELECT source, n_tokens,
           CAST(wq AS DOUBLE) / total_wq AS weight,
           (CAST(budget AS DOUBLE) * wq / total_wq) / n_tokens AS epochs,
           LEAST((CAST(budget AS DOUBLE) * wq / total_wq) / n_tokens,
                 CAST({_EPOCH_CAP} AS DOUBLE)) AS capped_epochs,
           CAST(CASE WHEN (CAST(budget AS DOUBLE) * wq / total_wq) / n_tokens
                          > CAST({_EPOCH_CAP} AS DOUBLE)
                     THEN 1 ELSE 0 END AS BIGINT) AS over_cap
    FROM w CROSS JOIN t
    ORDER BY source
    """,
    tags=("text", "mixing", "budget", "curation", "llm-pipeline"),
)
def q122_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained mixing plan: given temperature weights
    (alpha = 0.5, q104's scheme) and a total training-token budget of
    2× the corpus, how many EPOCHS of each source does the sampled mix
    imply — and which sources blow past the repetition ceiling
    (_EPOCH_CAP — see its comment; the data-constrained scaling
    literature's ~4-epoch guidance never bound on this corpus, so the
    demo ceiling sits at the median implied epochs). Sources with
    `over_cap` = 1 are the ones whose weight must be redistributed (or
    whose data must grow) before launch.

    One aggregate for per-source token totals; the normalizer/budget is a
    broadcast single row. Arithmetic is the q104 fixed-point pattern: the
    weight numerator is a BIGINT (exactly representable < 2^53), and all
    downstream values are IEEE double ops on identical inputs, so both
    engines produce bit-identical epochs. Spark SQL literals are written
    CAST(4.0 AS DOUBLE) because bare 4.0 is DECIMAL in SQL text."""
    epochs = (
        F.col("budget").cast("double") * F.col("wq") / F.col("total_wq")
    ) / F.col("n_tokens")
    return (
        _mixture_weights(spark, sf_dir)
        .select(
            "source",
            "n_tokens",
            (F.col("wq").cast("double") / F.col("total_wq")).alias("weight"),
            epochs.alias("epochs"),
            F.least(epochs, F.lit(_EPOCH_CAP)).alias("capped_epochs"),
            (epochs > F.lit(_EPOCH_CAP)).cast("long").alias("over_cap"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q125 — curriculum ordering: stage buckets + reproducible shuffle key
# ---------------------------------------------------------------------------


@query(
    "q125_curriculum_order",
    oracle=r"""
    WITH scored AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                    t -> len(t) > 0)) AS BIGINT) AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
        FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(ntile(5) OVER (ORDER BY n_tokens, doc_id) AS BIGINT) AS stage,
           shuffle_key
    FROM scored
    ORDER BY stage, shuffle_key, doc_id
    """,
    tags=("text", "curriculum", "ordering", "curation", "llm-pipeline"),
)
def q125_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for training: documents are split into 5 stages
    by token length (short→long — the sequence-length curriculum), each
    with a deterministic md5 shuffle key so the within-stage training
    order is reproducible and backfill-stable (re-running on the same
    corpus yields byte-identical order; the writer just sorts by
    (stage, shuffle_key) when materializing shards).

    The interesting part is HOW stage is computed: the oracle uses
    ``ntile(5) OVER (ORDER BY ...)`` — an inherently single-partition
    global sort that would never survive 100 TB. The Spark side produces
    the IDENTICAL assignment with q94's two-level prefix-sum shape
    instead: a token-length histogram (bounded by max sequence length, a
    few thousand rows) gets cumulative base offsets on the driver-sized
    table; each document's global rank is then base(n_tokens) +
    row_number within its length group (a per-length window, fully
    distributed); and ntile's bucket arithmetic (first N%k buckets get
    one extra row) is applied to the rank in closed form. No global sort,
    no single reducer touches the corpus."""
    from pyspark.sql import Window

    d = _spread(spark, table(spark, sf_dir, "documents"))
    scored = d.select(
        "doc_id",
        F.size(tokens_of("text")).cast("long").alias("n_tokens"),
        F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")).alias("shuffle_key"),
    )
    hist = scored.groupBy("n_tokens").agg(F.count("*").alias("cnt"))
    w_cum = Window.orderBy("n_tokens").rowsBetween(Window.unboundedPreceding, -1)
    base = hist.select(
        "n_tokens", F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).alias("base")
    )
    totals = hist.agg(F.sum("cnt").alias("n_total"))
    w_rn = Window.partitionBy("n_tokens").orderBy("doc_id")
    ranked = (
        scored.withColumn("rn", F.row_number().over(w_rn))
        .join(F.broadcast(base), "n_tokens")
        .crossJoin(F.broadcast(totals))
        .withColumn("rank0", F.col("base") + F.col("rn") - 1)
        .withColumn("qq", F.expr("n_total DIV 5"))
        .withColumn("rr", F.expr("n_total % 5"))
    )
    stage = F.when(
        F.col("rank0") < (F.col("qq") + 1) * F.col("rr"),
        F.expr("rank0 DIV (qq + 1) + 1"),
    ).otherwise(F.expr("rr + (rank0 - (qq + 1) * rr) DIV qq + 1"))
    return ranked.select(
        "doc_id", "n_tokens", stage.alias("stage"), "shuffle_key"
    ).orderBy("stage", "shuffle_key", "doc_id")


# ---------------------------------------------------------------------------
# q126 — marginal vocabulary contribution per source (Heaps-style curve)
# ---------------------------------------------------------------------------


@query(
    "q126_vocab_contribution",
    oracle=r"""
    WITH toks AS (
        SELECT source, unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                          t -> len(t) > 0)) AS tok
        FROM documents
    ), per_src AS (
        SELECT source, COUNT(*) AS n_tokens FROM toks GROUP BY source
    ), firsts AS (
        SELECT tok, MIN(source) AS first_source FROM toks GROUP BY tok
    ), marginal AS (
        SELECT first_source AS source, COUNT(*) AS new_tokens
        FROM firsts GROUP BY first_source
    )
    SELECT p.source,
           p.n_tokens,
           COALESCE(m.new_tokens, 0) AS new_tokens,
           CAST(SUM(COALESCE(m.new_tokens, 0))
                OVER (ORDER BY p.source) AS BIGINT) AS cum_vocab,
           CAST(SUM(p.n_tokens) OVER (ORDER BY p.source) AS BIGINT) AS cum_tokens
    FROM per_src p LEFT JOIN marginal m ON m.source = p.source
    ORDER BY p.source
    """,
    tags=("text", "vocabulary", "heaps", "curation", "llm-pipeline"),
)
def q126_vocab_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal vocabulary contribution per source — the Heaps-law curve
    at shard granularity: adding sources in name order, how many NEVER-
    SEEN-BEFORE tokens does each contribute (new_tokens), and how do
    cumulative vocabulary vs cumulative token volume grow. The curation
    read: a source whose marginal vocabulary is near zero is redundant
    with earlier shards (candidate for downweighting); a hapax-heavy one
    is either valuable diversity or noise to inspect.

    Shape at scale: one (token)-keyed min aggregate over the token stream
    (the only corpus-sized shuffle — same key as q103's vocabulary join),
    then everything else happens on the SOURCE-sized table: the marginal
    counts, the left join, and the cumulative window (ordered over a few
    hundred rows — the one place a single-partition window is correct by
    construction, exactly like q125's length histogram). MIN(source) is a
    string min — identical total order in both engines (ASCII sources)."""
    d = _spread(spark, table(spark, sf_dir, "documents"))
    toks = d.select("source", F.explode(tokens_of("text")).alias("tok"))
    per_src = toks.groupBy("source").agg(F.count("*").alias("n_tokens"))
    marginal = (
        toks.groupBy("tok")
        .agg(F.min("source").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("new_tokens"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_src.join(F.broadcast(marginal), "source", "left")
        .withColumn("new_tokens", F.coalesce(F.col("new_tokens"), F.lit(0)))
        .select(
            "source",
            "n_tokens",
            "new_tokens",
            F.sum("new_tokens").over(w).cast("long").alias("cum_vocab"),
            F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q128 — mixture materialization: per-document copy counts under the plan
# ---------------------------------------------------------------------------


@query(
    "q128_mixture_materialize",
    oracle=f"""
    WITH {_RATES_CTES}, rates AS (
        SELECT source,
               LEAST((CAST(budget AS DOUBLE) * wq / total_wq) / n_tokens,
                     CAST(4.0 AS DOUBLE)) AS epochs
        FROM w CROSS JOIN t
    )
    SELECT d.doc_id, d.source,
           CAST(floor(r.epochs) AS BIGINT)
           + CASE WHEN ( (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
                       + (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR)), 2, 1)) - 1) * 256
                       + (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR)), 3, 1)) - 1) * 16
                       + (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR)), 4, 1)) - 1) )
                      < (r.epochs - floor(r.epochs)) * 65536
                  THEN 1 ELSE 0 END AS n_copies
    FROM documents d JOIN rates r ON r.source = d.source
    ORDER BY d.doc_id
    """,
    tags=("text", "mixing", "sampling", "materialize", "curation", "llm-pipeline"),
)
def q128_mixture_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the q122 mixing plan: per document, how many COPIES
    enter the training corpus under the capped epoch rates — integer part
    deterministic, fractional part decided by a reproducible per-document
    md5 coin (doc_id-keyed, so re-runs, retries, and engine changes all
    sample the SAME documents; the md5-slice coin is q121's
    engine-reproducible trick, which is what lets the hash gate cover a
    sampling operator exactly instead of 'rows look plausible').

    Shape at scale: per-source rates are a broadcast few-hundred-row
    table; the copy decision is a per-row expression — one map-side pass
    over the corpus, no shuffle at all beyond the rate aggregate. The
    writer downstream would explode n_copies (0..4) into rows; kept as a
    count here so the declared result stays one row per document.

    The rate algebra is ``_mixture_weights`` — the SAME code and oracle
    CTEs as q122, so plan and materialization cannot drift apart."""
    d = _spread(spark, table(spark, sf_dir, "documents"))
    epochs = F.least(
        (F.col("budget").cast("double") * F.col("wq") / F.col("total_wq"))
        / F.col("n_tokens"),
        F.lit(4.0),
    )
    rates = _mixture_weights(spark, sf_dir).select("source", epochs.alias("epochs"))
    coin = (
        F.conv(
            F.substring(F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 1, 4),
            16,
            10,
        ).cast("long")
    )
    n_copies = F.floor("epochs").cast("long") + (
        coin.cast("double") < (F.col("epochs") - F.floor("epochs")) * F.lit(65536.0)
    ).cast("long")
    return (
        d.select("doc_id", "source")
        .join(F.broadcast(rates), "source")
        .select("doc_id", "source", n_copies.alias("n_copies"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q136 — Count-Min frequency sketch (mergeable, engine-reproducible)
# ---------------------------------------------------------------------------

#: Count-Min geometry: 4 independent hash rows of 256 counters (2 md5 hex
#: chars each). Deliberately NARROW so collisions are real at test scale
#: (150 keys at sf0.01, ~1500 at sf0.1 over 256 columns) and the
#: min-over-rows estimate visibly does its job; a production sketch sizes
#: w = ceil(e/eps) for the wanted +/- eps*N error.
CMS_D, CMS_W = 4, 256


def _cms_positions(h: Column) -> Column:
    """CMS_D (row, position) pairs from disjoint 2-hex-char md5 slices —
    md5, not xxhash, so DuckDB can recompute the sketch bit-for-bit
    (the q121/q37 engine-reproducible-randomness pattern)."""
    return F.array(*[
        F.struct(
            F.lit(j).alias("j"),
            F.conv(F.substring(h, 1 + 2 * j, 2), 16, 10).cast("int").alias("p"),
        )
        for j in range(CMS_D)
    ])


@query(
    "q136_countmin_frequency",
    oracle=r"""
    WITH k AS (
        SELECT user_id, md5(CAST(user_id AS VARCHAR)) AS h,
               COUNT(*) AS c
        FROM events GROUP BY user_id
    ), pos AS (
        SELECT user_id, c, j,
               ( (strpos('0123456789abcdef', substr(h, 1 + 2*j, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(h, 2 + 2*j, 1)) - 1) ) AS p
        FROM k, unnest([0, 1, 2, 3]) AS u(j)
    ), counters AS (
        SELECT j, p, CAST(SUM(c) AS BIGINT) AS cnt FROM pos GROUP BY j, p
    ), top AS (
        SELECT user_id, c FROM k ORDER BY c DESC, user_id LIMIT 20
    )
    SELECT t.user_id AS user_id,
           CAST(t.c AS BIGINT)   AS true_cnt,
           CAST(MIN(co.cnt) AS BIGINT) AS est_cnt
    FROM top t
    JOIN pos ON pos.user_id = t.user_id
    JOIN counters co ON co.j = pos.j AND co.p = pos.p
    GROUP BY t.user_id, t.c
    ORDER BY true_cnt DESC, user_id
    """,
    tags=("sketch", "countmin", "frequency", "E10", "llm-pipeline"),
)
def q136_countmin_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch, hash-matched bit-for-bit: per-user
    event counts fold into a FIXED-SIZE d=4 x w=256 counter matrix (bit
    positions are md5 hex slices, so DuckDB rebuilds the identical
    sketch), then the top-20 true-heavy keys are estimated back out as
    min over the d counters each key hashes to. The driver's hash gate
    thus verifies the sketch's exact deterministic content AND the
    one-sided error contract (est_cnt >= true_cnt always; equality
    whenever none of a key's 4 cells collide) — accuracy is additionally
    property-tested in tests/test_curation.py.

    The 100 TB shape: counters are LINEAR, so the sketch builds as one
    map-side-combinable aggregate over pre-aggregated (key, count) rows
    and merges across partitions/batches/days by cell-wise addition —
    the same mergeability contract as q95's HLL and q121's Bloom. The
    finished <=d*w-row sketch is the only thing broadcast (a few KB);
    frequency queries against it are then shuffle-free. Spark's own
    CountMinSketch (df.stat.countMinSketch) uses a JVM random seed —
    md5 slices trade a little speed for cross-engine reproducibility."""
    e = table(spark, sf_dir, "events")
    keyed = e.groupBy("user_id").agg(F.count("*").alias("c"))
    hk = keyed.select(
        "user_id", "c",
        F.md5(F.encode(F.col("user_id").cast("string"), "UTF-8")).alias("h"),
    )
    pos = hk.select(
        "user_id", "c", F.explode(_cms_positions(F.col("h"))).alias("jp")
    ).select("user_id", "c", F.col("jp.j").alias("j"), F.col("jp.p").alias("p"))
    counters = pos.groupBy("j", "p").agg(F.sum("c").alias("cnt"))
    top = keyed.orderBy(F.desc("c"), "user_id").limit(20)
    return (
        F.broadcast(top)
        .join(pos.select("user_id", "j", "p"), "user_id")
        .join(F.broadcast(counters), ["j", "p"])
        .groupBy("user_id", "c")
        .agg(F.min("cnt").alias("est_cnt"))
        .select("user_id", F.col("c").cast("long").alias("true_cnt"), "est_cnt")
        .orderBy(F.desc("true_cnt"), "user_id")
    )


@query(
    "q186_weighted_sample",
    oracle="""
    WITH keyed AS (
        SELECT source, doc_id, n_chars,
               ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                        AS BIGINT) + 1) / 281474976710656.0)
               / CAST(n_chars AS DOUBLE) AS k
        FROM documents
    )
    SELECT source, doc_id, n_chars,
           CAST(rank() OVER (PARTITION BY source
                             ORDER BY k DESC, doc_id) AS BIGINT) AS rnk
    FROM keyed
    QUALIFY rnk <= 5
    ORDER BY source, rnk, doc_id
    """,
    tags=("sampling", "weighted", "reservoir", "curation", "llm-pipeline"),
)
def q186_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT an RNG — the A-ES (Efraimidis–
    Spirakis) exponential-key scheme with engine-reproducible
    pseudo-randomness: each doc draws u ∈ (0,1] from an md5 slice of
    its id (the q121/q37 pattern — identical 48-bit integer on both
    engines, +1 to dodge ln(0)) and keys by ln(u)/weight with weight =
    n_chars; the top-5 keys per source ARE a weighted-without-
    replacement sample (a doc's inclusion probability is proportional
    to its weight). This is how a 100 TB curation pipeline samples
    reproducibly: retries, speculative tasks, and re-runs all agree
    because the "randomness" is a pure function of the row. Every float
    op (one double division to u, ln, divide by weight) runs on
    IDENTICAL inputs on both engines, so the selected sets match under
    the hash. The rank()<=5 window compiles to WindowGroupLimit — only
    <=5 rows per input partition survive BEFORE the per-source sort, so
    a source never sorts its full corpus on one task (plan-locked)."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    m48 = F.conv(
        F.substring(F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 1, 12),
        16,
        10,
    ).cast("long")
    u = (m48 + 1) / F.lit(281474976710656.0)
    k = F.log(u) / F.col("n_chars").cast("double")
    w = Window.partitionBy("source").orderBy(F.col("k").desc(), "doc_id")
    return (
        d.select("source", "doc_id", "n_chars", k.alias("k"))
        .withColumn("rnk", F.rank().over(w).cast("long"))
        .where(F.col("rnk") <= 5)
        .select("source", "doc_id", "n_chars", "rnk")
        .orderBy("source", "rnk", "doc_id")
    )


@query(
    "q199_greedy_coverage",
    oracle=r"""
    WITH RECURSIVE dt AS (
        SELECT DISTINCT doc_id, tok AS term FROM (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                      t -> len(t) > 0)) AS tok
            FROM documents
        )
    ), greedy AS (
        SELECT 0 AS r,
               CAST([] AS BIGINT[]) AS sel_docs,
               CAST([] AS VARCHAR[]) AS covered,
               CAST(NULL AS BIGINT) AS doc_id,
               CAST(NULL AS BIGINT) AS gain,
               CAST(0 AS BIGINT) AS covered_total
        UNION ALL
        SELECT s.r + 1,
               list_append(s.sel_docs, p.doc_id),
               list_distinct(list_concat(
                   s.covered,
                   (SELECT list(term) FROM dt WHERE dt.doc_id = p.doc_id))),
               p.doc_id, p.gain,
               CAST(len(list_distinct(list_concat(
                   s.covered,
                   (SELECT list(term) FROM dt WHERE dt.doc_id = p.doc_id))))
                   AS BIGINT)
        FROM greedy s, LATERAL (
            SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS gain
            FROM dt d
            WHERE NOT list_contains(s.covered, d.term)
              AND NOT list_contains(s.sel_docs, d.doc_id)
            GROUP BY d.doc_id
            ORDER BY gain DESC, d.doc_id
            LIMIT 1
        ) p
        WHERE s.r < 5
    )
    SELECT r AS round, doc_id, gain AS new_terms, covered_total
    FROM greedy WHERE r >= 1 ORDER BY r
    """,
    tags=("curation", "selection", "submodular", "coverage", "llm-pipeline"),
    checkpointed_substrate=True,
)
def q199_greedy_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy coverage-maximization selection — the submodular
    data-SELECTION operator (facility-location / maximum-coverage
    family) curation pipelines use to pick a small, maximally-diverse
    subset: 5 rounds, each selecting the document that adds the most
    NEW distinct terms to the covered vocabulary (tie -> lowest
    doc_id), reporting per-round marginal gain and cumulative coverage.
    The classic (1 - 1/e) greedy guarantee makes exactly this loop the
    standard curation primitive.  Per round at scale: one term-keyed
    LEFT ANTI join of the (doc, term) table against the covered-vocab
    checkpoint (never broadcast - vocabulary is unbounded derived), a
    per-doc count, and a 1-row TakeOrdered argmax that stays ON THE
    CLUSTER (crossJoin-broadcast carries it into the next round — no
    driver collect, the q110/q147 discipline); covered vocab is
    localCheckpointed per round so the lazy plan stays constant-size.
    Reads the shared `doc_term_frequencies` substrate — corpus scanned
    once.  The oracle replays the identical greedy loop as a
    list-state recursive CTE with a LATERAL argmax (q106's
    one-statement-trainer precedent)."""
    from database_migrator_spark.operators.textops import doc_term_frequencies

    dt = doc_term_frequencies(spark, sf_dir).select("doc_id", "term")
    covered = dt.select("term").where(F.lit(False)).localCheckpoint(eager=True)
    sel_docs = dt.select("doc_id").where(F.lit(False)).localCheckpoint(eager=True)
    rounds = []
    for r in range(1, 6):
        cand = (
            dt.join(sel_docs, "doc_id", "left_anti")
            .join(covered.hint("shuffle_merge"), "term", "left_anti")
            .groupBy("doc_id")
            .agg(F.count("*").alias("gain"))
        )
        pick = (
            cand.orderBy(F.col("gain").desc(), "doc_id")
            .limit(1)
            .localCheckpoint(eager=True)  # 1 row, stays on the cluster
        )
        covered = (
            covered.union(
                dt.join(pick.select("doc_id"), "doc_id", "left_semi").select("term")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        sel_docs = sel_docs.union(pick.select("doc_id")).localCheckpoint(eager=True)
        total = covered.agg(F.count("*").alias("covered_total"))
        rounds.append(
            pick.crossJoin(F.broadcast(total)).select(
                F.lit(r).cast("long").alias("round"),
                "doc_id",
                F.col("gain").alias("new_terms"),
                "covered_total",
            )
        )
    out = rounds[0]
    for r_df in rounds[1:]:
        out = out.union(r_df)
    return out.orderBy("round")


# ---------------------------------------------------------------------------
# q207 — segment-level corpus dedup with keep-first reconstruction
# ---------------------------------------------------------------------------


@query(
    "q207_segment_dedup_yield",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(lower(text), '\s+'),
                           t -> len(t) > 0) AS t
        FROM documents
    ), segs AS (
        SELECT doc_id, source, i AS seg_idx,
               array_to_string(t[10*i+1:10*i+10], ' ') AS seg,
               len(t[10*i+1:10*i+10]) AS seg_len
        FROM toks, unnest(range(0, (len(t) + 9) // 10)) AS u(i)
    ), firsts AS (
        SELECT seg, MIN(doc_id * 2147483648 + seg_idx) AS first_key
        FROM segs GROUP BY seg
    ), flagged AS (
        SELECT s.source, s.doc_id, s.seg_len,
               CASE WHEN s.doc_id * 2147483648 + s.seg_idx = f.first_key
                    THEN 1 ELSE 0 END AS kept
        FROM segs s JOIN firsts f USING (seg)
    ), per_doc AS (
        SELECT source, doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_segs,
               CAST(SUM(kept) AS BIGINT) AS n_kept,
               CAST(SUM(seg_len) AS BIGINT) AS n_tokens,
               CAST(SUM(kept * seg_len) AS BIGINT) AS n_kept_tokens
        FROM flagged GROUP BY 1, 2
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_segs) AS BIGINT) AS n_segs,
           CAST(SUM(n_kept) AS BIGINT) AS n_kept_segs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_kept_tokens) AS BIGINT) AS n_kept_tokens,
           CAST(SUM(n_kept_tokens) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE)
               AS token_yield,
           CAST(SUM(CASE WHEN 2 * n_kept_tokens < n_tokens THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_gutted
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "dedup", "segment", "curation", "c4-style", "llm-pipeline"),
)
def q207_segment_dedup_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level corpus dedup with keep-first reconstruction — the
    C4/RefinedWeb 'duplicate paragraph removal' tier between q58's
    whole-document hash dedup and q113/q118's overlapping-window span
    signals: documents are cut into NON-overlapping 10-token segments
    (the paragraph analog for the newline-free synthetic corpus,
    trailing partial kept so token accounting is total), every segment
    occurrence except the global first (min (doc_id, seg_idx), encoded
    as one BIGINT key doc_id*2^31+seg_idx so both engines take the same
    min — the 2^31 multiplier exceeds any physically possible segment
    count per document, and an exactness_guard fails the job loudly if
    a key would leave the guaranteed-ordered range) is dropped,
    and the report is the per-source yield a curation run budgets
    against: segments/tokens before vs after, plus how many documents
    lose >= half their tokens ('gutted' — candidates for whole-doc
    drop).

    Shape at scale: one explode to (doc, seg_idx, segment) rows, then
    the global first-occurrence key attaches via min(key) OVER
    (PARTITION BY seg) — ONE segment-keyed exchange whose per-segment
    groups are occurrence-count-sized, instead of the former
    segment-keyed min aggregate + shuffle-merge join back that
    re-derived the segment explode on both join sides (the
    q113/q118/q294 wave-4 recipe; the segment table is corpus-sized and
    must never be broadcast either way), then a bounded per-source
    rollup. Production would fold segments to 128-bit digests before
    the shuffle; the string key keeps the oracle exact cross-engine
    (q118's discipline)."""
    from pyspark.sql import Window

    d = _spread(spark, table(spark, sf_dir, "documents"))
    toks = tokens_of("text")
    segs = d.select(
        "source",
        "doc_id",
        F.posexplode(
            # guard: sequence(0, -1) would DESCEND for empty docs
            F.when(
                F.size(toks) > 0,
                F.transform(
                    F.sequence(
                        F.lit(0), F.ceil(F.size(toks) / F.lit(10)).cast("int") - 1
                    ),
                    lambda i: F.slice(toks, i * 10 + 1, 10),
                ),
            ).otherwise(F.array().cast("array<array<string>>")),
        ).alias("seg_idx", "seg_toks"),
    ).select(
        "source",
        "doc_id",
        (F.col("doc_id") * F.lit(2**31) + F.col("seg_idx")).alias("key"),
        F.array_join("seg_toks", " ").alias("seg"),
        F.size("seg_toks").cast("long").alias("seg_len"),
    ).where(
        # keep-first is MIN over doc_id*2^31+seg_idx: ordered iff
        # seg_idx < 2^31 (10-token segments => docs < ~21G tokens) and
        # doc_id < 2^32 (key stays inside int64). Fail loudly otherwise.
        exactness_guard(
            (F.col("seg_idx") < F.lit(2**31)) & (F.col("doc_id") < F.lit(2**32)),
            "q207 keep-first key would collide or overflow int64",
        )
    )
    first_key = F.min("key").over(Window.partitionBy("seg"))
    kept = (F.col("key") == F.col("first_key")).cast("long")
    per_doc = (
        segs.withColumn("first_key", first_key)
        .groupBy("source", "doc_id")
        .agg(
            F.count("*").alias("n_segs"),
            F.sum(kept).alias("n_kept"),
            F.sum("seg_len").alias("n_tokens"),
            F.sum(kept * F.col("seg_len")).alias("n_kept_tokens"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_segs").alias("n_segs"),
            F.sum("n_kept").alias("n_kept_segs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_kept_tokens").alias("n_kept_tokens"),
            (
                F.sum("n_kept_tokens").cast("double")
                / F.sum("n_tokens").cast("double")
            ).alias("token_yield"),
            F.sum(
                (F.lit(2) * F.col("n_kept_tokens") < F.col("n_tokens")).cast("long")
            ).alias("n_docs_gutted"),
        )
        .orderBy("source")
    )


@query(
    "q220_doc_prefix_templates",
    oracle=r"""
    WITH p AS (
        SELECT source,
               array_to_string(
                   (list_filter(string_split_regex(lower(text), '\s+'),
                                t -> len(t) > 0))[1:5], ' ') AS prefix
        FROM documents
    ), c AS (
        SELECT source, prefix, CAST(COUNT(*) AS BIGINT) AS n_docs_with_prefix
        FROM p GROUP BY 1, 2
    ), tot AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM p GROUP BY 1
    ), r AS (
        SELECT source, prefix, n_docs_with_prefix,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_docs_with_prefix DESC, prefix)
                   AS template_rank
        FROM c
    )
    SELECT r.source, r.template_rank, r.prefix, r.n_docs_with_prefix,
           t.n_docs,
           CAST(r.n_docs_with_prefix AS DOUBLE) / t.n_docs AS share
    FROM r JOIN tot t USING (source)
    WHERE template_rank <= 3
    ORDER BY source, template_rank
    """,
    tags=("text", "boilerplate", "template", "curation", "llm-pipeline"),
    checkpointed_substrate=True,  # the (source, prefix) count frame feeds tot + the rank window
)
def q220_doc_prefix_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate detection by document PREFIX — the corpus-
    level companion of q113/q118's within-document span signals: pages
    generated from the same template share their opening tokens, so the
    top recurring 5-token prefixes per source (count + share of the
    source's documents) flag templated shards a curation run caps or
    strips (the C4 'same opening boilerplate' read). Shape at scale:
    one prefix projection (no explode — a 5-element slice per doc), one
    (source, prefix)-keyed count, per-source top-3 via a rank window
    that Spark rewrites to WindowGroupLimit (map-side per-partition
    top-k, so the post-aggregation shuffle carries <= 3 rows per source
    per partition, never the full prefix table), and a bounded
    per-source totals broadcast back."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    toks = tokens_of("text")
    p = d.select(
        "source", F.array_join(F.slice(toks, 1, 5), " ").alias("prefix")
    )
    c = p.groupBy("source", "prefix").agg(
        F.count("*").alias("n_docs_with_prefix")
    ).localCheckpoint(eager=True)
    # every document contributes exactly ONE prefix row, so the
    # per-source totals are derivable from the bounded aggregate —
    # re-scanning the corpus for them would double the dominant cost.
    # The checkpoint makes that actually true in the PLAN: without it,
    # Catalyst re-derives the whole tokenize+aggregate pipeline for the
    # tot branch (2 FileScans, no ReusedExchange — the round-9 ADVICE
    # finding), exactly what q225/q230/q233 checkpoint against.
    tot = c.groupBy("source").agg(F.sum("n_docs_with_prefix").alias("n_docs"))
    w = Window.partitionBy("source").orderBy(
        F.col("n_docs_with_prefix").desc(), "prefix"
    )
    return (
        c.withColumn("template_rank", F.row_number().over(w))
        .where(F.col("template_rank") <= 3)
        .join(F.broadcast(tot), "source")
        .select(
            "source",
            "template_rank",
            "prefix",
            "n_docs_with_prefix",
            "n_docs",
            (
                F.col("n_docs_with_prefix").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("share"),
        )
        .orderBy("source", "template_rank")
    )


@query(
    "q221_kmv_distinct_fidelity",
    oracle="""
    WITH du AS (
        SELECT DISTINCT event_type, user_id FROM events
    ), hh AS (
        SELECT event_type, user_id,
               substr(md5(CAST(user_id AS VARCHAR)), 1, 12) AS h
        FROM du
    ), bt AS (
        SELECT event_type, user_id, h FROM (
            SELECT event_type, user_id, h,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY h, user_id) AS rn
            FROM hh
        ) WHERE rn <= 16
    ), sk AS (
        SELECT event_type AS scope, CAST(COUNT(*) AS BIGINT) AS n_sk,
               MAX(h) AS hk
        FROM bt GROUP BY 1
    ), ex AS (
        SELECT event_type AS scope, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM du GROUP BY 1
    ), gu AS (
        SELECT DISTINCT user_id, h FROM bt
    ), gb AS (
        SELECT user_id, h FROM (
            SELECT user_id, h, row_number() OVER (ORDER BY h, user_id) AS rn
            FROM gu
        ) WHERE rn <= 16
    ), rows_ AS (
        SELECT sk.scope, ex.n_exact, sk.n_sk, sk.hk
        FROM sk JOIN ex USING (scope)
        UNION ALL
        SELECT 'ALL', (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events),
               CAST(COUNT(*) AS BIGINT), MAX(h)
        FROM gb
    ), est AS (
        SELECT scope, n_exact,
               CASE WHEN n_sk < 16 THEN n_sk
                    ELSE 4222124650659840 // ((strpos('0123456789abcdef', substr(hk, 1, 1)) - 1) * 17592186044416 + (strpos('0123456789abcdef', substr(hk, 2, 1)) - 1) * 1099511627776 + (strpos('0123456789abcdef', substr(hk, 3, 1)) - 1) * 68719476736 + (strpos('0123456789abcdef', substr(hk, 4, 1)) - 1) * 4294967296 + (strpos('0123456789abcdef', substr(hk, 5, 1)) - 1) * 268435456 + (strpos('0123456789abcdef', substr(hk, 6, 1)) - 1) * 16777216 + (strpos('0123456789abcdef', substr(hk, 7, 1)) - 1) * 1048576 + (strpos('0123456789abcdef', substr(hk, 8, 1)) - 1) * 65536 + (strpos('0123456789abcdef', substr(hk, 9, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(hk, 10, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(hk, 11, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(hk, 12, 1)) - 1) * 1) END AS kmv_estimate
        FROM rows_
    )
    SELECT scope, n_exact, kmv_estimate,
           CAST(kmv_estimate - n_exact AS DOUBLE) / n_exact AS rel_err
    FROM est
    ORDER BY scope
    """,
    tags=("sketch", "kmv", "distinct", "mergeable", "fidelity", "E10"),
    checkpointed_substrate=True,
)
def q221_kmv_distinct_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    '''KMV (k-minimum-values, bottom-k) distinct-count sketch with its
    fidelity report — the third mergeable-distinct tier next to the HLL
    family (q95, approximate, rows-only) and the exact bitmaps
    (q189/q190): per event type the 16 smallest md5 values over the
    distinct user set (fixed-width hex, so MIN-of-string IS min-hash —
    q210\'s portability trick), the standard unbiased estimate
    (k-1)*2^48 DIV h_(k) from the k-th minimum, and the signed relative
    error vs the exact COUNT(DISTINCT). The \'ALL\' row is computed BY
    MERGING the per-type sketches (union of bottom-k sets, re-take the
    bottom 16 — the lossless KMV merge, since every global bottom-16
    hash is in its own type\'s bottom-16) and scored against the exact
    global distinct — the hash gate covers merge correctness, estimator
    arithmetic (pure BIGINT, no float hash math), and the n<k
    exact-fallback convention in one query. Shape at scale: one
    distinct shuffle, a rank<=16 window Spark rewrites to
    WindowGroupLimit (map-side per-partition bottom-k, so the window
    shuffle carries 16 rows per partition per type, never the corpus);
    hex->int conversion happens AFTER the bottom-k filter, on <= 17
    bounded rows. The exact counts are the ground-truth side a fidelity
    query exists to compare against — production reads the sketch only.
    '''
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").select("event_type", "user_id")
    du = (
        e.distinct()
        .withColumn("h", F.substring(F.md5(F.col("user_id").cast("string")), 1, 12))
        .localCheckpoint(eager=True)  # read by the window AND the exact counts
    )
    w = Window.partitionBy("event_type").orderBy("h", "user_id")
    bt = (
        du.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 16)
        .localCheckpoint(eager=True)  # bounded: <= 16 rows per type
    )
    sk = bt.groupBy(F.col("event_type").alias("scope")).agg(
        F.count("*").alias("n_sk"), F.max("h").alias("hk")
    )
    ex = du.groupBy(F.col("event_type").alias("scope")).agg(
        F.count("*").alias("n_exact")
    )
    per_type = sk.join(ex, "scope")
    gu = bt.select("user_id", "h").distinct()
    wg = Window.orderBy("h", "user_id")  # bounded derived table (<= 16*types)
    gb = gu.withColumn("rn", F.row_number().over(wg)).where(F.col("rn") <= 16)
    g_ex = du.select("user_id").distinct().agg(F.count("*").alias("n_exact"))
    g_row = (
        gb.agg(F.count("*").alias("n_sk"), F.max("h").alias("hk"))
        .crossJoin(F.broadcast(g_ex))
        .select(F.lit("ALL").alias("scope"), "n_exact", "n_sk", "hk")
    )
    est = F.when(F.col("n_sk") < 16, F.col("n_sk")).otherwise(
        F.expr("4222124650659840L DIV CAST(conv(hk, 16, 10) AS BIGINT)")
    )
    return (
        per_type.unionByName(g_row)
        .select(
            "scope",
            "n_exact",
            est.alias("kmv_estimate"),
            (
                (est - F.col("n_exact")).cast("double")
                / F.col("n_exact").cast("double")
            ).alias("rel_err"),
        )
        .orderBy("scope")
    )


@query(
    "q249_training_shuffle_shard",
    oracle="""
    WITH k AS (
        SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ), keyed AS (
        SELECT doc_id, source,
               CAST('0x' || substr(h, 1, 4) AS BIGINT) % 8 AS shard,
               substr(h, 5, 12) AS okey
        FROM k
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                   ORDER BY okey, doc_id) - 1 AS BIGINT) AS pos,
           doc_id, source
    FROM keyed
    ORDER BY shard, pos
    """,
    tags=("curation", "shuffle", "sharding", "llm-pipeline"),
)
def q249_training_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle — the manifest stage
    between curation and the trainer: every document gets a (shard,
    position) under a pseudo-random permutation, so epoch order is
    decorrelated from ingest order (adjacent crawl/source runs would
    otherwise land in the same batches). Keys are md5 slices of the
    doc_id (the q121/q242 trick): engine-reproducible and Spark-retry-
    safe where rand() is neither — a re-run, a failed-task retry, and
    the DuckDB oracle all produce the SAME permutation.

    Scale shape: the shuffle is hierarchical, never a global sort —
    shard = 4 hex chars mod 8 (a parameter; at 100 TB it is the trainer
    data-parallel degree), and WITHIN a shard the position comes from
    the q94 two-level prefix sum: row_number runs per (shard, first
    okey hex char) — 16 parallel tasks per shard whose order concats
    correctly because the bucket char is a monotone prefix of the order
    key — and the 128-row bucket-count table takes the only
    single-partition window before broadcasting back. No task ever
    sorts a whole shard."""
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    return _deterministic_shard_positions(d, passthrough=("source",)).orderBy(
        "shard", "pos"
    )


def _deterministic_shard_positions(
    d: DataFrame, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """q249's deterministic shuffle-shard core, reusable with extra
    rider columns: input (doc_id, *passthrough) → (shard, pos, doc_id,
    *passthrough) under the md5(doc_id) permutation, positions from the
    q94 two-level prefix sum (row_number per (shard, okey-head bucket) —
    128 parallel tasks — plus the bounded 128-row bucket-size prefix
    broadcast back). No task ever sorts a whole shard."""
    keyed = d.select(
        "doc_id",
        *passthrough,
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).select(
        "doc_id",
        *passthrough,
        (F.conv(F.substring("h", 1, 4), 16, 10).cast("long") % 8).alias("shard"),
        F.substring("h", 5, 12).alias("okey"),
        F.substring("h", 5, 1).alias("_bucket"),
    )
    from pyspark.sql import Window

    # Level 1: dense rank within (shard, bucket) — 128-way parallel.
    w_local = Window.partitionBy("shard", "_bucket").orderBy("okey", "doc_id")
    # Level 2: exclusive prefix of bucket sizes per shard — 128 rows total,
    # the only single-partition-per-shard window, then a broadcast join.
    w_buckets = (
        Window.partitionBy("shard")
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_base = (
        keyed.groupBy("shard", "_bucket")
        .agg(F.count("*").alias("_n"))
        .withColumn(
            "_base",
            F.coalesce(F.sum("_n").over(w_buckets), F.lit(0).cast("long")),
        )
        .select("shard", "_bucket", "_base")
    )
    return (
        keyed.withColumn("_rn", F.row_number().over(w_local))
        .join(F.broadcast(bucket_base), ["shard", "_bucket"])
        .select(
            "shard",
            (F.col("_base") + F.col("_rn") - 1).cast("long").alias("pos"),
            "doc_id",
            *passthrough,
        )
    )


_PACK_B = 512  # trainer context length (tokens per packed sequence)


@query(
    "q267_sequence_packing_report",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id,
               len(list_filter(string_split_regex(lower(text), '\s+'),
                               x -> len(x) > 0)) AS n,
               substr(md5(CAST(doc_id AS VARCHAR)), 5, 12) AS okey
        FROM documents
    ), o AS (
        SELECT doc_id, n,
               COALESCE(SUM(n) OVER (ORDER BY okey, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS start
        FROM t WHERE n > 0
    ), spans AS (
        SELECT n,
               ((start + n - 1) // {_PACK_B}) - (start // {_PACK_B}) + 1 AS span
        FROM o
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_all,
               CAST(SUM(n) AS BIGINT) AS total_tokens,
               CAST((SUM(n) + {_PACK_B - 1}) // {_PACK_B} AS BIGINT) AS n_bins
        FROM spans
    )
    SELECT CAST(span AS BIGINT) AS span,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS DOUBLE) / CAST(tot.n_docs_all AS DOUBLE) AS doc_share,
           tot.n_bins AS n_bins,
           tot.n_bins * {_PACK_B} - tot.total_tokens AS tail_waste
    FROM spans, tot
    GROUP BY span, tot.n_docs_all, tot.n_bins, tot.total_tokens
    ORDER BY span
    """,
    tags=("curation", "packing", "training", "llm-pipeline"),
    checkpointed_substrate=True,
)
def q267_sequence_packing_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing audit for trainer batches — after q249's
    deterministic shuffle, documents are concatenated in permutation
    order and split into fixed 512-token contexts (the GPT-style
    concat-and-split packing every pretraining loader runs): this
    reports, per span width (how many contexts a document straddles),
    the doc/token counts and share, plus the global context count and
    the final-context padding waste — the numbers that decide whether
    to pack naively, pad, or use best-fit. Document start offsets are a
    corpus-wide EXCLUSIVE prefix sum of token counts in (okey, doc_id)
    order, computed with q249's two-level scheme: a per-bucket window
    (16-way parallel on the okey's leading hex char — a monotone prefix
    of the order key) plus the bounded 16-row bucket-total prefix, so
    no task ever windows the whole corpus. Pure BIGINT arithmetic;
    doc_share is one exact-integer IEEE division.

    At 100 TB: one scan, one 16-way-parallel windowed pass, bounded
    broadcast — the same manifest pass that writes the packed index.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokens_of(F.col("text"))).cast("long").alias("n"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 5, 12).alias("okey"),
    ).where(F.col("n") > 0)
    keyed = d.withColumn("_bucket", F.substring("okey", 1, 1))
    from pyspark.sql import Window

    w_local = (
        Window.partitionBy("_bucket")
        .orderBy("okey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_buckets = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    bucket_base = (
        keyed.groupBy("_bucket")
        .agg(F.sum("n").alias("_bn"))
        .withColumn(
            "_base", F.coalesce(F.sum("_bn").over(w_buckets), F.lit(0).cast("long"))
        )
        .select("_bucket", "_base")
    )
    started = (
        keyed.withColumn(
            "_local", F.coalesce(F.sum("n").over(w_local), F.lit(0).cast("long"))
        )
        .join(F.broadcast(bucket_base), "_bucket")
        .select("n", (F.col("_base") + F.col("_local")).alias("start"))
    )
    spans = started.select(
        "n",
        (
            int_div(F.col("start") + F.col("n") - 1, F.lit(_PACK_B))
            - int_div(F.col("start"), F.lit(_PACK_B))
            + 1
        ).alias("span"),
    ).localCheckpoint(eager=True)  # read by the span groups AND the totals
    tot = spans.agg(
        F.count("*").alias("n_docs_all"),
        F.sum("n").alias("total_tokens"),
        int_div(F.sum("n") + F.lit(_PACK_B - 1), F.lit(_PACK_B)).alias("n_bins"),
    )
    return (
        spans.groupBy("span")
        .agg(F.count("*").alias("n_docs"), F.sum("n").alias("n_tokens"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("span").cast("long").alias("span"),
            "n_docs",
            "n_tokens",
            (
                F.col("n_docs").cast("double") / F.col("n_docs_all").cast("double")
            ).alias("doc_share"),
            "n_bins",
            (F.col("n_bins") * _PACK_B - F.col("total_tokens")).alias("tail_waste"),
        )
        .orderBy("span")
    )


_MANIFEST_FILE_DOCS = 1000  # docs per manifest file (trainer shard file size)


@query(
    "q268_shard_manifest_fingerprint",
    oracle="""
    WITH k AS (
        SELECT doc_id, source,
               len(list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> len(t) > 0)) AS n_tok,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ), keyed AS (
        SELECT doc_id, source, n_tok,
               CAST('0x' || substr(h, 1, 4) AS BIGINT) % 8 AS shard,
               substr(h, 5, 12) AS okey
        FROM k
    ), positioned AS (
        SELECT shard, source, n_tok, doc_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                       ORDER BY okey, doc_id) - 1 AS BIGINT)
                   AS pos
        FROM keyed
    ), perfile AS (
        SELECT shard, pos // 1000 AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
               md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY pos))
                   AS fmd5,
               list_distinct(list(source)) AS srcs
        FROM positioned GROUP BY 1, 2
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(len(list_distinct(flatten(list(srcs)))) AS BIGINT) AS n_sources,
           md5(string_agg(fmd5, ',' ORDER BY file_id)) AS manifest_md5
    FROM perfile GROUP BY shard
    ORDER BY shard
    """,
    tags=("curation", "provenance", "manifest", "reproducibility", "llm-pipeline"),
)
def q268_shard_manifest_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard provenance manifest — the dataset-card artifact a
    reproducible run publishes next to the data: for each of q249's
    deterministic shards, the doc/token/source totals and a CONTENT
    FINGERPRINT of the exact document order the trainer will consume.
    The fingerprint is TWO-LEVEL like the manifest files themselves:
    each 1000-doc shard file hashes its ordered doc_id list, and the
    shard hash folds the file hashes in file order — so (a) no executor
    ever concatenates a whole shard into one string (per-file lists are
    bounded), and (b) verifying one re-shipped file needs only that
    file's hash, not the shard's. Rebuilding from an identical corpus
    reproduces every hash bit-for-bit (the md5 permutation is
    engine/retry-stable); any dropped, duplicated, or reordered document
    flips the shard fingerprint — the integrity check a training run
    performs before spending GPU-hours.

    Scale shape: positions via q249's shared two-level prefix-sum helper
    (128-way parallel windows + bounded broadcast); the per-file
    ordered-list aggregate sorts ≤1000-element arrays per group
    (map-side combinable by file key); source sets are bounded (~20
    values) so the shard-level flatten-distinct is cheap."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokens_of(F.col("text"))).cast("long").alias("n_tok"),
    )
    pos = _deterministic_shard_positions(d, passthrough=("source", "n_tok"))
    perfile = (
        pos.select(
            "shard",
            int_div(F.col("pos"), F.lit(_MANIFEST_FILE_DOCS)).alias("file_id"),
            "pos",
            "doc_id",
            "source",
            "n_tok",
        )
        .groupBy("shard", "file_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("pos"),
                                    F.col("doc_id").cast("string").alias("did"),
                                )
                            )
                        ),
                        lambda x: x["did"],
                    ),
                )
            ).alias("fmd5"),
            F.collect_set("source").alias("srcs"),
        )
    )
    return (
        perfile.groupBy("shard")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.count("*").alias("n_files"),
            F.size(F.array_distinct(F.flatten(F.collect_list("srcs"))))
            .cast("long")
            .alias("n_sources"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("file_id"), F.col("fmd5")))
                        ),
                        lambda x: x["fmd5"],
                    ),
                )
            ).alias("manifest_md5"),
        )
        .select(
            F.col("shard").cast("long").alias("shard"),
            "n_docs",
            "n_tokens",
            "n_files",
            "n_sources",
            "manifest_md5",
        )
        .orderBy("shard")
    )


# --- q288: largest-remainder sample apportionment ---------------------------

# PRIME budget + TOKEN-mass weights (r14): the first shipped version
# apportioned a 10,000 budget by per-source DOC counts — but the synthetic
# generator assigns docs round-robin, so every source's count is exactly
# total/20 at every SF, every remainder was exactly 0, and the Hamilton
# remainder machinery this query exists to demonstrate NEVER fired
# (extra ≡ 0, hash-green — the r14 constant-column audit's catch).
# Weighting by per-source CHARACTER mass (which genuinely varies) with a
# prime budget makes base/remainder/extra all live at every SF.
_APPORTION_BUDGET = 9_973


@query(
    "q288_largest_remainder_allocation",
    oracle=f"""
    WITH w AS (
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS cnt FROM documents
        GROUP BY source
    ), tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_sources
        FROM w
    ), quota AS (
        SELECT w.source, w.cnt,
               ({_APPORTION_BUDGET} * w.cnt) // tot.total AS base,
               ({_APPORTION_BUDGET} * w.cnt) % tot.total AS rem
        FROM w, tot
    ), leftover AS (
        SELECT CAST({_APPORTION_BUDGET} - SUM(base) AS BIGINT) AS l FROM quota
    ), ranked AS (
        SELECT source, cnt, base, rem,
               ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr
        FROM quota
    )
    SELECT r.source AS source, r.cnt AS weight_chars,
           CAST(r.base AS BIGINT) AS base_alloc,
           CAST(CASE WHEN r.rr <= lo.l THEN 1 ELSE 0 END AS BIGINT) AS extra,
           CAST(r.base + CASE WHEN r.rr <= lo.l THEN 1 ELSE 0 END AS BIGINT)
               AS allocation,
           CAST(r.rem AS BIGINT) AS remainder_units
    FROM ranked r, leftover lo
    ORDER BY source
    """,
    tags=("curation", "sampling", "apportionment", "llm-pipeline"),
    checkpointed_substrate=True,
)
def q288_largest_remainder_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT sample apportionment by the largest-remainder (Hamilton)
    method — when a mixture recipe must materialize an EXACT total
    budget (q128's per-document md5 coin hits the budget only in
    expectation; a fixed-size eval set or per-shard quota needs the
    deterministic integer split): each source gets ⌊N·w/Σw⌋, and the
    N − Σ⌊·⌋ leftover units go to the largest fractional remainders,
    ties to the lexicographically smaller source — so Σ allocation = N
    exactly, every engine, every retry. All arithmetic is integer
    (remainders compared as N·w mod Σw — no float quotas); the source
    frame is bounded so the remainder rank is a tiny window.  Weights
    are per-source CHARACTER mass and the budget is prime — see the
    _APPORTION_BUDGET comment for why doc-count weights made every
    remainder identically zero on the round-robin synthetic corpus."""
    d = (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum("n_chars").alias("cnt"))
        .localCheckpoint(eager=True)  # one corpus scan; totals + quotas share it
    )
    tot = d.agg(F.sum("cnt").alias("total"))
    quota = (
        d.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "cnt",
            F.expr(f"({_APPORTION_BUDGET}L * cnt) DIV total").alias("base"),
            F.expr(f"({_APPORTION_BUDGET}L * cnt) % total").alias("rem"),
        )
        .localCheckpoint(eager=True)  # bounded; leftover + rank share it
    )
    from pyspark.sql import Window

    leftover = quota.agg(
        (F.lit(_APPORTION_BUDGET) - F.sum("base")).alias("l")
    )
    ranked = quota.withColumn(
        "rr", F.row_number().over(Window.orderBy(F.col("rem").desc(), "source"))
    )
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .select(
            "source",
            F.col("cnt").alias("weight_chars"),
            F.col("base").alias("base_alloc"),
            F.when(F.col("rr") <= F.col("l"), 1).otherwise(0).cast("long").alias("extra"),
            (
                F.col("base")
                + F.when(F.col("rr") <= F.col("l"), 1).otherwise(0)
            ).cast("long").alias("allocation"),
            F.col("rem").alias("remainder_units"),
        )
        .orderBy("source")
    )


# --- q290: quantile normalization between sources ---------------------------

_QNORM_REF = "src0"
_QNORM_TGT = "src1"


@query(
    "q290_quantile_normalization",
    oracle=f"""
    WITH ref AS (
        SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c FROM documents
        WHERE source = '{_QNORM_REF}' GROUP BY n_chars
    ), tgt AS (
        SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c FROM documents
        WHERE source = '{_QNORM_TGT}' GROUP BY n_chars
    ), rc AS (
        SELECT v, c,
               CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum
        FROM ref
    ), tc AS (
        SELECT v, c,
               CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum
        FROM tgt
    ), tots AS (
        SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM ref) AS ta,
               (SELECT CAST(SUM(c) AS BIGINT) FROM tgt) AS tb
    )
    SELECT t.v AS target_value, t.c AS n_docs,
           CAST(t.cum AS BIGINT) AS cum_target,
           CAST(MIN(r.v) AS BIGINT) AS mapped_value,
           CAST(MIN(r.v) - t.v AS BIGINT) AS shift
    FROM tc t, rc r, tots
    WHERE r.cum * tots.tb >= t.cum * tots.ta
    GROUP BY t.v, t.c, t.cum
    ORDER BY target_value
    """,
    tags=("curation", "normalization", "distribution", "llm-pipeline"),
    checkpointed_substrate=True,
)
def q290_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE NORMALIZATION of one source's length distribution onto a
    reference source — the rank-matching transform batch-effect
    correction uses (and a curation pipeline applies before mixing
    heterogeneous sources whose length profiles differ): each target
    value maps to the smallest reference value whose cumulative share
    reaches the target value's cumulative share, compared EXACTLY by
    integer cross-multiplication cumA·totalB ≥ cumB·totalA (no float
    quantiles anywhere). Both distributions live as VALUE-DOMAIN-BOUNDED
    histograms (distinct document lengths), so the cumulative windows
    and the mapping join are bounded-frame work — the corpus contributes
    two filtered map-side-combinable aggregates and nothing else."""
    d = table(spark, sf_dir, "documents")

    def hist(src: str) -> DataFrame:
        return (
            d.where(F.col("source") == src)
            .groupBy(F.col("n_chars").alias("v"))
            .agg(F.count("*").alias("c"))
        )

    from pyspark.sql import Window

    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    rc = (
        hist(_QNORM_REF)
        .select("v", "c", F.sum("c").over(wcum).alias("cum"))
        .localCheckpoint(eager=True)  # bounded histogram; total + mapping share
    )
    tc = (
        hist(_QNORM_TGT)
        .select("v", "c", F.sum("c").over(wcum).alias("cum"))
        .localCheckpoint(eager=True)
    )
    ta = rc.agg(F.sum("c").alias("ta"))
    tb = tc.agg(F.sum("c").alias("tb"))
    joined = (
        tc.crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .alias("t")
        .join(
            F.broadcast(rc.select(F.col("v").alias("rv"), F.col("cum").alias("rcum"))),
            F.col("rcum") * F.col("tb") >= F.col("cum") * F.col("ta"),
        )
    )
    return (
        joined.groupBy("v", "c", "cum")
        .agg(F.min("rv").alias("mapped_value"))
        .select(
            F.col("v").cast("long").alias("target_value"),
            F.col("c").alias("n_docs"),
            F.col("cum").alias("cum_target"),
            F.col("mapped_value").cast("long").alias("mapped_value"),
            (F.col("mapped_value") - F.col("v")).cast("long").alias("shift"),
        )
        .orderBy("target_value")
    )


# --- q302: Neyman allocation for stratified sampling -------------------------

_NEYMAN_BUDGET = 1000


@query(
    "q302_neyman_allocation",
    oracle=f"""
    WITH s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS sx,
               CAST(SUM(n_chars * n_chars) AS BIGINT) AS sx2
        FROM documents GROUP BY source
    ), sd AS (
        SELECT source, n,
               sqrt(CAST(n * sx2 - sx * sx AS DOUBLE)
                    / CAST(n * (n - 1) AS DOUBLE)) AS sdev
        FROM s WHERE n >= 2
    ), w AS (
        SELECT source, n, sdev,
               CAST(ROUND(CAST(n AS DOUBLE) * sdev * 1000000) AS BIGINT)
                   AS w_fp
        FROM sd
    ), tot AS (
        SELECT CAST(SUM(w_fp) AS BIGINT) AS wt,
               CAST(SUM(n) AS BIGINT) AS nt
        FROM w
    ), quota AS (
        SELECT w.source, w.n, w.sdev, w.w_fp,
               ({_NEYMAN_BUDGET} * w.w_fp) // tot.wt AS base,
               ({_NEYMAN_BUDGET} * w.w_fp) % tot.wt AS rem,
               ({_NEYMAN_BUDGET} * w.n) // tot.nt AS prop_floor
        FROM w, tot
    ), leftover AS (
        SELECT CAST({_NEYMAN_BUDGET} - SUM(base) AS BIGINT) AS l FROM quota
    ), ranked AS (
        SELECT source, n, sdev, w_fp, base, rem, prop_floor,
               ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr
        FROM quota
    )
    SELECT r.source AS source, r.n AS n_docs, r.sdev AS stddev_chars,
           r.w_fp AS neyman_weight_fp,
           CAST(r.base + CASE WHEN r.rr <= lo.l THEN 1 ELSE 0 END AS BIGINT)
               AS neyman_alloc,
           CAST(r.prop_floor AS BIGINT) AS proportional_floor
    FROM ranked r, leftover lo
    ORDER BY source
    """,
    tags=("curation", "sampling", "stratified", "neyman", "llm-pipeline"),
    checkpointed_substrate=True,
)
def q302_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN (optimal) ALLOCATION for stratified sampling — the
    design-of-experiments step the sampling family lacked: q104 weights
    by divergence, q186 samples by fixed weights, q288 apportions a
    budget proportionally; Neyman allocates n_h ∝ N_h·S_h, putting
    samples where the VARIANCE is (minimum-variance unbiased stratified
    mean for a fixed budget — Neyman 1934). Reported next to the
    proportional floor so the design effect is visible: high-variance
    strata gain, uniform strata shrink.

    Determinism with a square root in play: the stratum variance is
    assembled from EXACT BIGINTs (n·Σx² − (Σx)² over the n_chars
    column), becomes a double via ONE division of exact integers
    (identical IEEE result both engines), and sqrt is an IEEE 754
    CORRECTLY-ROUNDED basic operation (unlike libm log/exp — the q285
    hazard does not apply), so S_h is bit-identical; the weight rounds
    ONCE to 1e-6 fixed point and everything after is the q288 integer
    Hamilton machinery (floor-div quotas, largest-remainder ranks,
    lexicographic ties) — Σ neyman_alloc = budget exactly, every
    engine, every retry. Strata with n < 2 are excluded (no variance);
    the bounded per-source frame keeps every window tiny. One corpus
    scan total."""
    s = (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").cast("long").alias("sx"),
            F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("sx2"),
        )
        .where(F.col("n") >= 2)
        .where(
            exactness_guard(
                (F.col("n") * F.col("n")).cast("double") * F.lit(1.0e8)
                <= F.lit(9.0e18),
                "q302: stratum too large for the exact n*sum(x^2) variance "
                "numerator — pre-aggregate with Welford partials instead",
            )
        )
        .localCheckpoint(eager=True)  # bounded per-source frame; 3 consumers
    )
    sdev = F.sqrt(
        (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).cast("double")
        / (F.col("n") * (F.col("n") - 1)).cast("double")
    )
    w = s.select(
        "source",
        "n",
        sdev.alias("sdev"),
        F.round(F.col("n").cast("double") * sdev * F.lit(1000000.0))
        .cast("long")
        .alias("w_fp"),
    ).localCheckpoint(eager=True)  # totals + quotas share it
    tot = w.agg(F.sum("w_fp").alias("wt"), F.sum("n").alias("nt"))
    quota = (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n",
            "sdev",
            "w_fp",
            F.expr(f"({_NEYMAN_BUDGET}L * w_fp) DIV wt").alias("base"),
            F.expr(f"({_NEYMAN_BUDGET}L * w_fp) % wt").alias("rem"),
            F.expr(f"({_NEYMAN_BUDGET}L * n) DIV nt").alias("prop_floor"),
        )
        .localCheckpoint(eager=True)  # bounded; leftover + rank share it
    )
    from pyspark.sql import Window

    leftover = quota.agg((F.lit(_NEYMAN_BUDGET) - F.sum("base")).alias("l"))
    ranked = quota.withColumn(
        "rr", F.row_number().over(Window.orderBy(F.col("rem").desc(), "source"))
    )
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            F.col("sdev").alias("stddev_chars"),
            F.col("w_fp").alias("neyman_weight_fp"),
            (
                F.col("base") + F.when(F.col("rr") <= F.col("l"), 1).otherwise(0)
            )
            .cast("long")
            .alias("neyman_alloc"),
            F.col("prop_floor").cast("long").alias("proportional_floor"),
        )
        .orderBy("source")
    )
