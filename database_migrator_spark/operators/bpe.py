"""Byte-pair-encoding tokenizer training on the word histogram — the
canonical "custom operator Spark lacks" of a training-data pipeline
(SURVEY.md §2B extension surface; the reference has no tokenizer either,
this is pipeline-mandated capability).

Spark-first shape: BPE never needs the raw corpus after the first pass —
every real trainer (GPT-2's, SentencePiece) operates on the WORD
HISTOGRAM (distinct word → count), which is vocabulary-sized, not
corpus-sized. So:

1. one corpus pass builds (word, n) — the only 100 TB-scale stage, a
   single explode + groupBy shuffle;
2. each merge round runs entirely on the histogram: adjacent symbol
   pairs explode out weighted by word count, the argmax pair is a
   deterministic (count DESC, pair ASC) top-1, and the merge applies to
   the symbol arrays via an array-accumulator fold (per CLAUDE.md: one
   fold, never N sibling transforms);
3. the histogram localCheckpoints per round — the same
   constant-plan-per-round discipline as connected components.

The per-round driver collect is ONE row (the winning pair) — the same
order of driver traffic as an iterative convergence probe, and how every
distributed BPE implementation sequences merges (the merge choice is a
global argmax, inherently a driver decision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_migrator_spark.operators.dedup import tokens_of
from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import spread_for_cpu, table

# end-of-word sentinel (GPT-2 style "</w>") so merges can span to word
# boundaries and the learned units distinguish "er" mid-word from "er"
# word-finally. Single-codepoint so symbol arrays stay compact; NUL so
# no printable corpus character collides with it — and _initial_symbols
# additionally FILTERS the codepoint out of input words, so by
# construction a symbol containing EOW is always word-final (a corpus
# word that literally contains U+0000 would otherwise conflate with the
# boundary marker; the old U+00B7 sentinel had exactly that hole).
# Query outputs render it as the conventional "</w>" (EOW_DISPLAY) so
# driver-visible tables and SQL oracles stay printable.
EOW = "\u0000"
EOW_DISPLAY = "</w>"


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) counts — the only corpus-scale pass. Spreads narrow
    inputs before the tokenize lambda (single-file tables arrive as one
    partition); no-ops on already-wide 100 TB scans."""
    d = spread_for_cpu(docs)
    return (
        d.select(F.explode(tokens_of(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """Split each word into single-character symbols + the EOW sentinel.
    Input characters equal to the sentinel are dropped (collision guard:
    EOW can then never appear mid-word, whatever the corpus contains)."""
    chars = F.filter(F.split(F.col("word"), ""), lambda c: (c != "") & (c != EOW))
    return words.select(
        "word", "n", F.concat(chars, F.array(F.lit(EOW))).alias("syms")
    )


def _adjacent_pair_counts(syms: DataFrame) -> DataFrame:
    """Corpus-weighted counts of adjacent symbol pairs. zip_with on the
    array and its tail forms pairs positionally — one interpreted lambda
    per row, not one per pair."""
    pairs = F.zip_with(
        F.slice(F.col("syms"), 1, F.size("syms") - 1),
        F.slice(F.col("syms"), 2, F.size("syms") - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        syms.where(F.size("syms") >= 2)
        .select("n", F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("n").alias("cnt"))
    )


def _apply_merge(syms_col, a: str, b: str):
    """Fold the symbol array left-to-right, joining each adjacent (a, b)
    into 'ab'. The accumulator IS the output array — one pass, and a
    just-merged symbol is never half of another merge in the same pass
    (matching the reference BPE semantics of non-overlapping greedy
    left-to-right application)."""
    ab = a + b

    def step(acc, s):
        # try_element_at is NULL-safe on the empty accumulator (ANSI mode
        # would error on element_at(-1)); NULL == a is NULL → falls to
        # append. A just-produced 'ab' can never be mistaken for a
        # trailing 'a' (b is non-empty, so ab != a), so greedy
        # left-to-right non-overlap needs no extra state.
        merged = F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab)))
        return F.when(
            (F.try_element_at(acc, F.lit(-1)) == a) & (s == b), merged
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(syms_col, F.array().cast("array<string>"), step)


def bpe_train(
    docs: DataFrame, n_merges: int = 20, text_col: str = "text"
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(rank, a, b, count), ...]
    in merge order. Deterministic: ties break on (a ASC, b ASC). Stops
    early when no adjacent pair remains (fully merged vocabulary)."""
    words = word_histogram(docs, text_col)
    syms = _initial_symbols(words).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            _adjacent_pair_counts(syms)
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((rank, a, b, cnt))
        syms = syms.select(
            "word", "n", _apply_merge(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=True)
    return merges


# trained merge lists are ingest-time artifacts (like the IVF index) —
# cache per (application, sf_dir, n_merges) so q106/q107 share one
# training run within a session; entries from stopped sessions evict
_MERGES_CACHE: dict[tuple[str, str, int], list[tuple[int, str, str, int]]] = {}


def bpe_train_cached(
    spark: SparkSession, sf_dir: str, n_merges: int
) -> list[tuple[int, str, str, int]]:
    app = spark.sparkContext.applicationId
    for stale in [k for k in _MERGES_CACHE if k[0] != app]:
        del _MERGES_CACHE[stale]
    key = (app, sf_dir, n_merges)
    if key not in _MERGES_CACHE:
        _MERGES_CACHE[key] = bpe_train(table(spark, sf_dir, "documents"), n_merges)
    return _MERGES_CACHE[key]


def bpe_segment(syms_df: DataFrame) -> DataFrame:
    """Token counts of the final segmentation: explode the merged symbol
    arrays weighted by word count."""
    return (
        syms_df.select("n", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("n").alias("cnt"))
    )


# The DuckDB twin of the WHOLE trainer, as one statement: a recursive CTE
# whose working table is the (word, n, symbol-string) histogram, where each
# recursion step (a) re-derives the corpus-weighted adjacent-pair counts by
# GROUP BY over the working table, (b) picks the argmax pair with the same
# (count DESC, a ASC, b ASC) tie-break in RAW symbol space (chr(0) = the
# Spark side's EOW sentinel, binary collation on both engines), and (c)
# applies the merge to every word via two sequential separator-delimited
# string replaces — two passes provably equal the Spark side's greedy
# left-to-right fold (pass 1 merges every other pair of an adjacent run
# because replace() consumes the shared delimiter; no two unmerged pairs
# stay adjacent, so pass 2 catches the rest, and merging can never create
# a NEW (a,b) adjacency since ab==a or ab==b is impossible for non-empty
# symbols). chr(31) is the symbol separator — it cannot appear inside a
# symbol built from whitespace-split word characters unless the corpus
# itself contains chr(31); the testdata is printable ASCII.
_BPE_RECURSIVE_CTE = r"""
WITH RECURSIVE words AS (
    SELECT replace(tok, chr(0), '') AS word, COUNT(*) AS n FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  t -> len(t) > 0)) AS tok
        FROM documents
    ) GROUP BY 1
), init AS (
    SELECT word, n,
           chr(31) || coalesce(list_aggregate(string_split(word, ''),
                                              'string_agg', chr(31)), '')
                   || chr(31) || chr(0) || chr(31) AS s
    FROM words
), bpe AS (
    SELECT word, n, s, 0 AS r,
           CAST(NULL AS VARCHAR) AS ma, CAST(NULL AS VARCHAR) AS mb,
           CAST(NULL AS BIGINT) AS mcnt
    FROM init
    UNION ALL
    SELECT b.word, b.n,
           replace(replace(b.s, m.pat, m.rep), m.pat, m.rep) AS s,
           b.r + 1 AS r, m.a AS ma, m.bb AS mb, m.cnt AS mcnt
    FROM bpe b CROSS JOIN (
        SELECT chr(31) || a || chr(31) || bb || chr(31) AS pat,
               chr(31) || a || bb || chr(31) AS rep, a, bb, cnt
        FROM (
            SELECT p.pair[1] AS a, p.pair[2] AS bb,
                   CAST(SUM(p.n) AS BIGINT) AS cnt
            FROM (
                SELECT n,
                       unnest(list_transform(range(1, len(syms)),
                                             i -> [syms[i], syms[i+1]])) AS pair
                FROM (SELECT n, list_filter(string_split(s, chr(31)),
                                            x -> len(x) > 0) AS syms
                      FROM bpe)
            ) p
            GROUP BY 1, 2
            ORDER BY cnt DESC, a, bb
            LIMIT 1
        )
    ) m
    WHERE b.r < 10
)
"""

_Q106_ORACLE = _BPE_RECURSIVE_CTE + r"""
SELECT CAST(r - 1 AS BIGINT) AS rank,
       replace(ma, chr(0), '</w>') AS sym_a,
       replace(mb, chr(0), '</w>') AS sym_b,
       mcnt AS pair_count
FROM (SELECT DISTINCT r, ma, mb, mcnt FROM bpe WHERE r >= 1)
ORDER BY rank
"""

_Q107_ORACLE = _BPE_RECURSIVE_CTE + r"""
SELECT replace(token, chr(0), '</w>') AS token, CAST(SUM(n) AS BIGINT) AS cnt
FROM (
    SELECT n, unnest(list_filter(string_split(s, chr(31)),
                                 x -> len(x) > 0)) AS token
    FROM bpe WHERE r = (SELECT MAX(r) FROM bpe)
)
GROUP BY 1
ORDER BY cnt DESC, token
LIMIT 20
"""


@query(
    "q106_bpe_merges",
    oracle=_Q106_ORACLE,  # the full iterative trainer as one recursive-CTE
    # statement (see _BPE_RECURSIVE_CTE); ALSO exact-matched against a
    # pure-Python reference BPE trainer in tests/test_bpe.py
    tags=("text", "bpe", "tokenizer", "iterative", "llm-pipeline"),
    checkpointed_substrate=True,
)
def q106_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 10 BPE merges learned from the documents corpus — tokenizer
    training as a declared operator. The corpus is touched once (word
    histogram); every merge round runs on the vocabulary-sized histogram
    with a one-row driver argmax, exactly how production BPE trainers
    scale (wall-clock per round is Spark job fixed overhead, not data —
    tokenizer training is ingest-time work like ivf_fit). Deterministic
    by (count DESC, pair ASC) tie-break, so the driver's rows-only gate
    sees a stable table. Symbols render the NUL sentinel as '</w>'."""
    merges = bpe_train_cached(spark, sf_dir, n_merges=10)
    return spark.createDataFrame(
        [
            (int(r), a.replace(EOW, EOW_DISPLAY), b.replace(EOW, EOW_DISPLAY), int(c))
            for r, a, b, c in merges
        ],
        "rank bigint, sym_a string, sym_b string, pair_count bigint",
    ).orderBy("rank")


@query(
    "q107_bpe_vocabulary",
    oracle=_Q107_ORACLE,  # same recursive-CTE trainer, final-round
    # segmentation exploded to the top-20 vocabulary
    tags=("text", "bpe", "tokenizer", "llm-pipeline"),
    checkpointed_substrate=True,
)
def q107_bpe_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE side of the tokenizer: apply the 10 learned merges to the
    word histogram and report the top-20 resulting subword tokens by
    corpus frequency — the vocabulary a trained BPE would ship. The
    merge list is learned once (q106's loop); application is 10 chained
    folds over the vocabulary-sized histogram, then one weighted explode
    + aggregate. Deterministic (count DESC, token ASC)."""
    d = table(spark, sf_dir, "documents")
    words = word_histogram(d)
    syms = _initial_symbols(words).localCheckpoint(eager=True)
    for _, a, b, _cnt in bpe_train_cached(spark, sf_dir, n_merges=10):
        syms = syms.select(
            "word", "n", _apply_merge(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=True)
    return (
        bpe_segment(syms)
        .select(
            F.replace(F.col("token"), F.lit(EOW), F.lit(EOW_DISPLAY)).alias("token"),
            F.col("cnt").cast("long").alias("cnt"),
        )
        .orderBy(F.col("cnt").desc(), "token")
        .limit(20)
    )


_Q116_ORACLE = _BPE_RECURSIVE_CTE + r"""
, pieces AS (
    SELECT word,
           CAST(len(list_filter(string_split(s, chr(31)),
                                x -> len(x) > 0)) AS BIGINT) AS np
    FROM bpe WHERE r = (SELECT MAX(r) FROM bpe)
), src AS (
    SELECT source, replace(tok, chr(0), '') AS word, COUNT(*) AS n FROM (
        SELECT source,
               unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  t -> len(t) > 0)) AS tok
        FROM documents
    ) GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_words,
       CAST(CAST(SUM(n * np) AS BIGINT) AS DOUBLE)
         / CAST(CAST(SUM(n) AS BIGINT) AS DOUBLE) AS fertility
FROM src JOIN pieces USING (word)
GROUP BY source
ORDER BY source
"""


@query(
    "q116_tokenizer_fertility",
    oracle=_Q116_ORACLE,
    tags=("text", "bpe", "tokenizer", "diagnostics", "llm-pipeline"),
    checkpointed_substrate=True,
)
def q116_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per source — corpus-weighted subword pieces
    per word under the q106-learned merges. THE acceptance metric for a
    trained tokenizer on a corpus mix (a source whose fertility is far
    above the rest is being shredded into characters, inflating its
    effective token cost and skewing the q104 sampling weights).

    Shape at scale: merges apply to the DISTINCT-word table (vocabulary-
    sized folds, the q107 path), which then joins the per-(source, word)
    counts on word — a vocabulary-keyed shuffle join (never broadcast:
    web-scale vocabularies are the q103 lesson). Fertility divides two
    exact BIGINTs, so it hashes bit-identically; the oracle re-learns
    the merges inside the same recursive CTE as q106/q107."""
    d = table(spark, sf_dir, "documents")
    words = word_histogram(d)
    syms = _initial_symbols(words).localCheckpoint(eager=True)
    for _, a, b, _cnt in bpe_train_cached(spark, sf_dir, n_merges=10):
        syms = syms.select(
            "word", "n", _apply_merge(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=True)
    pieces = syms.select("word", F.size("syms").cast("long").alias("np"))
    src = (
        spread_for_cpu(d)
        .select("source", F.explode(tokens_of("text")).alias("tok"))
        .select(
            "source", F.replace(F.col("tok"), F.lit(EOW), F.lit("")).alias("word")
        )
        .groupBy("source", "word")
        .agg(F.count("*").alias("n"))
    )
    return (
        src.join(pieces.hint("shuffle_merge"), "word")
        .groupBy("source")
        .agg(
            F.sum("n").alias("n_words"),
            (
                F.sum(F.col("n") * F.col("np")).cast("double")
                / F.sum("n").cast("double")
            ).alias("fertility"),
        )
        .orderBy("source")
    )
