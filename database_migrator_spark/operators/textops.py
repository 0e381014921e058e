"""Text-analysis operators for LLM training-data pipelines: token stats,
quality scoring, language-ID heuristic, document fingerprinting.

All pure column expressions (split / filter / aggregate / regexp) — the
whole stage is codegen'd, no Python, so it streams at parquet-scan speed
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from database_migrator_spark.operators.dedup import tokens_of
from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import table

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# tiny per-language lexicons for the n-gram/stopword language-ID heuristic
_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "und", "die", "das", "ist"),
    "fr": ("le", "et", "les", "des", "une"),
}

_FP_MOD = 1_000_000_007
_FP_BASE = 31


def token_count(text: Column | str) -> Column:
    return F.size(tokens_of(text)).cast("long")


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = _STOPWORDS) -> Column:
    toks = tokens_of(text)
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def lexicon_hits(text: Column | str, lexicon: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens_of(text), lambda t: t.isin(*lexicon))).cast("long")


def rolling_fingerprint(text: Column | str, prefix_len: int = 200) -> Column:
    """Deterministic polynomial rolling hash over the first ``prefix_len``
    characters: acc = (acc*31 + codepoint) mod 1e9+7. Engine-portable
    (mirrors ascii()/list_reduce in DuckDB) and stays within int64."""
    c = F.col(text) if isinstance(text, str) else text
    chars = F.filter(F.split(F.substring(c, 1, prefix_len), ""), lambda ch: ch != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * _FP_BASE + F.ascii(ch), F.lit(_FP_MOD)),
    )


@query(
    "q30_token_stats",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, n_chars,
               list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT)                AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens,
           CASE WHEN len(toks) > 0
                THEN CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
                ELSE 0.0 END                        AS type_token_ratio,
           n_chars                                  AS n_chars
    FROM toks
    ORDER BY doc_id
    """,
    tags=("text", "tokens"),
)
def q30_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + type/token ratio — the base signal of
    every quality filter."""
    d = table(spark, sf_dir, "documents")
    toks = tokens_of("text")
    n = F.size(toks)
    nu = F.size(F.array_distinct(toks))
    return (
        d.select(
            "doc_id",
            n.cast("long").alias("n_tokens"),
            nu.cast("long").alias("n_unique_tokens"),
            F.when(n > 0, nu.cast("double") / n.cast("double"))
            .otherwise(F.lit(0.0))
            .alias("type_token_ratio"),
            F.col("n_chars").alias("n_chars"),
        )
        .orderBy("doc_id")
    )


@query(
    "q31_quality_score",
    oracle=rf"""
    WITH base AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS toks,
               CAST(length(text) AS BIGINT) AS len_text,
               CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_punct
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(toks) > 0
                THEN CAST(len(list_filter(toks, t -> list_contains({list(_STOPWORDS)!r}, t))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS stopword_ratio,
           CASE WHEN len_text > 0
                THEN CAST(n_punct AS DOUBLE) / CAST(len_text AS DOUBLE) ELSE 0.0 END AS punct_ratio,
           CASE WHEN len(toks) > 0
                THEN CAST(len_text AS DOUBLE) / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS chars_per_token
    FROM base
    ORDER BY doc_id
    """,
    tags=("text", "quality"),
)
def q31_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals: stopword ratio, punctuation ratio,
    chars-per-token — the CCNet/Gopher-style cheap filters."""
    d = table(spark, sf_dir, "documents")
    toks = tokens_of("text")
    n = F.size(toks)
    len_text = F.length("text").cast("long")
    n_punct = F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")).cast("long")
    return (
        d.select(
            "doc_id",
            F.when(
                n > 0,
                F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS))).cast("double")
                / n.cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("stopword_ratio"),
            F.when(len_text > 0, n_punct.cast("double") / len_text.cast("double"))
            .otherwise(F.lit(0.0))
            .alias("punct_ratio"),
            F.when(n > 0, len_text.cast("double") / n.cast("double"))
            .otherwise(F.lit(0.0))
            .alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )


@query(
    "q32_language_id",
    oracle=rf"""
    WITH scores AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                    t -> list_contains({list(_LEXICONS['en'])!r}, t))) AS BIGINT) AS s_en,
               CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                    t -> list_contains({list(_LEXICONS['es'])!r}, t))) AS BIGINT) AS s_es,
               CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                    t -> list_contains({list(_LEXICONS['de'])!r}, t))) AS BIGINT) AS s_de,
               CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                    t -> list_contains({list(_LEXICONS['fr'])!r}, t))) AS BIGINT) AS s_fr
        FROM documents
    ), pred AS (
        SELECT doc_id, lang,
               CASE
                 WHEN s_en = 0 AND s_es = 0 AND s_de = 0 AND s_fr = 0 THEN 'unknown'
                 WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                 WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                 WHEN s_de >= s_fr THEN 'de'
                 ELSE 'fr'
               END AS predicted_lang
        FROM scores
    )
    SELECT lang, predicted_lang, COUNT(*) AS n
    FROM pred
    GROUP BY lang, predicted_lang
    ORDER BY lang, predicted_lang
    """,
    tags=("text", "langid"),
)
def q32_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-lexicon language-ID heuristic with a deterministic argmax
    tie-break order (en > es > de > fr), summarized as a confusion table."""
    d = table(spark, sf_dir, "documents")
    s = {k: lexicon_hits("text", v) for k, v in _LEXICONS.items()}
    pred = (
        F.when(
            (s["en"] == 0) & (s["es"] == 0) & (s["de"] == 0) & (s["fr"] == 0), F.lit("unknown")
        )
        .when((s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]), F.lit("en"))
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]), F.lit("es"))
        .when(s["de"] >= s["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return (
        d.select("lang", pred.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted_lang")
    )


def char_ngrams(text: Column | str, n: int = 5) -> Column:
    """Character n-gram set (distinct) of the lowercased text — the
    fuzzy-dedup unit used by the classic web-dedup pipelines."""
    c = F.lower(F.col(text) if isinstance(text, str) else text)
    length = F.length(c)
    return F.array_distinct(
        F.when(
            length >= n,
            F.transform(F.sequence(F.lit(1), length - n + 1), lambda i: F.substring(c, i, n)),
        ).otherwise(F.array(c))
    )


@query(
    "q54_char_ngram_jaccard",
    oracle="""
    WITH grams AS (
        SELECT doc_id,
               list_distinct(
                 CASE WHEN length(text) >= 5
                      THEN list_transform(range(1, length(text) - 5 + 2),
                                          i -> lower(text[i:i+4]))
                      ELSE [lower(text)] END
               ) AS g
        FROM documents
        WHERE doc_id < 50
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE) AS jaccard
    FROM grams a JOIN grams b ON a.doc_id < b.doc_id
    ORDER BY a_id, b_id
    """,
    tags=("text", "ngram", "jaccard", "E15"),
)
def q54_char_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-5-gram Jaccard on a keyed subset. NB: DuckDB's
    ``text[i:i+4]`` slice is inclusive (5 chars) — mirrored by
    substring(c, i, 5) on the Spark side."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    g = d.select("doc_id", char_ngrams("text", 5).alias("g"))
    a = g.select(F.col("doc_id").alias("a_id"), F.col("g").alias("a_g"))
    b = g.select(F.col("doc_id").alias("b_id"), F.col("g").alias("b_g"))
    inter = F.size(F.array_intersect("a_g", "b_g")).cast("double")
    union = F.size(F.array_union("a_g", "b_g")).cast("double")
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", (inter / union).alias("jaccard"))
        .orderBy("a_id", "b_id")
    )


@query(
    "q55_regex_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)   AS n_word_tokens,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS n_punct_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
                                                                           AS n_bpe_ish_tokens
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "tokens", "regex"),
)
def q55_regex_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: alphanumeric runs + isolated punctuation
    (the standard pre-tokenizer shape), counted with regexp_extract_all —
    ASCII classes only so Java and RE2-style engines agree."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z0-9]+"), 0))
            .cast("long")
            .alias("n_word_tokens"),
            F.size(F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9\s]"), 0))
            .cast("long")
            .alias("n_punct_tokens"),
            F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0))
            .cast("long")
            .alias("n_bpe_ish_tokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "q33_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(list_filter(string_split_regex(substr(text, 1, 200), ''),
                                          c -> c != ''),
                              c -> CAST(ascii(c) AS BIGINT))),
             (acc, ch) -> (acc * {_FP_BASE} + ch) % {_FP_MOD}
           ) AS fingerprint
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "fingerprint"),
)
def q33_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint of the document prefix —
    engine-portable exact int64 arithmetic (same fold in DuckDB)."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", rolling_fingerprint("text").alias("fingerprint")).orderBy(
        "doc_id"
    )


@query(
    "q75_tfidf_top_terms",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  t -> len(t) > 0)) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), n AS (
        SELECT COUNT(*) AS n_docs FROM documents
    )
    SELECT doc_id, term, tf, tfidf FROM (
        SELECT t.doc_id, t.term, t.tf,
               t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df) AS tfidf
        FROM tf t JOIN df d USING (term), n
    )
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) <= 3
    ORDER BY doc_id, tfidf DESC, term
    """,
    tags=("text", "tfidf", "ranking"),
)
def q75_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms — the scoring step of keyword
    extraction / quality filtering. Shape at scale: one shuffle for the
    (doc, term) term frequencies; the document-frequency table and the
    single-row corpus count are derived aggregates joined back by
    BROADCAST (term vocabulary ≪ corpus), so the big side never shuffles
    again; top-3 is a bounded row_number window per doc. tf/df/N are
    exact ints in both engines, making tf·ln(N/df) hash-stable."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_of("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 3)
        .select("doc_id", "term", "tf", "tfidf")
        .orderBy("doc_id", F.col("tfidf").desc(), "term")
    )
