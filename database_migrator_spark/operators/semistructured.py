"""Semi-structured operators: JSON props and array (embedding) columns
(SURVEY.md §2B rows E12–E13).

JSON stays JVM-side via get_json_object/from_json; arrays use higher-order
functions (transform/aggregate/filter) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import table


# ---------------------------------------------------------------------------
# E12 — JSON extraction + typed parse
# ---------------------------------------------------------------------------
@query(
    "q20_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    ORDER BY event_id
    LIMIT 500
    """,
    tags=("json", "E12"),
)
def q20_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        )
        .orderBy("event_id")
        .limit(500)
    )


@query(
    "q21_json_agg_by_type",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("json", "aggregate", "E12"),
)
def q21_json_agg_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parse (from_json with an explicit schema — schema-on-read,
    no inference pass) feeding an exact integer aggregate."""
    e = table(spark, sf_dir, "events")
    parsed = e.select(
        "event_type", F.from_json("props", "k BIGINT").getField("k").alias("k")
    )
    return (
        parsed.groupBy("event_type")
        .agg(F.sum("k").cast("long").alias("sum_k"), F.count("*").alias("n"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E13 — array functions over embeddings
# ---------------------------------------------------------------------------
@query(
    "q22_array_functions",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE)   AS first_component,
           list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                       (a, b) -> a + b)   AS component_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
    FROM embeddings
    ORDER BY vec_id
    """,
    tags=("array", "E13"),
)
def q22_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (size / element_at / aggregate / filter).
    Both engines fold left-to-right in double, so component_sum is
    bit-identical (see functions/vector.py)."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select(
            "vec_id",
            F.size("embedding").cast("long").alias("dim"),
            F.element_at("embedding", 1).cast("double").alias("first_component"),
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ).alias("component_sum"),
            F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
        )
        .orderBy("vec_id")
    )


@query(
    "q141_variant_shredding",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
                                                            AS sum_k,
           CAST(COUNT(*) AS BIGINT)                         AS n,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT)      AS n_missing
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("json", "variant", "semistructured", "E12"),
)
def q141_variant_shredding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through Spark 4's VARIANT type: props
    parses ONCE into the binary variant encoding (``parse_json``), and
    typed fields come out with ``variant_get`` — no per-path string
    re-parse (q20's get_json_object re-tokenizes the JSON text for every
    path) and no pinned struct schema (q21's from_json breaks the moment
    a feed adds heterogeneous/nested keys; variant defers the schema to
    extraction time, per path, which is the right posture for a 100 TB
    event firehose whose props drift weekly). n_missing counts events
    whose props lack the path — the drift signal a pipeline monitors.
    The DuckDB oracle mirrors with its JSON extraction, so the whole
    variant encode→extract chain is under the hash."""
    e = table(spark, sf_dir, "events")
    v = e.select("event_type", F.parse_json("props").alias("v"))
    k = v.select(
        "event_type", F.try_variant_get("v", "$.k", "long").alias("k")
    )
    return (
        k.groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("*").alias("n"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).cast("long").alias("n_missing"),
        )
        .orderBy("event_type")
    )


@query(
    "q176_variant_qualify_topk",
    oracle="""
    WITH per_user AS (
        SELECT event_type, user_id,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY 1, 2
    )
    SELECT event_type, user_id, sum_k, n_events,
           CAST(rank() OVER (PARTITION BY event_type
                             ORDER BY sum_k DESC, user_id) AS BIGINT) AS rnk
    FROM per_user
    QUALIFY rnk <= 3
    ORDER BY event_type, rnk, user_id
    """,
    tags=("json", "variant", "qualify", "window", "topk", "E12"),
)
def q176_variant_qualify_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT analytics + QUALIFY — the semi-structured metadata shape
    LLM-pipeline tables actually hit: props parses ONCE into the binary
    variant encoding (q141's posture — no per-path string re-parse, no
    pinned struct schema), the shredded ``k`` feeds an exact per-
    (event_type, user) BIGINT rollup, and a windowed QUALIFY keeps each
    type's top-3 users by sum_k (total order: user_id tiebreak).

    The grouped top-k is the TWO-LEVEL form, not one window: a window
    partitioned by event_type alone has ~5 partitions — at 100 TB each
    would sort billions of per-user rows on one task (the q94/q125
    single-partition-window hazard, merely sharded by 5). Level 1 ranks
    inside (event_type, user-hash bucket) — bounded per task — and keeps
    3; level 2 ranks the <= 3x64 survivors per type, a bounded derived
    table, where rank() is provably identical to the oracle's global
    QUALIFY rank because the global top-3 survive level 1 by
    construction and the order is total. One corpus scan feeds it all."""
    e = table(spark, sf_dir, "events")
    from pyspark.sql import Window

    v = e.select("event_type", "user_id", F.parse_json("props").alias("v"))
    per_user = (
        v.select(
            "event_type",
            "user_id",
            F.try_variant_get("v", "$.k", "long").alias("k"),
        )
        .groupBy("event_type", "user_id")
        .agg(F.sum("k").cast("long").alias("sum_k"), F.count("*").alias("n_events"))
    )
    buckets = 64
    lvl1 = Window.partitionBy(
        "event_type", F.pmod(F.col("user_id"), F.lit(buckets))
    ).orderBy(F.col("sum_k").desc(), "user_id")
    cand = (
        per_user.withColumn("__r1", F.row_number().over(lvl1))
        .where(F.col("__r1") <= 3)
        .drop("__r1")
    )
    lvl2 = Window.partitionBy("event_type").orderBy(F.col("sum_k").desc(), "user_id")
    return (
        cand.withColumn("rnk", F.rank().over(lvl2).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("event_type", "user_id", "sum_k", "n_events", "rnk")
        .orderBy("event_type", "rnk", "user_id")
    )
