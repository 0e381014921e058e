"""UDF surface (SURVEY.md §2B E19): scalar Pandas UDF, grouped
applyInPandas, and a Python UDTF — the three escape hatches for logic the
built-ins can't express.

Rules of engagement at 100 TB: Arrow-batched always (row-at-a-time Python
UDFs are 10-100× slower and exist here only as an explicitly-named
anti-pattern for the docs); schemas declared, never inferred; grouped
variants shuffle once on the group key.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import table


@F.pandas_udf(T.StringType())
def reverse_string(s: pd.Series) -> pd.Series:
    """Vectorized string reverse (Arrow batch in/out)."""
    return s.str[::-1]


@query(
    "q42_pandas_udf_reverse",
    oracle="""
    SELECT c_custkey, reverse(c_name) AS rev_name
    FROM customer
    ORDER BY c_custkey
    LIMIT 200
    """,
    tags=("udf", "pandas_udf", "E19"),
)
def q42_pandas_udf_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", reverse_string("c_name").alias("rev_name"))
        .orderBy("c_custkey")
        .limit(200)
    )


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    std = pdf["o_totalprice"].std(ddof=1)  # sample stddev = stddev_samp
    mean = pdf["o_totalprice"].mean()
    z = (pdf["o_totalprice"] - mean) / std if std and std > 0 else pdf["o_totalprice"] * 0.0
    return pd.DataFrame(
        {"o_orderkey": pdf["o_orderkey"], "o_orderstatus": pdf["o_orderstatus"], "z": z}
    )


@query(
    "q43_grouped_normalize",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           (o_totalprice - AVG(o_totalprice) OVER w) / stddev_samp(o_totalprice) OVER w AS z
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus)
    ORDER BY o_orderkey
    """,
    tags=("udf", "applyInPandas", "E19"),
)
def q43_grouped_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score via applyInPandas (one shuffle on the group key;
    each group is one Arrow batch) — hash-matched against the equivalent
    window-function SQL."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .groupBy("o_orderstatus")
        .applyInPandas(_zscore, schema="o_orderkey long, o_orderstatus string, z double")
        .orderBy("o_orderkey")
    )


@query(
    "q44_udtf_tokenize",
    oracle=r"""
    SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                      t -> len(t) > 0)) AS token
    FROM documents
    WHERE doc_id < 20
    ORDER BY doc_id, token
    """,
    tags=("udtf", "E19"),
)
def q44_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+/4.x table function): one input row →
    N token rows. The set-returning escape hatch; the built-in
    explode(split()) twin is what you'd use in production."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="out_doc_id bigint, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):  # noqa: D102
            for tok in (text or "").lower().split():
                if tok:
                    yield doc_id, tok

    import uuid

    # fixed UDTF name (re-registration overwrites — no leak); unique view
    # name for concurrency, dropped once the plan is analyzed
    spark.udtf.register("tokenize_udtf", Tokenize)
    view = f"__udtf_docs_{uuid.uuid4().hex[:8]}"
    table(spark, sf_dir, "documents").createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"""
            SELECT t.out_doc_id AS doc_id, t.token
            FROM {view} d, LATERAL tokenize_udtf(d.doc_id, d.text) t
            WHERE d.doc_id < 20
            ORDER BY doc_id, token
            """
        )
    finally:
        spark.catalog.dropTempView(view)
