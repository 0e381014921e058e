"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full declared-query registry
from ``database_migrator_spark.plans`` (one entry per implemented operator
from SURVEY.md §2; queries without an ``oracle_sql`` entry are
approximate/plumbing operators checked rows-only by design).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from database_migrator_spark.plans.registry import all_queries  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()["q02_pricing_summary"].build(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: dq.build for name, dq in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-matchable query."""
    return {name: dq.oracle for name, dq in all_queries().items() if dq.oracle is not None}
