from __future__ import annotations

import math
import os
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from database_migrator_spark.session import get_session  # noqa: E402
from database_migrator_spark.sources import TABLES  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session("database_migrator_spark-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def register_duck_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def _normalize(df: pd.DataFrame) -> list[tuple]:
    """Mimic the driver's compare: sort columns by name, round floats to 6
    decimals, stringify, and sort rows (order-insensitive)."""
    df = df[sorted(df.columns)]

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if pd.isna(v):
            return "<null>"
        if isinstance(v, float):
            return f"{round(v, 6):.6f}"
        return str(v)

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def assert_matches_oracle(spark, duck, dq, sf_dir: str) -> None:
    """Run the Spark query and the DuckDB oracle; assert schema-width,
    row-count and normalized-value equality."""
    register_duck_views(duck, sf_dir)
    got = dq.build(spark, sf_dir).toPandas()
    want = duck.execute(dq.oracle).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{dq.name}: column names differ: {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{dq.name}: row count {len(got)} != {len(want)}"
    g, w = _normalize(got), _normalize(want)
    if g != w:
        diff = [(a, b) for a, b in zip(g, w) if a != b][:5]
        raise AssertionError(f"{dq.name}: value mismatch; first diffs: {diff}")
