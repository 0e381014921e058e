"""q139's quarantine accounting: every deliberately-truncated line must
land in _corrupt_record with its raw payload preserved (dead-letter
contract), and the good/bad partition must be exact."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from database_migrator_spark.plans.registry import all_queries
from database_migrator_spark.sources import table

from .conftest import SF_SMOKE


def test_corrupt_rows_are_quarantined_not_dropped(spark):
    # build the same dataset the query writes, then inspect the raw read
    all_queries()["q139_corrupt_tolerant_ingest"].build(spark, SF_SMOKE).count()
    path = os.path.join(
        tempfile.gettempdir(), "spark_graft_formats",
        f"{os.path.basename(os.path.normpath(SF_SMOKE))}-corrupt",
    )
    back = (
        spark.read.schema("doc_id long, n_chars long, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # Collect once (500 rows at smoke scale) and assert in Python —
    # corrupt-column-only scans are illegal under column pruning
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and a
    # driver-side assertion set is clearer than filter gymnastics.
    rows = back.collect()
    n_docs = table(spark, SF_SMOKE, "documents").count()
    n_bad_expected = (
        table(spark, SF_SMOKE, "documents").where(F.col("doc_id") % 37 == 0).count()
    )
    assert len(rows) == n_docs  # nothing silently dropped
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(bad) == n_bad_expected
    # dead-letter payload: the raw truncated line is preserved verbatim
    for r in bad:
        assert r._corrupt_record.startswith('{"doc_id": ')
        assert r._corrupt_record.endswith('"n_chars": ')
