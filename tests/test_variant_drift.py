"""q141's drift-tolerance claim, exercised on props shapes the fixed
from_json schema (q21) cannot absorb: nested objects, missing paths,
wrong-typed values, arrays. try_variant_get must return NULL for
missing/mistyped paths and extract typed values from nested ones —
never fail the scan."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_variant_extraction_survives_schema_drift(spark):
    rows = [
        (1, '{"k": 7}'),                      # the original shape
        (2, '{"k": "oops"}'),                 # wrong type -> NULL (try_)
        (3, '{"other": 1}'),                  # missing path -> NULL
        (4, '{"k": {"nested": 42}}'),         # drifted to nested object
        (5, '{"k": [1, 2, 3]}'),              # drifted to array
        (6, '{"k": 9, "extra": {"deep": "x"}}'),  # additive drift
    ]
    df = spark.createDataFrame(rows, "id long, props string")
    v = df.select("id", F.parse_json("props").alias("v"))
    out = v.select(
        "id",
        F.try_variant_get("v", "$.k", "long").alias("k"),
        F.try_variant_get("v", "$.k.nested", "long").alias("k_nested"),
        F.try_variant_get("v", "$.k[1]", "long").alias("k_arr1"),
        F.try_variant_get("v", "$.extra.deep", "string").alias("deep"),
    ).orderBy("id")
    got = {r.id: (r.k, r.k_nested, r.k_arr1, r.deep) for r in out.collect()}
    assert got[1] == (7, None, None, None)
    assert got[2] == (None, None, None, None)   # "oops" is not a long
    assert got[3] == (None, None, None, None)
    assert got[4] == (None, 42, None, None)
    assert got[5] == (None, None, 2, None)
    assert got[6] == (9, None, None, "x")
