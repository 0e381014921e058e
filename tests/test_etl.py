"""scd2_apply unit semantics: update, insert, unchanged, carry-forward."""

from __future__ import annotations

from database_migrator_spark.operators.etl import scd2_apply


def test_scd2_update_insert_unchanged(spark):
    dim = spark.createDataFrame(
        [
            (1, "alice", 10.0, "2020-01-01", None),
            (2, "bob", 20.0, "2020-01-01", None),
            (3, "carol", 30.0, "2020-01-01", None),
        ],
        "id long, name string, bal double, valid_from string, valid_to string",
    )
    updates = spark.createDataFrame(
        [
            (1, 15.0),   # changed → close + new version (name carried)
            (2, 20.0),   # unchanged
            (9, 99.0),   # brand-new key → insert
        ],
        "id long, bal double",
    )
    out = scd2_apply(dim, updates, "id", ["bal"], "2024-06-01")
    rows = {(r.id, r.bal, r.valid_from, r.valid_to, r.name) for r in out.collect()}
    assert rows == {
        (1, 10.0, "2020-01-01", "2024-06-01", "alice"),  # closed
        (1, 15.0, "2024-06-01", None, "alice"),          # new version, name carried
        (2, 20.0, "2020-01-01", None, "bob"),            # unchanged
        (3, 30.0, "2020-01-01", None, "carol"),          # untouched
        (9, 99.0, "2024-06-01", None, None),             # insert, name unknown
    }
