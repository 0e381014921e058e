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


def test_scd2_closed_history_untouched(spark):
    """A dim WITH history: closed rows whose attrs differ from the update
    must pass through untouched — only the open row is closed/replaced."""
    dim = spark.createDataFrame(
        [
            (1, "alice", 10.0, "2020-01-01", "2022-01-01"),  # closed history
            (1, "alice", 12.0, "2022-01-01", None),          # current open
        ],
        "id long, name string, bal double, valid_from string, valid_to string",
    )
    updates = spark.createDataFrame([(1, 15.0)], "id long, bal double")
    out = scd2_apply(dim, updates, "id", ["bal"], "2024-06-01")
    rows = {(r.id, r.bal, r.valid_from, r.valid_to) for r in out.collect()}
    assert rows == {
        (1, 10.0, "2020-01-01", "2022-01-01"),  # history preserved verbatim
        (1, 12.0, "2022-01-01", "2024-06-01"),  # open row closed
        (1, 15.0, "2024-06-01", None),          # new open version
    }


def test_scd2_idempotent_on_own_output(spark):
    """Applying the same updates to the output of a previous apply must be
    a no-op: the new open versions already match, and closed history must
    not be re-closed or duplicated."""
    dim = spark.createDataFrame(
        [
            (1, "alice", 10.0, "2020-01-01", None),
            (2, "bob", 20.0, "2020-01-01", None),
        ],
        "id long, name string, bal double, valid_from string, valid_to string",
    )
    updates = spark.createDataFrame([(1, 15.0)], "id long, bal double")
    once = scd2_apply(dim, updates, "id", ["bal"], "2024-06-01")
    twice = scd2_apply(once, updates, "id", ["bal"], "2024-07-01")
    rows = {(r.id, r.bal, r.valid_from, r.valid_to) for r in twice.collect()}
    assert rows == {
        (1, 10.0, "2020-01-01", "2024-06-01"),
        (1, 15.0, "2024-06-01", None),
        (2, 20.0, "2020-01-01", None),
    }


def test_scd2_null_safe_change_detection(spark):
    """NULL→value and value→NULL attribute transitions are changes, not
    silently-dropped 'unchanged' rows."""
    dim = spark.createDataFrame(
        [
            (1, "alice", None, "2020-01-01", None),
            (2, "bob", 20.0, "2020-01-01", None),
        ],
        "id long, name string, bal double, valid_from string, valid_to string",
    )
    updates = spark.createDataFrame(
        [(1, 11.0), (2, None)], "id long, bal double"
    )
    out = scd2_apply(dim, updates, "id", ["bal"], "2024-06-01")
    rows = {(r.id, r.bal, r.valid_from, r.valid_to) for r in out.collect()}
    assert rows == {
        (1, None, "2020-01-01", "2024-06-01"),
        (1, 11.0, "2024-06-01", None),
        (2, 20.0, "2020-01-01", "2024-06-01"),
        (2, None, "2024-06-01", None),
    }
