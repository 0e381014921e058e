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


def test_q89_short_identifier_clamps_match_duckdb(spark, tmp_path):
    """The greatest() clamps must be mirrored in BOTH engines: for
    identifiers of length <= 4, an unclamped oracle substr(c_name,
    length-3, 4) gets a negative start that DuckDB treats as
    suffix-anchored while Spark returns the whole name — a silent
    divergence the TPC-H fixed-width names never exercise.  Lock the
    agreement on 1..6-char synthetic names."""
    import duckdb
    import pandas as pd

    from database_migrator_spark.plans.registry import all_queries

    names = ["a", "ab", "ab1", "a1b2", "a1b2c", "a1b2c3", "12345678"]
    pdf = pd.DataFrame(
        {"c_custkey": range(1, len(names) + 1), "c_name": names}
    )
    pdf.to_parquet(tmp_path / "customer.parquet")
    dq = all_queries()["q89_pii_redaction"]
    got = [tuple(r) for r in dq.build(spark, str(tmp_path)).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{tmp_path}/customer.parquet')"
    )
    want = [tuple(r) for r in con.execute(dq.oracle).fetchall()]
    assert got == want
    # length<=4 names pass through unmasked with zero redactions
    by_key = {r[0]: r for r in got}
    for k, nm in zip(range(1, len(names) + 1), names):
        if len(nm) <= 4:
            assert by_key[k][1] == nm and by_key[k][2] == 0


def test_functional_dependencies_known_truths(spark):
    """q224: key-implied FDs must HOLD with zero repair cost; failing
    candidates must carry a g3 that matches an independent pandas
    recomputation; g3_error is always in [0, 1)."""
    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    rows = {
        r.fd: r
        for r in all_queries()["q224_functional_dependencies"].build(spark, SF_SMOKE).collect()
    }
    assert len(rows) == 6
    pk = rows["orders: o_orderkey -> o_custkey"]
    assert pk.holds == 1 and pk.g3_rows_to_remove == 0 and pk.n_violating_lhs == 0
    for r in rows.values():
        assert 0 <= r.g3_error < 1
        assert (r.holds == 1) == (r.g3_rows_to_remove == 0)
        assert r.n_lhs <= r.n_rows
    # independent recomputation of one failing candidate
    pdf = table(spark, SF_SMOKE, "orders").select("o_custkey", "o_orderstatus").toPandas()
    g = pdf.groupby(["o_custkey", "o_orderstatus"]).size().reset_index(name="c")
    keep = g.groupby("o_custkey")["c"].max().sum()
    want_g3 = len(pdf) - keep
    got = rows["orders: o_custkey -> o_orderstatus"]
    assert got.g3_rows_to_remove == want_g3


def test_delete_propagation_audit_consistency(spark):
    """q228's invariants: invalidated <= total per artifact, the
    documents fraction matches the %37 delete rule exactly, and the
    keeper-reelection count matches an independent pandas
    recomputation over the content-hash groups."""
    import hashlib

    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    rows = {
        r.artifact: r
        for r in all_queries()["q228_delete_propagation_audit"].build(spark, SF_SMOKE).collect()
    }
    assert set(rows) == {
        "documents", "token_volume", "tf_rows", "shingle_rows",
        "dedup_keeper_reelections",
    }
    for r in rows.values():
        assert 0 <= r.n_invalidated <= r.n_total
        assert abs(r.pct - r.n_invalidated / r.n_total) < 1e-15
    pdf = table(spark, SF_SMOKE, "documents").select("doc_id", "text").toPandas()
    assert rows["documents"].n_invalidated == int((pdf.doc_id % 37 == 0).sum())
    groups = {}
    for _, row in pdf.iterrows():
        groups.setdefault(hashlib.md5(row.text.encode()).hexdigest(), []).append(
            int(row.doc_id)
        )
    want = sum(
        1
        for ids in groups.values()
        if min(ids) % 37 == 0 and any(i % 37 != 0 for i in ids)
    )
    assert rows["dedup_keeper_reelections"].n_invalidated == want


def test_k_anonymity_bands_match_pandas_replay(spark):
    """q257: a pandas replay of the QI equivalence classes (size k,
    status diversity l), the release bands and the ALL row must match
    exactly; bands tile the released rows and min-l is the true global
    minimum."""
    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    o = table(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_orderdate", "o_orderpriority", "o_orderstatus"
    ).toPandas()
    c = table(spark, SF_SMOKE, "customer").select("c_custkey", "c_nationkey").toPandas()
    rel = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    rel["ym"] = rel["o_orderdate"].astype(str).str[:7]
    g = rel.groupby(["c_nationkey", "ym", "o_orderpriority"]).agg(
        k=("o_orderstatus", "size"), l=("o_orderstatus", "nunique")
    )

    def band(k):
        return "1:unique" if k == 1 else "2:2-4" if k < 5 else "3:5-9" if k < 10 else "4:10+"

    g["band"] = g["k"].map(band)
    b = g.groupby("band").agg(
        n_classes=("k", "size"), n_rows=("k", "sum"), min_l=("l", "min")
    )
    t = int(b["n_rows"].sum())
    expect = sorted(
        (bd, int(r.n_classes), int(r.n_rows), (int(r.n_rows) * 10**12) // t / 1e12, int(r.min_l))
        for bd, r in b.iterrows()
    ) + [("ALL", int(b["n_classes"].sum()), t, 1.0, int(b["min_l"].min()))]
    got = [
        (r.band, r.n_classes, r.n_rows, r.row_share, r.min_l_diversity)
        for r in all_queries()["q257_k_anonymity_audit"].build(spark, SF_SMOKE).collect()
    ]
    assert got == sorted(expect)
    assert sum(n for bd, _, n, _, _ in got if bd != "ALL") == t == len(rel)


def test_waiting_suppliers_hand_corpus(spark, tmp_path):
    """q259 semantics on a planted corpus: (A) two suppliers, only s1
    late -> s1 blamed; (B) two suppliers BOTH late -> nobody blamed
    (NOT EXISTS another late supplier fails); (C) single-supplier late
    order -> nobody (EXISTS another supplier fails); (D) open-status
    order -> excluded entirely."""
    import datetime as dt
    import os

    from database_migrator_spark.plans.registry import all_queries

    d0 = dt.date(2024, 1, 1)
    late, ontime = dt.date(2024, 3, 15), dt.date(2024, 1, 10)
    orders = spark.createDataFrame(
        [(1, "F", d0), (2, "F", d0), (3, "F", d0), (4, "O", d0)],
        "o_orderkey bigint, o_orderstatus string, o_orderdate date",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 101, late), (1, 102, ontime),          # A: blame 101
            (2, 101, late), (2, 102, late),            # B: both late -> none
            (3, 103, late),                            # C: single supplier
            (4, 104, late), (4, 105, ontime),          # D: status O
        ],
        "l_orderkey bigint, l_suppkey bigint, l_shipdate date",
    )
    supplier = spark.createDataFrame(
        [(101, "s101"), (102, "s102"), (103, "s103"), (104, "s104"), (105, "s105")],
        "s_suppkey bigint, s_name string",
    )
    sf = str(tmp_path)
    orders.coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))
    lineitem.coalesce(1).write.parquet(os.path.join(sf, "lineitem.parquet"))
    supplier.coalesce(1).write.parquet(os.path.join(sf, "supplier.parquet"))
    got = [
        (r.s_name, r.numwait)
        for r in all_queries()["q259_waiting_suppliers"].build(spark, sf).collect()
    ]
    assert got == [("s101", 1)]


def test_inclusion_dependencies_planted_corpus(spark):
    """q310's core on a hand corpus: A = {1,2,3}, B = {1,2,3,4},
    C = {3,4,5} (with duplicate raw rows to prove the distinct
    semantics).  Every ordered-pair containment is hand-computed —
    exact subset A ⊆ B flagged, partial overlaps exact in floor ppm,
    disjointness never emitted (pairs appear only via co-occurrence)."""
    from database_migrator_spark.operators.etl import (
        _ind_report,
        inclusion_dependencies,
    )

    rows = [("A", v) for v in [1, 2, 3, 2, 1]]        # dups on purpose
    rows += [("B", v) for v in [1, 2, 3, 4]]
    rows += [("C", v) for v in [3, 4, 5, 5]]
    vals = spark.createDataFrame(rows, "col string, v long")
    hist, col_ids = inclusion_dependencies(vals)
    out = {
        (r.a_col, r.b_col): r
        for r in _ind_report(hist.localCheckpoint(eager=True), col_ids).collect()
    }
    assert set(out) == {
        ("A", "B"), ("B", "A"), ("A", "C"), ("C", "A"), ("B", "C"), ("C", "B"),
    }
    ab = out[("A", "B")]
    assert (ab.n_a, ab.n_b, ab.n_inter) == (3, 4, 3)
    assert ab.containment_ppm == 1_000_000 and ab.is_candidate_fk == 1
    ba = out[("B", "A")]
    assert ba.containment_ppm == 750_000 and ba.is_candidate_fk == 0
    ac = out[("A", "C")]   # |{3}| / 3 = 333333 (floor)
    assert ac.n_inter == 1 and ac.containment_ppm == 333_333
    cb = out[("C", "B")]   # |{3,4}| / 3 = 666666 (floor)
    assert cb.n_inter == 2 and cb.containment_ppm == 666_666


def test_inclusion_dependency_discovery_known_fks(spark):
    """q310 liveness on the synthetic lake: the generator's true FKs
    surface as exact subsets (containment = 1e6 ppm), the
    l_orderkey <- o_orderkey reverse is PARTIAL (not every order has
    line items — the asymmetry the |A∩B|/|A| direction encodes), and
    the report is a real spectrum, not a constant."""
    from database_migrator_spark.plans.registry import all_queries

    from .conftest import SF_SMOKE

    out = {
        (r.a_col, r.b_col): r
        for r in all_queries()["q310_inclusion_dependency_discovery"]
        .build(spark, SF_SMOKE)
        .collect()
    }
    for a, b in [
        ("orders.o_custkey", "customer.c_custkey"),
        ("lineitem.l_orderkey", "orders.o_orderkey"),
        ("nation.n_regionkey", "region.r_regionkey"),
        ("lineitem.l_partkey", "part.p_partkey"),
        ("lineitem.l_suppkey", "supplier.s_suppkey"),
    ]:
        r = out[(a, b)]
        assert r.is_candidate_fk == 1 and r.containment_ppm == 1_000_000, (a, b)
    rev = out[("orders.o_orderkey", "lineitem.l_orderkey")]
    assert 0 < rev.containment_ppm < 1_000_000
    ppms = {r.containment_ppm for r in out.values()}
    assert len(ppms) > 20          # probed: 72-99 distinct values by SF
    assert any(0 < p < 1_000_000 for p in ppms)
