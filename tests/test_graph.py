"""Integer-exact PageRank: structural properties a rank algorithm must
have, independent of the oracle hash (which only proves cross-engine
agreement, not that the numbers mean anything)."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_migrator_spark.operators.graph import _SCALE, pagerank_fixed_point


def _edges(spark, pairs):
    both = list(pairs) + [(v, u) for u, v in pairs]
    return spark.createDataFrame(both, "u long, v long")


def test_pagerank_symmetric_graph_equal_ranks(spark):
    """On a vertex-transitive graph (a 4-cycle) every node must get
    exactly the same rank — any asymmetry would be an ordering or
    truncation bug."""
    r = pagerank_fixed_point(_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)]))
    ranks = {row["u"]: row["r"] for row in r.collect()}
    assert len(set(ranks.values())) == 1
    assert abs(sum(ranks.values()) - _SCALE) < 100  # mass conserved mod truncation


def test_pagerank_star_center_dominates(spark):
    """Star graph: the hub must out-rank every leaf, and all leaves must
    tie exactly."""
    r = pagerank_fixed_point(_edges(spark, [(0, i) for i in range(1, 6)]))
    ranks = {row["u"]: row["r"] for row in r.collect()}
    leaf_ranks = {ranks[i] for i in range(1, 6)}
    assert len(leaf_ranks) == 1
    assert ranks[0] > leaf_ranks.pop() * 2


def test_pagerank_mass_nearly_conserved(spark):
    """Total rank mass stays within n·iterations integer-truncation loss
    of SCALE (each DIV can only LOSE mass, never create it)."""
    pairs = [(i, (i * 7 + 3) % 11) for i in range(11) if i != (i * 7 + 3) % 11]
    e = _edges(spark, pairs).distinct()
    r = pagerank_fixed_point(e)
    total = r.agg(F.sum("r")).first()[0]
    n = e.select("u").distinct().count()
    assert total <= _SCALE
    assert _SCALE - total < 100 * (n + 1)


def test_pagerank_matches_float_reference(spark):
    """The fixed-point recurrence tracks a float PageRank to ~1e-9 on a
    small asymmetric graph (truncation is 1e-12 per op)."""
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3)]
    r = {row["u"]: row["r"] / _SCALE for row in pagerank_fixed_point(_edges(spark, pairs)).collect()}
    # float reference with identical structure
    adj: dict[int, list[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    n = len(adj)
    ranks = {u: 1.0 / n for u in adj}
    for _ in range(5):
        nxt = {}
        for v in adj:
            incoming = sum(ranks[u] / len(adj[u]) for u in adj if v in adj[u])
            nxt[v] = 0.15 / n + 0.85 * incoming
        ranks = nxt
    for u in adj:
        assert abs(r[u] - ranks[u]) < 1e-9


def test_weighted_pagerank_matches_python_replay(spark):
    """pagerank_weighted_fixed_point (q241): the integer recurrence on a
    small asymmetric weighted graph must equal a plain-Python replay of
    the same fixed-point arithmetic, and per-round mass must stay
    conserved within the floor-division leakage bound (N floors of at
    most 1 trillionth each per round)."""
    from database_migrator_spark.operators.graph import (
        _SCALE,
        pagerank_weighted_fixed_point,
    )

    edges = [("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "d", 5)]
    und = [(u, v, w) for u, v, w in edges] + [(v, u, w) for u, v, w in edges]
    df = spark.createDataFrame(und, "u string, v string, w long")
    got = {r.u: r.r for r in pagerank_weighted_fixed_point(df).collect()}

    tw = {}
    for u, v, w in und:
        tw[u] = tw.get(u, 0) + w
    n = len(tw)
    base = _SCALE // n
    r = {u: base for u in tw}
    for _ in range(5):
        s = {u: 0 for u in tw}
        for u, v, w in und:
            s[v] += (r[u] * w) // tw[u]
        r = {u: (15 * base + 85 * s[u]) // 100 for u in tw}
    assert got == r
    assert abs(sum(got.values()) - _SCALE) <= 5 * n * 100  # floor leakage
