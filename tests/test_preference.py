"""q308 Bradley-Terry / q309 Cohen's kappa — unit proofs beyond the
catalog oracle.

The BT tests follow the q306 lesson (an iterative trainer can be
hash-green yet never iterate): a planted comparison set where the
round-1 and round-2 fixed-point strengths DIFFER is pinned against an
independent pure-Python replay of the integer recurrence, so a refactor
that silently stops the MM loop goes red here even though the catalog
oracle (which replays the same recurrence) would stay green.

The kappa test recomputes Cohen's kappa per source from the raw parquet
with an INDEPENDENT pandas implementation (plain float formula, no
shared code) and compares to q309's output.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest

from database_migrator_spark.operators.preference import (
    _BT_NUM,
    _BT_SCALE,
    _KAPPA_DISTINCT_MIN,
    _KAPPA_NCHARS_MIN,
    bt_fixed_point,
)
from database_migrator_spark.plans.registry import all_queries

from .conftest import SF_SMOKE

_QS = all_queries()

# planted comparisons: A beats B 3x, B beats C 3x, A beats C 1x, C beats A 1x
_PLANTED = (
    [("A", "B")] * 3 + [("B", "C")] * 3 + [("A", "C")] + [("C", "A")]
)


def _bt_reference(comps: list[tuple[str, str]], iterations: int) -> dict[str, int]:
    """Pure-Python replay of the exact integer MM recurrence."""
    wdir = Counter(comps)
    games: Counter = Counter()
    wins: Counter = Counter()
    for (w, l), c in wdir.items():
        games[(w, l)] += c
        games[(l, w)] += c
        wins[w] += c
    items = sorted({i for i, _ in games})
    p = {i: _BT_SCALE for i in items}
    for _ in range(iterations):
        d: dict[str, int] = {}
        for (i, j), n in games.items():
            d[i] = d.get(i, 0) + (n * _BT_NUM) // (p[i] + p[j])
        p = {i: max((wins.get(i, 0) * _BT_NUM) // d[i], 1) for i in items}
    return p


def test_bt_second_round_changes_strengths(spark):
    """The planted corpus separates round 1 from round 2 (verified in the
    reference first), and bt_fixed_point reproduces round 2 exactly — a
    loop that stops after one round cannot pass."""
    r1 = _bt_reference(_PLANTED, 1)
    r2 = _bt_reference(_PLANTED, 2)
    assert r1 != r2, "planted corpus no longer separates rounds — re-plant"
    comp = spark.createDataFrame(_PLANTED, ["winner", "loser"])
    got = {
        r["i"]: r["p"]
        for r in bt_fixed_point(comp, iterations=2).collect()
    }
    assert got == r2


def test_bt_full_iterations_match_reference(spark):
    r5 = _bt_reference(_PLANTED, 5)
    comp = spark.createDataFrame(_PLANTED, ["winner", "loser"])
    got = {r["i"]: r["p"] for r in bt_fixed_point(comp).collect()}
    assert got == r5
    # sanity: A dominates, C trails (A won 4 of 5 games incl. vs B)
    assert got["A"] > got["B"] > got["C"]


def test_bt_zero_win_item_clamps_not_divides_by_zero(spark):
    """An item that never wins clamps to strength 1 (not 0) so later
    rounds never hit p_i + p_j = 0."""
    comps = [("A", "B")] * 4
    comp = spark.createDataFrame(comps, ["winner", "loser"])
    got = {r["i"]: r["p"] for r in bt_fixed_point(comp, iterations=3).collect()}
    assert got == _bt_reference(comps, 3)
    assert got["B"] == 1


def test_q308_output_is_nondegenerate(spark):
    """Strengths must actually spread (the q304/q305 vacuous-output
    lesson): at sf0.001 the 20 sources may not all tie."""
    rows = _QS["q308_bradley_terry_preference"].build(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    strengths = {r["strength"] for r in rows}
    assert len(strengths) > 5
    assert all(r["games"] > 0 for r in rows)


def test_q309_kappa_matches_independent_pandas(spark):
    """Recompute per-source Cohen's kappa with plain pandas floats."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    docs["a"] = (docs["n_chars"] >= _KAPPA_NCHARS_MIN).astype(int)
    docs["b"] = (
        docs["text"].map(lambda t: len(set(t.split(" "))))
        >= _KAPPA_DISTINCT_MIN
    ).astype(int)
    got = (
        _QS["q309_annotator_agreement_kappa"]
        .build(spark, SF_SMOKE)
        .toPandas()
        .set_index("source")
    )
    for src, grp in docs.groupby("source"):
        n = len(grp)
        po = float((grp["a"] == grp["b"]).mean())
        pa, pb = grp["a"].mean(), grp["b"].mean()
        pe = pa * pb + (1 - pa) * (1 - pb)
        want = (po - pe) / (1 - pe)
        assert got.loc[src, "kappa"] == pytest.approx(want, rel=1e-9)
        assert got.loc[src, "n_docs"] == n
    # mid-range by design: never saturated, never NULL
    assert got["kappa"].notna().all()
    assert (got["kappa"] < 1.0).all() and (got["kappa"] > 0.0).all()
