"""Property tests for the exact bitmap distinct family (q189/q190/q198):
the word-bitmap fold must agree with Python set arithmetic on arbitrary
user/day assignments — including user ids straddling word boundaries
(62/63/64) and the same user appearing many times."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from database_migrator_spark.operators.bitmapops import (
    merge_words,
    popcount,
    user_bitmap_words,
)

# (day, user) assignments; user ids chosen to straddle 63-bit word
# boundaries and to collide heavily
_ASSIGNMENTS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 200)),
    min_size=1,
    max_size=60,
)


@given(_ASSIGNMENTS)
@settings(max_examples=15, deadline=None)
def test_bitmap_popcount_equals_set_distinct(spark, pairs):
    df = spark.createDataFrame(pairs, "d int, user_id long")
    words = user_bitmap_words(df, "d")
    got = {
        r["d"]: r["n_distinct"] for r in popcount(words, "d").collect()
    }
    want = {}
    for d, u in pairs:
        want.setdefault(d, set()).add(u)
    assert got == {d: len(s) for d, s in want.items()}


@given(_ASSIGNMENTS)
@settings(max_examples=15, deadline=None)
def test_bitmap_merge_equals_set_union(spark, pairs):
    """Merging all days' words (the q189 rollup / q198 rolling-union
    primitive) must equal the distinct count of the union."""
    df = spark.createDataFrame(pairs, "d int, user_id long")
    words = user_bitmap_words(df, "d").withColumn("g", F.lit(1))
    merged = merge_words(words, "g")
    [row] = popcount(merged, "g").collect()
    assert row["n_distinct"] == len({u for _, u in pairs})


@given(_ASSIGNMENTS, _ASSIGNMENTS)
@settings(max_examples=15, deadline=None)
def test_bitmap_intersection_equals_set_intersection(spark, pa, pb):
    """The q190 retention primitive: AND of two groups' word bitmaps
    popcounts to the exact set intersection."""
    users_a = {u for _, u in pa}
    users_b = {u for _, u in pb}
    df = spark.createDataFrame(
        [(0, u) for u in users_a] + [(1, u) for u in users_b], "g int, user_id long"
    )
    words = user_bitmap_words(df, "g")
    a = words.where(F.col("g") == 0).select("w", F.col("bm").alias("bm_a"))
    b = words.where(F.col("g") == 1).select("w", F.col("bm").alias("bm_b"))
    inter = (
        a.join(b, "w")
        .agg(F.sum(F.bit_count(F.col("bm_a").bitwiseAND(F.col("bm_b")))).alias("n"))
        .collect()[0]["n"]
    )
    assert (inter or 0) == len(users_a & users_b)
