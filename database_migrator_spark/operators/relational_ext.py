"""Extended relational coverage: GROUPING SETS, unpivot, ordered string
aggregation, arg-min/max, correlated subqueries (Catalyst decorrelation),
and a bucketized range join — the pattern Spark needs where engines with
native range-join support use an inequality join.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_migrator_spark.functions.exact import int_div, sql_cents_sum, to_cents
from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import table


@query(
    "q47_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*)                        AS n_orders,
           {sql_cents_sum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("grouping-sets", "E9"),
)
def q47_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL API (same Catalyst Expand
    operator as rollup/cube)."""
    # unique per-call view name: safe if the driver runs queries concurrently;
    # dropped right after analysis (the returned plan is already resolved)
    view = f"__rext_orders_{uuid.uuid4().hex[:8]}"
    table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"""
            SELECT o_orderstatus, o_orderpriority,
                   COUNT(*) AS n_orders,
                   -- 100.0 would parse as DECIMAL(4,1) in Spark SQL (unlike
                   -- F.lit(100.0)); force double so both engines divide in ieee754
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / CAST(100.0 AS DOUBLE)
                       AS total_price
            FROM {view}
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
            ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
            """
        )
    finally:
        spark.catalog.dropTempView(view)


@query(
    "q48_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, val
    FROM (
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
        FROM lineitem WHERE l_orderkey < 100
    )
    UNPIVOT (val FOR metric IN (l_quantity, l_discount, l_tax))
    ORDER BY l_orderkey, l_linenumber, metric
    """,
    tags=("unpivot",),
)
def q48_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt): a pure Expand, no shuffle until the sort."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=["l_quantity", "l_discount", "l_tax"],
            variableColumnName="metric",
            valueColumnName="val",
        )
        .orderBy("l_orderkey", "l_linenumber", "metric")
    )


@query(
    "q49_listagg_sorted",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    tags=("listagg", "aggregate"),
)
def q49_listagg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list is unordered by contract,
    so sort_array before joining — the deterministic LISTAGG pattern."""
    n = table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"))
        .orderBy("n_regionkey")
    )


@query(
    "q50_argmax_per_group",
    oracle="""
    SELECT o_orderstatus, o_orderkey AS top_orderkey, o_totalprice AS top_price
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_orderstatus
                               ORDER BY o_totalprice DESC, o_orderkey DESC) = 1
    ORDER BY o_orderstatus
    """,
    tags=("argmax", "aggregate"),
)
def q50_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max via max_by with a struct ordering key (price, then key —
    deterministic under ties); a single hash aggregate, cheaper than the
    window-function form at scale."""
    o = table(spark, sf_dir, "orders")
    ord_key = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", ord_key).alias("top_orderkey"),
            F.max("o_totalprice").alias("top_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q51_correlated_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 3 * (SELECT AVG(o2.o_totalprice)
                              FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
    ORDER BY o_orderkey
    """,
    tags=("subquery", "decorrelation"),
)
def q51_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join; no per-row subquery execution ever happens.

    Determinism note: both engines compute the same per-customer AVG from
    the same doubles in some order; a 3× threshold comparison against a
    ~30%-spread distribution cannot flip on the ~1e-12 summation-order
    difference."""
    view = f"__rext_orders_{uuid.uuid4().hex[:8]}"
    table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"""
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM {view} o
            WHERE o_totalprice > 3 * (SELECT AVG(o2.o_totalprice)
                                      FROM {view} o2
                                      WHERE o2.o_custkey = o.o_custkey)
            ORDER BY o_orderkey
            """
        )
    finally:
        spark.catalog.dropTempView(view)


def bucketized_range_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    range_seconds: int,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Count build-side rows within [probe_ts, probe_ts + range) per probe
    row, sharing ``key``. Spark lacks a native range join; the scalable
    pattern buckets time into range-sized cells, explodes the probe side
    into the (at most 2) candidate cells, equi-joins on (key, cell) — a
    plain shuffled hash join — then applies the exact range filter. Work is
    O(N · rows-per-cell) instead of a quadratic theta-join."""
    bucket = bucket_seconds or range_seconds
    # a probe row's range (lo, lo+range] spans ceil(range/bucket)+1 cells;
    # a fixed 2-cell explode would silently drop matches when bucket < range
    n_cells = -(-range_seconds // bucket) + 1
    p_cell = F.expr(f"unix_micros({probe_ts}) DIV {bucket * 1_000_000}")  # exact floor-div
    p = probe.withColumn("__cell", F.explode(F.array(*[p_cell + i for i in range(n_cells)])))
    b = build.withColumn("__cell", F.expr(f"unix_micros({build_ts}) DIV {bucket * 1_000_000}"))
    lo = F.unix_micros(F.col(probe_ts))
    hi = lo + range_seconds * 1_000_000
    bts = F.unix_micros(F.col(build_ts))
    return p.join(b, [key, "__cell"]).where((bts > lo) & (bts <= hi))


@query(
    "q52_range_join_followup_events",
    oracle="""
    SELECT e.event_id, COUNT(f.event_id) AS n_followups
    FROM events e
    JOIN events f
      ON f.user_id = e.user_id
     AND epoch_us(f.ts) > epoch_us(e.ts)
     AND epoch_us(f.ts) <= epoch_us(e.ts) + CAST(3600 AS BIGINT) * 1000000
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    ORDER BY e.event_id
    """,
    tags=("range-join", "custom-operator"),
)
def q52_range_join_followup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event: how many same-user events follow within an
    hour — a bucketized range join (see bucketized_range_join)."""
    e = table(spark, sf_dir, "events")
    probe = e.where(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    build = e.select("user_id", F.col("ts").alias("b_ts"), F.col("event_id").alias("f_id"))
    joined = bucketized_range_join(
        probe, build, key="user_id", probe_ts="p_ts", build_ts="b_ts", range_seconds=3600
    )
    return (
        joined.groupBy("event_id")
        .agg(F.count("f_id").alias("n_followups"))
        .orderBy("event_id")
    )


@query(
    "q77_exact_moment_stats",
    oracle="""
    WITH m AS (
        SELECT event_type,
               COUNT(*)                                       AS n,
               -- DuckDB SUM(BIGINT) yields HUGEINT; cast back so the
               -- dtype matches Spark's bigint
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                                                              AS sum_cents,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                        * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                                                              AS sumsq_cents
        FROM events GROUP BY event_type
    )
    SELECT event_type, n, sum_cents, sumsq_cents,
           CAST(sum_cents AS DOUBLE) / (100.0 * n)            AS mean_value,
           sqrt((CAST(n AS DOUBLE) * CAST(sumsq_cents AS DOUBLE)
                 - CAST(sum_cents AS DOUBLE) * CAST(sum_cents AS DOUBLE))
                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 100.0
                                                              AS stddev_value
    FROM m
    ORDER BY event_type
    """,
    tags=("statistics", "moments", "aggregate"),
)
def q77_exact_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-exact statistics via integer moments: built-in
    STDDEV differs across engines (Welford vs naive, summation order),
    so the hash-stable pattern aggregates EXACT integer moments
    (n, Σcents, Σcents²) and derives mean/stddev in double with an
    identical expression shape on both sides — every double op consumes
    the same exactly-representable ints, so results are bit-identical.
    One partial+final aggregate, same cost as a plain GROUP BY."""
    e = table(spark, sf_dir, "events")
    cents = to_cents("value")
    m = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("sum_cents"),
        F.sum(cents * cents).alias("sumsq_cents"),
    )
    n_d = F.col("n").cast("double")
    sum_d = F.col("sum_cents").cast("double")
    sq_d = F.col("sumsq_cents").cast("double")
    return m.select(
        "event_type", "n", "sum_cents", "sumsq_cents",
        (sum_d / (100.0 * F.col("n"))).alias("mean_value"),
        (F.sqrt((n_d * sq_d - sum_d * sum_d) / (n_d * (n_d - 1.0))) / 100.0).alias(
            "stddev_value"
        ),
    ).orderBy("event_type")


@query(
    "q81_rank_family",
    oracle="""
    SELECT o_orderstatus, o_orderkey,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume,
           ntile(4)       OVER w AS quartile
    FROM orders
    WHERE o_orderkey < 2000
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderstatus, o_orderkey
    """,
    tags=("window", "ranking", "E6"),
)
def q81_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining rank-family windows: percent_rank, cume_dist, ntile.
    All three produce exact rationals of row positions ((r-1)/(n-1), k/n,
    bucket index), so they hash-match across engines; the window key
    carries o_orderkey as a unique tiebreaker to pin tie order."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderstatus",
            "o_orderkey",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_orderstatus", "o_orderkey")
    )


@query(
    "q82_map_functions",
    oracle="""
    WITH per_user AS (
        SELECT user_id, event_type, COUNT(*) AS n
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           COUNT(*)                                          AS map_size,
           string_agg(event_type, ',' ORDER BY event_type)   AS keys_sorted,
           string_agg(CAST(n AS VARCHAR), ',' ORDER BY event_type)
                                                             AS values_by_key,
           CAST(SUM(n) AS BIGINT)                            AS total_events
    FROM per_user
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("map", "semistructured", "E13"),
)
def q82_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed columns end-to-end: per-user event_type→count maps built
    with map_from_entries, then consumed via map_keys/map_values (sorted
    through the entry structs for determinism) and aggregate-folded
    values. The oracle derives the same projections relationally — what
    the hash checks is that the map round-trip loses nothing."""
    e = table(spark, sf_dir, "events")
    per = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("counts")
    )
    return (
        m.select(
            "user_id",
            F.size("counts").alias("map_size"),
            F.array_join(F.map_keys("counts"), ",").alias("keys_sorted"),
            F.array_join(
                F.transform(F.map_values("counts"), lambda v: v.cast("string")), ","
            ).alias("values_by_key"),
            F.aggregate(
                F.map_values("counts"), F.lit(0).cast("bigint"), lambda a, b: a + b
            ).alias("total_events"),
        )
        .orderBy("user_id")
    )


@query(
    "q95_hll_sketch_union",
    oracle=None,  # HLL estimates are approximate and implementation-
    # specific (Spark uses the Apache DataSketches HLL); accuracy vs the
    # exact distinct count is asserted in tests/test_sketches.py instead
    tags=("sketch", "hll", "approx", "E10"),
)
def q95_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches — the property that makes
    sketches work on a cluster: per-event_type HLL sketches of user_id
    aggregate in one shuffle (each a few KB regardless of input size),
    then re-aggregate WITHOUT rescanning the data: hll_union_agg merges
    the per-type sketches into the overall estimate, exactly how rollups
    over date/region partitions amortize at 100 TB. Output is the
    per-type estimates plus the merged '__all__' row."""
    e = table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
    by_type = per.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    )
    merged = per.agg(F.hll_union_agg("sk").alias("u")).select(
        F.lit("__all__").alias("event_type"),
        F.hll_sketch_estimate("u").alias("approx_users"),
    )
    return by_type.unionByName(merged).orderBy("event_type")


_PIVOT_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "q150_pivot_crosstab",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT)        AS n_urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)          AS n_high,
           CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT)        AS n_medium,
           CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS n_notspec,
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT)           AS n_low,
           SUM(CASE WHEN o_orderpriority = '1-URGENT'
                    THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) / 100.0 AS urgent_total
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("relational", "pivot", "crosstab"),
)
def q150_pivot_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT / crosstab — the reshaping operator class (long → wide):
    order counts per status × priority plus the urgent-revenue column,
    via Spark's native ``groupBy().pivot(values=...)``. Passing the
    explicit pivot-value list keeps the plan a single pass (no
    distinct-values pre-query) and the output schema static — the only
    way pivot is safe on a 100 TB table, where an unbounded value set
    would both require an extra scan and blow the column count. The
    oracle is the standard CASE-WHEN rendition, counts exact and money
    in integer cents."""
    o = table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PIVOT_PRIORITIES)
        .agg(
            F.count(F.lit(1)).alias("n"),  # count(*) is rejected inside pivot
            F.sum(to_cents("o_totalprice")).alias("cents"),
        )
    )
    col = lambda v, suffix: F.coalesce(  # noqa: E731  absent combos → 0
        F.col(f"`{v}_{suffix}`"), F.lit(0)
    )
    return piv.select(
        "o_orderstatus",
        col("1-URGENT", "n").alias("n_urgent"),
        col("2-HIGH", "n").alias("n_high"),
        col("3-MEDIUM", "n").alias("n_medium"),
        col("4-NOT SPECIFIED", "n").alias("n_notspec"),
        col("5-LOW", "n").alias("n_low"),
        (col("1-URGENT", "cents") / F.lit(100.0)).alias("urgent_total"),
    ).orderBy("o_orderstatus")


@query(
    "q151_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT)                       AS n_rows,
           quantile_cont(l_quantity, 0.25)                AS p25,
           quantile_cont(l_quantity, 0.5)                 AS median,
           quantile_cont(l_quantity, 0.75)                AS p75,
           quantile_cont(l_quantity, 0.99)                AS p99,
           CAST(quantile_disc(l_quantity, 0.5) AS DOUBLE) AS median_disc
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("relational", "percentile", "statistics"),
)
def q151_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (the ground truth q62's t-digest approximates):
    continuous (interpolated) quartiles + p99 and the discrete median of
    l_quantity per return flag. Both engines implement the same
    definition — sort, pos = (n-1)·p, linear interpolation between the
    two neighbors (SQL-standard PERCENTILE_CONT) — over integer-valued
    quantities, so the interpolated values agree to the hash's 6
    decimals. Exact percentile is a full-sort-per-group operator: fine
    as an audit/oracle query, while the streaming-mergeable t-digest
    (q62) is what a 100 TB pipeline runs continuously — declaring both
    keeps that trade-off explicit and testable."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.percentile("l_quantity", F.lit(0.25)).alias("p25"),
            F.percentile("l_quantity", F.lit(0.5)).alias("median"),
            F.percentile("l_quantity", F.lit(0.75)).alias("p75"),
            F.percentile("l_quantity", F.lit(0.99)).alias("p99"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)")
            .cast("double")
            .alias("median_disc"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q200_association_rules",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), n AS (
        SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM items
    ), cnt AS (
        SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY p
    ), freq AS (
        SELECT p, c FROM cnt WHERE c >= 2
    ), fitems AS (
        SELECT i.o, i.p FROM items i JOIN freq USING (p)
    ), pairs AS (
        SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS pc
        FROM fitems a JOIN fitems b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT pa AS part_a, pb AS part_b, pc AS pair_count,
           ca.c AS count_a, cb.c AS count_b,
           CAST(ROUND(CAST(pc AS DOUBLE) / n.n * 1000000000) AS BIGINT)
               / 1000000000.0 AS support,
           CAST(ROUND(CAST(pc AS DOUBLE) / ca.c * 1000000000) AS BIGINT)
               / 1000000000.0 AS confidence,
           CAST(ROUND(CAST(pc * n.n AS DOUBLE) / CAST(ca.c * cb.c AS DOUBLE)
                      * 1000000000) AS BIGINT) / 1000000000.0 AS lift
    FROM pairs
    JOIN freq ca ON ca.p = pairs.pa
    JOIN freq cb ON cb.p = pairs.pb, n
    ORDER BY lift DESC, part_a, part_b LIMIT 20
    """,
    tags=("relational", "market-basket", "association-rules", "affinity"),
    checkpointed_substrate=True,
)
def q200_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules — support / confidence / lift for
    part pairs co-purchased within an order, the Apriori 2-itemset tier:
    the affinity primitive behind co-occurrence recommendations and
    data-bundle detection.  Scale shape: the basket item table is
    deduped and checkpointed ONCE; the a-priori PRUNE (only parts with
    item-count >= min-support can appear in a frequent pair) runs
    BEFORE pair enumeration, so the within-basket self-join — pinned
    shuffle_merge on the basket key it is already clustered by — fans
    out only over frequent items, bounded by basket-size² per order.
    Part-count attachment is two joins against the parts-sized count
    table (unbounded derived -> pinned shuffle_merge, never broadcast).
    support/confidence/lift are single IEEE divisions of exact BIGINT
    products, 1e-9 fixed-pointed; total order (lift desc, part_a,
    part_b) with LIMIT 20 -> TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    items = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)  # one shuffle; 3 consumers
    )
    n = items.agg(F.countDistinct("o").alias("n"))
    cnt = items.groupBy("p").agg(F.count("*").alias("c"))
    freq = cnt.where(F.col("c") >= 2)
    fitems = items.join(freq.select("p").hint("shuffle_merge"), "p", "left_semi")
    a = fitems.select("o", F.col("p").alias("pa"))
    b = fitems.select("o", F.col("p").alias("pb"))
    pairs = (
        a.join(b.hint("shuffle_merge"), "o")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("pc"))
        .where(F.col("pc") >= 2)
    )
    ca = freq.select(F.col("p").alias("pa"), F.col("c").alias("count_a"))
    cb = freq.select(F.col("p").alias("pb"), F.col("c").alias("count_b"))
    fp = lambda x: (F.round(x * F.lit(1e9)).cast("long") / F.lit(1e9))  # noqa: E731
    return (
        pairs.join(ca.hint("shuffle_merge"), "pa")
        .join(cb.hint("shuffle_merge"), "pb")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("pc").alias("pair_count"),
            "count_a",
            "count_b",
            fp(F.col("pc").cast("double") / F.col("n").cast("double")).alias("support"),
            fp(F.col("pc").cast("double") / F.col("count_a").cast("double")).alias(
                "confidence"
            ),
            fp(
                (F.col("pc") * F.col("n")).cast("double")
                / (F.col("count_a") * F.col("count_b")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(20)
    )


@query(
    "q213_order_value_outliers",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ), oc AS (
        SELECT n.n_name, s.cents
        FROM spend s
        JOIN customer c ON c.c_custkey = s.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    ), fences AS (
        SELECT n_name,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(quantile_disc(cents, 0.25) AS BIGINT) AS q1_cents,
               CAST(quantile_disc(cents, 0.75) AS BIGINT) AS q3_cents
        FROM oc GROUP BY n_name
    ), fx AS (
        SELECT n_name, n_customers, q1_cents, q3_cents,
               q3_cents - q1_cents AS iqr_cents,
               q1_cents - (3 * (q3_cents - q1_cents)) // 2 AS lo_fence,
               q3_cents + (3 * (q3_cents - q1_cents)) // 2 AS hi_fence
        FROM fences
    )
    SELECT fx.n_name AS nation, fx.n_customers, fx.q1_cents, fx.q3_cents,
           fx.iqr_cents,
           CAST(SUM(CASE WHEN oc.cents < fx.lo_fence THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low_outliers,
           CAST(SUM(CASE WHEN oc.cents > fx.hi_fence THEN 1 ELSE 0 END)
                AS BIGINT) AS n_high_outliers,
           CAST(SUM(CASE WHEN oc.cents < fx.lo_fence OR oc.cents > fx.hi_fence
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(fx.n_customers AS DOUBLE) AS outlier_rate
    FROM oc JOIN fx USING (n_name)
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY nation
    """,
    tags=("relational", "outliers", "tukey", "statistics", "data-quality"),
    checkpointed_substrate=True,
)
def q213_order_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit of customer LIFETIME spend per nation —
    the robust (quartile-based) anomaly report that q151's percentiles
    feed in a real pipeline: per nation, exact discrete quartiles of
    each customer's total spend in INTEGER CENTS, the 1.5×IQR fences
    computed with integer arithmetic (3·IQR DIV 2 — no float fence can
    disagree between engines), and the count/rate of customers outside
    them. (r14: the first version fenced SINGLE-order value, but
    o_totalprice is too light-tailed — zero outliers at every SF, both
    fences, hash-green, so the detection branch was dead code; the
    per-customer SUM has a real tail — high outliers 2/14/154 and low
    1/3/1 at sf0.001/0.01/0.1.) Two-pass by definition (fences, then
    the fence filter) — the (nation, cents) per-customer projection is
    checkpointed so the corpus is aggregated once and the bounded
    25-row fence table broadcasts back."""
    spend = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.sum(to_cents("o_totalprice")).cast("long").alias("cents"))
    )
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), F.col("c_nationkey").alias("nationkey")
    )
    n = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey"), F.col("n_name").alias("nation")
    )
    oc = (
        spend.join(c, "custkey")
        .join(F.broadcast(n), "nationkey")
        .select("nation", "cents")
        .localCheckpoint(eager=True)  # scanned by the fence pass AND the filter pass
    )
    fences = oc.groupBy("nation").agg(
        F.count("*").alias("n_customers"),
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("q1_cents"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("q3_cents"),
    )
    iqr = F.col("q3_cents") - F.col("q1_cents")
    fx = fences.select(
        "nation",
        "n_customers",
        "q1_cents",
        "q3_cents",
        iqr.alias("iqr_cents"),
        (F.col("q1_cents") - int_div(F.lit(3) * iqr, F.lit(2))).alias("lo_fence"),
        (F.col("q3_cents") + int_div(F.lit(3) * iqr, F.lit(2))).alias("hi_fence"),
    )
    low = (F.col("cents") < F.col("lo_fence")).cast("long")
    high = (F.col("cents") > F.col("hi_fence")).cast("long")
    return (
        oc.join(F.broadcast(fx), "nation")
        .groupBy("nation", "n_customers", "q1_cents", "q3_cents", "iqr_cents")
        .agg(
            F.sum(low).alias("n_low_outliers"),
            F.sum(high).alias("n_high_outliers"),
            (
                F.sum(low + high).cast("double") / F.col("n_customers").cast("double")
            ).alias("outlier_rate"),
        )
        .orderBy("nation")
    )


@query(
    "q222_trimmed_order_stats",
    oracle="""
    WITH oc AS (
        SELECT n.n_name,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    ), hist AS (
        SELECT n_name, cents, CAST(COUNT(*) AS BIGINT) AS c
        FROM oc GROUP BY 1, 2
    ), cum AS (
        SELECT n_name, cents, c,
               CAST(SUM(c) OVER (PARTITION BY n_name ORDER BY cents
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
        FROM hist
    ), tot AS (
        SELECT n_name, CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(cents * c) AS BIGINT) AS s
        FROM hist GROUP BY 1
    ), kept AS (
        SELECT cum.n_name, t.n, t.s, t.n // 10 AS t_side,
               GREATEST(0, LEAST(cum_c, t.n - t.n // 10)
                           - GREATEST(cum_c - c, t.n // 10)) AS k_c,
               cents
        FROM cum JOIN tot t USING (n_name)
    )
    SELECT n_name AS nation,
           n AS n_orders,
           t_side AS n_trimmed_each_side,
           CAST(ROUND(CAST(s AS DOUBLE) / n * 1000000000) AS BIGINT)
               / 1000000000.0 AS mean_cents,
           CAST(ROUND(CAST(SUM(cents * k_c) AS DOUBLE) / (n - 2 * t_side)
                      * 1000000000) AS BIGINT) / 1000000000.0
               AS trimmed_mean_cents
    FROM kept
    GROUP BY 1, 2, 3, s
    ORDER BY nation
    """,
    tags=("relational", "robust-stats", "trimmed-mean", "tukey", "data-quality"),
    checkpointed_substrate=True,
)
def q222_trimmed_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean of order value per nation — the robust LOCATION
    estimate next to q213's Tukey fences (which COUNT outliers, this
    neutralizes them): drop the lowest and highest n DIV 10 order
    statistics and average the middle exactly, SORT-FREE via the
    bounded integer-cents histogram — each histogram cell contributes
    max(0, min(cum, n-t) - max(cum-c, t)) kept copies, the overlap of
    its order-statistic range [cum-c+1, cum] with the kept band
    [t+1, n-t], so the trimmed sum is one pure-BIGINT pass over the
    (nation, cents) histogram (no per-row rank, no corpus sort). The
    per-nation cumulative window runs over the bounded histogram only
    (q201/q213's exception); the raw mean rides along for the
    robustness delta. Reuses q213's checkpointed projection shape: one
    corpus scan, bounded everything after."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    oc = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", to_cents("o_totalprice").alias("cents"))
    )
    hist = (
        oc.groupBy("n_name", "cents")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)  # bounded: value-domain-sized
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select("n_name", "cents", "c", F.sum("c").over(w).alias("cum_c"))
    tot = hist.groupBy("n_name").agg(
        F.sum("c").alias("n"), F.sum(F.col("cents") * F.col("c")).alias("s")
    )
    t_side = F.expr("n DIV 10")
    kept = cum.join(F.broadcast(tot), "n_name").select(
        "n_name",
        "n",
        "s",
        t_side.alias("t_side"),
        F.greatest(
            F.lit(0).cast("long"),
            F.least(F.col("cum_c"), F.col("n") - t_side)
            - F.greatest(F.col("cum_c") - F.col("c"), t_side),
        ).alias("k_c"),
        "cents",
    )
    return (
        kept.groupBy("n_name", "n", "t_side", "s")
        .agg(F.sum(F.col("cents") * F.col("k_c")).alias("tsum"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("n").alias("n_orders"),
            F.col("t_side").alias("n_trimmed_each_side"),
            (
                F.round((F.col("s").cast("double") / F.col("n").cast("double")) * F.lit(1e9)).cast("long")
                / F.lit(1e9)
            ).alias("mean_cents"),
            (
                F.round(
                    (
                        F.col("tsum").cast("double")
                        / (F.col("n") - 2 * F.col("t_side")).cast("double")
                    )
                    * F.lit(1e9)
                ).cast("long")
                / F.lit(1e9)
            ).alias("trimmed_mean_cents"),
        )
        .orderBy("nation")
    )


@query(
    "q259_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("relational", "correlated-subquery", "semi-anti", "tpch-q21"),
)
def q259_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape — 'suppliers who kept orders waiting': for
    finished orders with 2+ suppliers, blame the supplier who was the
    ONLY late shipper (ship lag > 60 days past the order date; the
    synthetic schema has no commit/receipt dates, so lateness is
    ship-lag). The textbook statement is a DOUBLE-CORRELATED
    EXISTS / NOT EXISTS — the hardest decorrelation shape in the TPC-H
    suite — and that is exactly what the oracle runs; the Spark side
    instead computes each order's supplier count and LATE-supplier
    count in ONE orderkey-partitioned window pass (order groups are
    tiny, so collect_set stays bounded) and filters late rows to those
    in multi-supplier orders whose only late supplier is their own.
    Hash equality IS the proof that the single-shuffle aggregation
    rewrite implements the nested quantifiers — the rewrite a plan
    author on a 100 TB fact table needs, because two correlated
    re-joins of lineitem would triple the dominant shuffle."""
    from pyspark.sql import Window

    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    j = l.join(
        o.hint("shuffle_merge"), l["l_orderkey"] == o["o_orderkey"]
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)).alias("late"),
    )
    w = Window.partitionBy("l_orderkey")
    flagged = j.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supps"),
        F.size(
            F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)
        ).alias("late_supps"),
    )
    qual = flagged.where(
        F.col("late") & (F.col("n_supps") >= 2) & (F.col("late_supps") == 1)
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        qual.groupBy("l_suppkey")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .join(s.hint("shuffle_merge"), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q262_join_cardinality_sketch",
    oracle="""
    WITH da AS (SELECT DISTINCT o_custkey AS k FROM orders),
    db AS (SELECT DISTINCT c_custkey AS k FROM customer),
    ha AS (
        SELECT k, substr(md5(CAST(k AS VARCHAR)), 1, 12) AS h FROM da
        QUALIFY row_number() OVER (ORDER BY substr(md5(CAST(k AS VARCHAR)), 1, 12), k) <= 16
    ), hb AS (
        SELECT k, substr(md5(CAST(k AS VARCHAR)), 1, 12) AS h FROM db
        QUALIFY row_number() OVER (ORDER BY substr(md5(CAST(k AS VARCHAR)), 1, 12), k) <= 16
    ), hu AS (
        SELECT h FROM (
            SELECT h, row_number() OVER (ORDER BY h, k) AS rn
            FROM (SELECT DISTINCT k, h FROM (SELECT * FROM ha UNION ALL SELECT * FROM hb))
        ) WHERE rn <= 16
    ), est AS (
        SELECT
          (SELECT CASE WHEN COUNT(*) < 16 THEN CAST(COUNT(*) AS BIGINT)
                       ELSE (15 * 281474976710656)
                            // CAST('0x' || MAX(h) AS BIGINT) END FROM ha)
              AS d_a_est,
          (SELECT CASE WHEN COUNT(*) < 16 THEN CAST(COUNT(*) AS BIGINT)
                       ELSE (15 * 281474976710656)
                            // CAST('0x' || MAX(h) AS BIGINT) END FROM hb)
              AS d_b_est,
          (SELECT CASE WHEN COUNT(*) < 16 THEN CAST(COUNT(*) AS BIGINT)
                       ELSE (15 * 281474976710656)
                            // CAST('0x' || MAX(h) AS BIGINT) END FROM hu)
              AS d_u_est
    ), ex AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)   AS n_a,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_b,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM da)       AS d_a,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM db)       AS d_b,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
                JOIN customer c ON o.o_custkey = c.c_custkey)  AS join_exact
    )
    SELECT n_a, n_b, d_a, d_b, d_a_est, d_b_est,
           GREATEST(d_a_est + d_b_est - d_u_est, 0) AS d_inter_est,
           join_exact,
           CAST(ROUND(CAST(GREATEST(d_a_est + d_b_est - d_u_est, 0) AS DOUBLE)
                      * (CAST(n_a AS DOUBLE) / CAST(d_a_est AS DOUBLE))
                      * (CAST(n_b AS DOUBLE) / CAST(d_b_est AS DOUBLE)))
                AS BIGINT) AS join_est
    FROM ex, est
    """,
    tags=("relational", "statistics", "cardinality", "sketch", "optimizer"),
    checkpointed_substrate=True,
)
def q262_join_cardinality_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-CARDINALITY estimation from mergeable KMV key sketches — the
    optimizer-statistics fidelity read (what a cost-based planner like
    Catalyst's CBO does before choosing broadcast vs shuffle): per-side
    bottom-16 md5 sketches of the join keys (q221's construction — MIN
    over fixed-width hex IS min-hash, and merging two sketches is just
    re-taking the bottom-16 of their union, so per-shard sketches
    combine losslessly), distinct sides via (k−1)·2^48 DIV h_(k),
    intersection by inclusion-exclusion (clamped at 0), and the
    System-R uniformity estimate |A⋈B| ≈ D∩ · (n_A/D_A) · (n_B/D_B) —
    reported NEXT TO the exact join count, so the estimator's error is
    measured on the same data the planner would plan.

    Determinism: sketches and distinct estimates are pure BIGINT
    (hex-string min-hash + floor division, n<k exact fallback); the
    final uniformity product is a fixed IEEE sequence over
    exactly-converted integers, ROUND half-up on both engines. Scale
    shape: per-side DISTINCT + bottom-k (WindowGroupLimit-able), the
    exact join pinned shuffle-merge; everything downstream of the ≤16-row
    sketches is bounded."""
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    from pyspark.sql import Window

    def bottom16(side: DataFrame) -> DataFrame:
        h = side.distinct().select(
            "k", F.substring(F.md5(F.col("k").cast("string")), 1, 12).alias("h")
        )
        w = Window.orderBy("h", "k")
        return (
            h.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 16)
            .select("k", "h")
            .localCheckpoint(eager=True)  # ≤16 rows; estimate + union merge
        )
    ha, hb = bottom16(o), bottom16(c)

    def kmv_est(sk: DataFrame) -> DataFrame:
        return sk.agg(
            F.when(
                F.count("*") < 16, F.count("*").cast("long")
            )
            .otherwise(
                F.expr(
                    "(15 * 281474976710656L)"
                    " div cast(conv(max(h), 16, 10) as bigint)"
                ).cast("long")
            )
            .alias("est")
        )

    hu = (
        ha.unionByName(hb)
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("h", "k")))
        .where(F.col("rn") <= 16)
        .select("k", "h")
    )
    d_a_est = kmv_est(ha).select(F.col("est").alias("d_a_est"))
    d_b_est = kmv_est(hb).select(F.col("est").alias("d_b_est"))
    d_u_est = kmv_est(hu).select(F.col("est").alias("d_u_est"))
    ex = (
        o.agg(F.count("*").alias("n_a"), F.countDistinct("k").alias("d_a"))
        .crossJoin(
            c.agg(F.count("*").alias("n_b"), F.countDistinct("k").alias("d_b"))
        )
        .crossJoin(
            o.join(c.hint("shuffle_merge"), "k")
            .agg(F.count("*").alias("join_exact"))
        )
    )
    d_inter = F.greatest(
        F.col("d_a_est") + F.col("d_b_est") - F.col("d_u_est"),
        F.lit(0).cast("long"),
    )
    return (
        ex.crossJoin(F.broadcast(d_a_est))
        .crossJoin(F.broadcast(d_b_est))
        .crossJoin(F.broadcast(d_u_est))
        .select(
            "n_a",
            "n_b",
            "d_a",
            "d_b",
            "d_a_est",
            "d_b_est",
            d_inter.alias("d_inter_est"),
            "join_exact",
            F.round(
                d_inter.cast("double")
                * (F.col("n_a").cast("double") / F.col("d_a_est").cast("double"))
                * (F.col("n_b").cast("double") / F.col("d_b_est").cast("double"))
            )
            .cast("long")
            .alias("join_est"),
        )
    )


# --- q270: Pareto skyline --------------------------------------------------
#
# Bucket width for the two-level prefix-max over the unit-price axis.
# price_fp = cents*1e4 // qty-cents ranges ~1.1e7..4.3e7 (the part price
# list bounds unit prices regardless of data volume), so 1e5-wide buckets
# give a few hundred cells — value-domain bounded, the q240/q269 precedent.
_SKYLINE_BUCKET = 100_000


@query(
    "q270_pareto_skyline_parts",
    oracle=f"""
    WITH pp AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) * 10000
               // SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS price_fp,
             SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS qty_c
      FROM lineitem GROUP BY 1
    ), b AS (
      SELECT price_fp // {_SKYLINE_BUCKET} AS bucket, MAX(qty_c) AS bq
      FROM pp GROUP BY 1
    ), pb AS (
      SELECT bucket, MAX(bq) OVER (ORDER BY bucket
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max FROM b
    ), x AS (
      SELECT pp.l_partkey, pp.price_fp, pp.qty_c, pb.prev_max,
        MAX(qty_c) OVER (PARTITION BY pp.price_fp // {_SKYLINE_BUCKET}
          ORDER BY pp.price_fp
          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS in_max,
        MAX(qty_c) OVER (PARTITION BY pp.price_fp) AS eq_max
      FROM pp JOIN pb ON pp.price_fp // {_SKYLINE_BUCKET} = pb.bucket
    )
    SELECT l_partkey AS part_key,
           price_fp / 10000.0 AS unit_price,
           qty_c / 100.0      AS total_qty
    FROM x
    WHERE NOT (GREATEST(COALESCE(prev_max, -1), COALESCE(in_max, -1)) >= qty_c
               OR eq_max > qty_c)
    ORDER BY unit_price, part_key
    """,
    tags=("relational", "skyline", "pareto", "dominance"),
    checkpointed_substrate=True,
)
def q270_pareto_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline (dominance query): the parts no other part beats on
    BOTH axes — lower average unit price AND higher total quantity sold
    (ties broken strictly: a dominator must be strictly better somewhere).
    The classic O(N²) NOT EXISTS formulation is replaced by an exact
    two-level prefix-max: in 2D, a point is dominated iff the max
    quantity among strictly-cheaper points reaches its own quantity (or a
    same-price point strictly exceeds it), and "max over strictly-cheaper"
    decomposes into (a) a prefix max over VALUE-DOMAIN-BOUNDED price
    buckets (few hundred cells — the only single-partition window) and
    (b) a per-bucket running max (windows partitioned by bucket, fully
    parallel). Unit price is exact fixed point (cents·10⁴ ÷ qty-cents,
    truncating DIV on provably non-negative operands) so both engines
    agree bit-for-bit; the formulation is brute-force-verified in
    tests/test_round11b.py. At 100 TB the corpus-scale work is one
    map-side-combinable groupBy + partitioned windows — no all-pairs
    term anywhere."""
    li = table(spark, sf_dir, "lineitem")
    pp = li.groupBy("l_partkey").agg(
        F.sum(to_cents("l_extendedprice")).alias("ext_c"),
        F.sum(to_cents("l_quantity")).alias("qty_c"),
    )
    pp = (
        pp.select(
            "l_partkey",
            F.expr("ext_c * 10000L DIV qty_c").alias("price_fp"),
            "qty_c",
        )
        .withColumn("bucket", F.expr(f"price_fp DIV {_SKYLINE_BUCKET}L"))
        # the per-part frame feeds both the bucket maxima and the dominance
        # pass — materialize it once so lineitem is scanned ONCE
        .localCheckpoint(eager=True)
    )

    from pyspark.sql import Window

    # level 1: bounded bucket frame (few hundred rows) — prefix max of the
    # per-bucket maxima over all STRICTLY lower buckets
    b = pp.groupBy("bucket").agg(F.max("qty_c").alias("bq"))
    pb = b.select(
        "bucket",
        F.max("bq")
        .over(
            Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
        )
        .alias("prev_max"),
    )
    # level 2: parallel per-bucket running max over strictly lower price,
    # plus the same-price group max
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("price_fp")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy("price_fp")
    x = (
        pp.join(F.broadcast(pb), "bucket")
        .withColumn("in_max", F.max("qty_c").over(w_in))
        .withColumn("eq_max", F.max("qty_c").over(w_eq))
    )
    dominated = (
        F.greatest(
            F.coalesce(F.col("prev_max"), F.lit(-1)),
            F.coalesce(F.col("in_max"), F.lit(-1)),
        )
        >= F.col("qty_c")
    ) | (F.col("eq_max") > F.col("qty_c"))
    return (
        x.where(~dominated)
        .select(
            F.col("l_partkey").alias("part_key"),
            (F.col("price_fp") / F.lit(10000.0)).alias("unit_price"),
            (F.col("qty_c") / F.lit(100.0)).alias("total_qty"),
        )
        .orderBy("unit_price", "part_key")
    )


# --- q279: median / MAD robust outlier screen -------------------------------


@query(
    "q279_mad_robust_screen",
    oracle="""
    WITH oc AS (
        SELECT n.n_name,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    ), hist AS (
        SELECT n_name, cents, CAST(COUNT(*) AS BIGINT) AS c
        FROM oc GROUP BY 1, 2
    ), tot AS (
        SELECT n_name, CAST(SUM(c) AS BIGINT) AS n,
               (SUM(c) + 1) // 2 AS k
        FROM hist GROUP BY 1
    ), cum AS (
        SELECT n_name, cents, c,
               CAST(SUM(c) OVER (PARTITION BY n_name ORDER BY cents
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
        FROM hist
    ), med AS (
        SELECT cum.n_name, cum.cents AS med_c
        FROM cum JOIN tot USING (n_name)
        WHERE cum.cum_c - cum.c < tot.k AND tot.k <= cum.cum_c
    ), dev AS (
        SELECT h.n_name, ABS(h.cents - m.med_c) AS d,
               CAST(SUM(h.c) AS BIGINT) AS c
        FROM hist h JOIN med m USING (n_name)
        GROUP BY 1, 2
    ), dcum AS (
        SELECT n_name, d, c,
               CAST(SUM(c) OVER (PARTITION BY n_name ORDER BY d
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
        FROM dev
    ), mad AS (
        SELECT dcum.n_name, dcum.d AS mad_c
        FROM dcum JOIN tot USING (n_name)
        WHERE dcum.cum_c - dcum.c < tot.k AND tot.k <= dcum.cum_c
    ), outl AS (
        SELECT dev.n_name,
               CAST(COALESCE(SUM(dev.c) FILTER (WHERE dev.d > 2 * mad.mad_c),
                             0) AS BIGINT) AS n_outliers
        FROM dev JOIN mad USING (n_name)
        GROUP BY 1
    )
    SELECT tot.n_name AS nation, tot.n AS n_orders,
           med.med_c / 100.0 AS median_value,
           mad.mad_c / 100.0 AS mad_value,
           outl.n_outliers,
           CAST(outl.n_outliers AS DOUBLE) / CAST(tot.n AS DOUBLE)
               AS outlier_share
    FROM tot
    JOIN med USING (n_name)
    JOIN mad USING (n_name)
    JOIN outl USING (n_name)
    ORDER BY nation
    """,
    tags=("relational", "robust-stats", "mad", "median", "data-quality"),
    checkpointed_substrate=True,
)
def q279_mad_robust_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median / MAD robust outlier screen per nation — the robust SCALE
    estimate completing the family (q213 Tukey fences, q222 trimmed
    mean): exact lower-median of order value, exact median absolute
    deviation, and the count beyond med ± 2·MAD. ALL THREE order
    statistics come from ONE corpus scan: the (nation, cents) histogram
    is checkpointed, the deviation histogram |cents − med| is REGROUPED
    FROM THE HISTOGRAM (never the corpus), and both medians are cells
    of a cumulative sum over bounded frames (q222's exception — the
    windows never touch corpus-scale rows). Pure BIGINT throughout; the
    two /100.0 presentations are exact."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    oc = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", to_cents("o_totalprice").alias("cents"))
    )
    hist = (
        oc.groupBy("n_name", "cents")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)  # bounded value-domain histogram
    )
    tot = hist.groupBy("n_name").agg(
        F.sum("c").alias("n"), F.expr("(SUM(c) + 1) DIV 2").alias("k")
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select("n_name", "cents", "c", F.sum("c").over(w).alias("cum_c"))
    med = (
        cum.join(F.broadcast(tot), "n_name")
        .where((F.col("cum_c") - F.col("c") < F.col("k")) & (F.col("k") <= F.col("cum_c")))
        .select("n_name", F.col("cents").alias("med_c"))
    )
    dev = (
        hist.join(F.broadcast(med), "n_name")
        .groupBy("n_name", F.abs(F.col("cents") - F.col("med_c")).alias("d"))
        .agg(F.sum("c").alias("c"))
        .localCheckpoint(eager=True)  # bounded; mad cell + outlier rollup share it
    )
    wd = (
        Window.partitionBy("n_name")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dcum = dev.select("n_name", "d", "c", F.sum("c").over(wd).alias("cum_c"))
    mad = (
        dcum.join(F.broadcast(tot), "n_name")
        .where((F.col("cum_c") - F.col("c") < F.col("k")) & (F.col("k") <= F.col("cum_c")))
        .select("n_name", F.col("d").alias("mad_c"))
    )
    outl = (
        dev.join(F.broadcast(mad), "n_name")
        .groupBy("n_name")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("d") > 2 * F.col("mad_c"), F.col("c"))),
                F.lit(0).cast("long"),
            ).alias("n_outliers")
        )
    )
    return (
        tot.join(F.broadcast(med), "n_name")
        .join(F.broadcast(mad), "n_name")
        .join(F.broadcast(outl), "n_name")
        .select(
            F.col("n_name").alias("nation"),
            F.col("n").alias("n_orders"),
            (F.col("med_c") / F.lit(100.0)).alias("median_value"),
            (F.col("mad_c") / F.lit(100.0)).alias("mad_value"),
            "n_outliers",
            (
                F.col("n_outliers").cast("double") / F.col("n").cast("double")
            ).alias("outlier_share"),
        )
        .orderBy("nation")
    )


# --- q283: selectivity independence audit -----------------------------------


@query(
    "q283_selectivity_independence",
    oracle="""
    WITH base AS (
        SELECT o_orderstatus AS s, o_orderpriority AS p,
               CAST(year(o_orderdate) AS VARCHAR) AS y
        FROM orders
    ), n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base
    ), cs AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY s),
    cp AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY p),
    cy AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY y),
    actual AS (
        SELECT 'status_x_priority' AS pred_kind, s AS a, p AS b,
               CAST(COUNT(*) AS BIGINT) AS actual_rows
        FROM base GROUP BY s, p
        UNION ALL
        SELECT 'status_x_year', s, y, CAST(COUNT(*) AS BIGINT)
        FROM base GROUP BY s, y
        UNION ALL
        SELECT 'priority_x_year', p, y, CAST(COUNT(*) AS BIGINT)
        FROM base GROUP BY p, y
    ), est AS (
        SELECT 'status_x_priority' AS pred_kind, cs.s AS a, cp.p AS b,
               (cs.c * cp.c) // n.n AS est_rows
        FROM cs, cp, n
        UNION ALL
        SELECT 'status_x_year', cs.s, cy.y, (cs.c * cy.c) // n.n
        FROM cs, cy, n
        UNION ALL
        SELECT 'priority_x_year', cp.p, cy.y, (cp.c * cy.c) // n.n
        FROM cp, cy, n
    )
    SELECT e.pred_kind AS pred_kind, e.a AS a, e.b AS b, e.est_rows,
           COALESCE(ac.actual_rows, 0) AS actual_rows,
           CAST(GREATEST(e.est_rows, COALESCE(ac.actual_rows, 0), 1) AS DOUBLE)
               / CAST(LEAST(GREATEST(e.est_rows, 1),
                            GREATEST(COALESCE(ac.actual_rows, 0), 1)) AS DOUBLE)
               AS q_error
    FROM est e
    LEFT JOIN actual ac
      ON ac.pred_kind = e.pred_kind AND ac.a = e.a AND ac.b = e.b
    ORDER BY pred_kind, a, b
    """,
    tags=("relational", "optimizer-stats", "selectivity", "cardinality"),
    checkpointed_substrate=True,
)
def q283_selectivity_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selectivity-estimation audit under the INDEPENDENCE assumption —
    the q262 twin for conjunctive predicates: for every two-column
    predicate (a AND b) over status/priority/order-year, the per-column
    frequency statistics predict est = |a|·|b|/n (exact integer DIV, the
    System-R rule every CBO applies without multi-column stats), set
    against the true count and the standard q-error
    max(est,act)/min(est,act) (1-clamped, so empty combos score the
    full miss). The corpus is scanned ONCE into the three-column
    projection checkpoint; the three per-column stats AND the three
    pairwise actuals are bounded aggregates over it; estimates are a
    cross of bounded stat frames. A high q-error row is exactly where a
    real optimizer needs a multi-column histogram or runtime
    re-optimization (AQE)."""
    o = (
        table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderstatus").alias("s"),
            F.col("o_orderpriority").alias("p"),
            F.year("o_orderdate").cast("string").alias("y"),
        )
        .localCheckpoint(eager=True)  # one scan feeds stats + actuals
    )
    # each stats frame is read by one actual and two estimate branches —
    # checkpoint the tiny frames so the corpus checkpoint is passed once per use
    n = o.agg(F.count("*").alias("n")).localCheckpoint(eager=True)
    cs = o.groupBy("s").agg(F.count("*").alias("c")).localCheckpoint(eager=True)
    cp = o.groupBy("p").agg(F.count("*").alias("c")).localCheckpoint(eager=True)
    cy = o.groupBy("y").agg(F.count("*").alias("c")).localCheckpoint(eager=True)

    def actuals_one_pass() -> DataFrame:
        """All three pairwise actuals in ONE corpus pass via GROUPING
        SETS (one Expand + one aggregate instead of three scans)."""
        view = f"__sel_audit_{uuid.uuid4().hex[:8]}"
        o.createOrReplaceTempView(view)
        try:
            return spark.sql(
                f"""
                SELECT CASE
                         WHEN GROUPING(y) = 1 THEN 'status_x_priority'
                         WHEN GROUPING(p) = 1 THEN 'status_x_year'
                         ELSE 'priority_x_year'
                       END AS pred_kind,
                       CASE WHEN GROUPING(y) = 1 OR GROUPING(p) = 1 THEN s
                            ELSE p END AS a,
                       CASE WHEN GROUPING(y) = 1 THEN p ELSE y END AS b,
                       COUNT(*) AS actual_rows
                FROM {view}
                GROUP BY GROUPING SETS ((s, p), (s, y), (p, y))
                """
            )
        finally:
            spark.catalog.dropTempView(view)

    def est(kind: str, fa: DataFrame, ka: str, fb: DataFrame, kb: str) -> DataFrame:
        return (
            fa.select(F.col(ka).alias("a"), F.col("c").alias("ca"))
            .crossJoin(F.broadcast(fb.select(F.col(kb).alias("b"), F.col("c").alias("cb"))))
            .crossJoin(F.broadcast(n))
            .select(
                F.lit(kind).alias("pred_kind"),
                "a",
                "b",
                F.expr("(ca * cb) DIV n").alias("est_rows"),
            )
        )

    acts = actuals_one_pass()
    ests = (
        est("status_x_priority", cs, "s", cp, "p")
        .unionByName(est("status_x_year", cs, "s", cy, "y"))
        .unionByName(est("priority_x_year", cp, "p", cy, "y"))
    )
    one = F.lit(1).cast("long")
    joined = ests.join(F.broadcast(acts), ["pred_kind", "a", "b"], "left").select(
        "pred_kind",
        "a",
        "b",
        "est_rows",
        F.coalesce(F.col("actual_rows"), F.lit(0).cast("long")).alias("actual_rows"),
    )
    return joined.select(
        "pred_kind",
        "a",
        "b",
        "est_rows",
        "actual_rows",
        (
            F.greatest(F.col("est_rows"), F.col("actual_rows"), one).cast("double")
            / F.least(
                F.greatest(F.col("est_rows"), one),
                F.greatest(F.col("actual_rows"), one),
            ).cast("double")
        ).alias("q_error"),
    ).orderBy("pred_kind", "a", "b")


# --- q291: broadcast decision audit -----------------------------------------
#
# Spark's default autoBroadcastJoinThreshold. Width estimates follow the
# planner's fixed-width-per-type stance: 8 bytes per numeric/date column
# plus the measured average string width.
_BCAST_THRESHOLD = 10 * 1024 * 1024


@query(
    "q291_broadcast_decision_audit",
    oracle=f"""
    WITH sides AS (
        SELECT 'customer' AS t, CAST(COUNT(*) AS BIGINT) AS rows_,
               CAST(8 * 3 + CEIL(AVG(len(c_name) + len(c_mktsegment)))
                    AS BIGINT) AS width
        FROM customer
        UNION ALL
        SELECT 'orders', CAST(COUNT(*) AS BIGINT),
               CAST(8 * 4 + CEIL(AVG(len(o_orderstatus) + len(o_orderpriority)))
                    AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'part', CAST(COUNT(*) AS BIGINT),
               CAST(8 * 3 + CEIL(AVG(len(p_name) + len(p_brand) + len(p_type)))
                    AS BIGINT)
        FROM part
        UNION ALL
        SELECT 'supplier', CAST(COUNT(*) AS BIGINT),
               CAST(8 * 2 + CEIL(AVG(len(s_name))) AS BIGINT)
        FROM supplier
        UNION ALL
        SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
               CAST(8 * 9 + CEIL(AVG(len(l_returnflag) + len(l_linestatus)))
                    AS BIGINT)
        FROM lineitem
    ), actual AS (
        SELECT 'customer x orders' AS join_name,
               CAST((SELECT COUNT(*) FROM customer c JOIN orders o
                     ON c.c_custkey = o.o_custkey) AS BIGINT) AS actual_rows,
               'customer' AS lt, 'orders' AS rt
        UNION ALL
        SELECT 'part x lineitem',
               CAST((SELECT COUNT(*) FROM part p JOIN lineitem l
                     ON p.p_partkey = l.l_partkey) AS BIGINT),
               'part', 'lineitem'
        UNION ALL
        SELECT 'supplier x lineitem',
               CAST((SELECT COUNT(*) FROM supplier s JOIN lineitem l
                     ON s.s_suppkey = l.l_suppkey) AS BIGINT),
               'supplier', 'lineitem'
        UNION ALL
        SELECT 'orders x lineitem',
               CAST((SELECT COUNT(*) FROM orders o JOIN lineitem l
                     ON o.o_orderkey = l.l_orderkey) AS BIGINT),
               'orders', 'lineitem'
    )
    SELECT a.join_name AS join_name,
           ls.rows_ AS left_rows, rs.rows_ AS right_rows,
           CAST(ls.rows_ * ls.width AS BIGINT) AS est_left_bytes,
           CAST(rs.rows_ * rs.width AS BIGINT) AS est_right_bytes,
           CASE WHEN LEAST(ls.rows_ * ls.width, rs.rows_ * rs.width)
                     > {_BCAST_THRESHOLD} THEN 'shuffle'
                WHEN ls.rows_ * ls.width <= rs.rows_ * rs.width
                     THEN 'broadcast_left'
                ELSE 'broadcast_right' END AS decision,
           a.actual_rows
    FROM actual a
    JOIN sides ls ON ls.t = a.lt
    JOIN sides rs ON rs.t = a.rt
    ORDER BY join_name
    """,
    tags=("relational", "optimizer-stats", "broadcast", "cbo"),
    checkpointed_substrate=True,
)
def q291_broadcast_decision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BROADCAST-vs-SHUFFLE decision audit — the third member of the
    mini cost-model family (q262 join cardinality, q283 conjunctive
    selectivity): for each candidate join, both sides' size estimates
    (rows × planner-style width: 8 bytes per numeric column + measured
    average string width) are held against Spark's default 10 MiB
    autoBroadcastJoinThreshold, producing the decision a CBO would make
    from table stats alone, next to the exact join cardinality. The
    audit's own plan is stats-shaped too: one aggregate per table for
    the width/row stats, four equi-join counts, bounded everything
    after."""
    spark_tables = {
        "customer": (
            "customer",
            3,
            F.length("c_name") + F.length("c_mktsegment"),
        ),
        "orders": (
            "orders",
            4,
            F.length("o_orderstatus") + F.length("o_orderpriority"),
        ),
        "part": (
            "part",
            3,
            F.length("p_name") + F.length("p_brand") + F.length("p_type"),
        ),
        "supplier": ("supplier", 2, F.length("s_name")),
        "lineitem": (
            "lineitem",
            9,
            F.length("l_returnflag") + F.length("l_linestatus"),
        ),
    }
    sides = None
    for name, (tbl, n_num, strw) in spark_tables.items():
        s = table(spark, sf_dir, tbl).agg(
            F.count("*").alias("rows_"),
            (F.lit(8 * n_num) + F.ceil(F.avg(strw))).cast("long").alias("width"),
        ).select(F.lit(name).alias("t"), "rows_", "width")
        sides = s if sides is None else sides.unionByName(s)
    sides = sides.localCheckpoint(eager=True)  # 5 rows; joined twice

    def jcount(name, lt, lk, rt, rk):
        l = table(spark, sf_dir, lt)
        r = table(spark, sf_dir, rt)
        return (
            l.join(r, l[lk] == r[rk])
            .agg(F.count("*").alias("actual_rows"))
            .select(
                F.lit(name).alias("join_name"),
                F.lit(lt).alias("lt"),
                F.lit(rt).alias("rt"),
                "actual_rows",
            )
        )

    actual = (
        jcount("customer x orders", "customer", "c_custkey", "orders", "o_custkey")
        .unionByName(
            jcount("part x lineitem", "part", "p_partkey", "lineitem", "l_partkey")
        )
        .unionByName(
            jcount(
                "supplier x lineitem", "supplier", "s_suppkey", "lineitem", "l_suppkey"
            )
        )
        .unionByName(
            jcount("orders x lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey")
        )
    )
    ls = sides.select(
        F.col("t").alias("lt"),
        F.col("rows_").alias("left_rows"),
        (F.col("rows_") * F.col("width")).alias("est_left_bytes"),
    )
    rs = sides.select(
        F.col("t").alias("rt"),
        F.col("rows_").alias("right_rows"),
        (F.col("rows_") * F.col("width")).alias("est_right_bytes"),
    )
    return (
        actual.join(F.broadcast(ls), "lt")
        .join(F.broadcast(rs), "rt")
        .select(
            "join_name",
            "left_rows",
            "right_rows",
            "est_left_bytes",
            "est_right_bytes",
            F.when(
                F.least(F.col("est_left_bytes"), F.col("est_right_bytes"))
                > _BCAST_THRESHOLD,
                "shuffle",
            )
            .when(
                F.col("est_left_bytes") <= F.col("est_right_bytes"),
                "broadcast_left",
            )
            .otherwise("broadcast_right")
            .alias("decision"),
            "actual_rows",
        )
        .orderBy("join_name")
    )


# --- q299: shuffle/scan partition-sizing advisor -----------------------------

_PART_TARGET = 128 * 1024 * 1024  # post-shuffle partition target: 128 MiB
_SCAN_SLOTS = 64  # want >= 2x the 32-core session in scan parallelism
_MPB_LADDER = [16, 32, 64, 128, 256, 512, 1024]  # MiB steps for mpb
_MIN_PARTS = 32  # never recommend fewer shuffle partitions than cores


def _mpb_case_sql(x: str) -> str:
    steps = " ".join(
        f"WHEN {x} <= {m * 1024 * 1024} THEN {m * 1024 * 1024}"
        for m in _MPB_LADDER[:-1]
    )
    return f"CASE {steps} ELSE {_MPB_LADDER[-1] * 1024 * 1024} END"


@query(
    "q299_partition_sizing_advisor",
    oracle=f"""
    WITH sides AS (
        SELECT 'documents' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(8 * 2 + CEIL(AVG(len(text) + len(lang) + len(source)))
                    AS BIGINT) AS row_bytes
        FROM documents
        UNION ALL
        SELECT 'events', CAST(COUNT(*) AS BIGINT),
               CAST(8 * 4 + CEIL(AVG(len(event_type) + len(props)))
                    AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
               CAST(8 * 9 + CEIL(AVG(len(l_returnflag) + len(l_linestatus)))
                    AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'orders', CAST(COUNT(*) AS BIGINT),
               CAST(8 * 4 + CEIL(AVG(len(o_orderstatus) + len(o_orderpriority)))
                    AS BIGINT)
        FROM orders
    ), est AS (
        SELECT tbl, n_rows, row_bytes,
               CAST(n_rows * row_bytes AS BIGINT) AS est_bytes
        FROM sides
    )
    SELECT tbl, n_rows, row_bytes, est_bytes,
           CAST(GREATEST({_MIN_PARTS},
                (est_bytes + {_PART_TARGET} - 1) // {_PART_TARGET})
                AS BIGINT) AS rec_shuffle_partitions,
           CAST(n_rows // GREATEST({_MIN_PARTS},
                (est_bytes + {_PART_TARGET} - 1) // {_PART_TARGET})
                AS BIGINT) AS rows_per_partition,
           CAST({_mpb_case_sql(f"(est_bytes + {_SCAN_SLOTS} - 1) // {_SCAN_SLOTS}")}
                AS BIGINT) AS rec_max_partition_bytes
    FROM est
    ORDER BY tbl
    """,
    tags=("relational", "optimizer-stats", "partitioning", "advisor", "cbo"),
    checkpointed_substrate=True,
)
def q299_partition_sizing_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION-SIZING advisor — the fourth physical-design knob after
    zone maps (q277), encodings (q285) and broadcast decisions (q291),
    and the one this repo's own tuning doctrine calls load-bearing:
    size `spark.sql.shuffle.partitions` and
    `spark.sql.files.maxPartitionBytes` so partitions fit executor
    memory at the target SF. Per big table, the planner-style size
    estimate (rows × [8 B/numeric + measured avg string width], q291's
    convention) yields (a) recommended shuffle partitions =
    max(cores, ⌈est/128 MiB⌉) — the spill-avoidance floor — and (b) a
    maxPartitionBytes pick: est/{_SCAN_SLOTS} rounded UP onto the
    16 MiB–1 GiB power-of-two ladder via pure INTEGER comparisons (the
    q285 lesson: never a runtime float log near the hash). One stats
    aggregate per table, bounded 4-row assembly; ceil-division is
    (a+b−1) intdiv b on non-negative BIGINTs, identical both engines.
    The AVG width is a SINGLE division of exact BIGINTs — both engines
    produce the identical IEEE double, so its CEIL cannot diverge
    (unlike a libm log)."""
    specs = {
        "documents": (
            "documents",
            2,
            F.length("text") + F.length("lang") + F.length("source"),
        ),
        "events": ("events", 4, F.length("event_type") + F.length("props")),
        "lineitem": (
            "lineitem",
            9,
            F.length("l_returnflag") + F.length("l_linestatus"),
        ),
        "orders": (
            "orders",
            4,
            F.length("o_orderstatus") + F.length("o_orderpriority"),
        ),
    }
    sides = None
    for name, (tbl, n_num, strw) in specs.items():
        s = (
            table(spark, sf_dir, tbl)
            .agg(
                F.count("*").alias("n_rows"),
                (F.lit(8 * n_num) + F.ceil(F.avg(strw))).cast("long").alias("row_bytes"),
            )
            .select(F.lit(name).alias("tbl"), "n_rows", "row_bytes")
        )
        sides = s if sides is None else sides.unionByName(s)
    est_bytes = (F.col("n_rows") * F.col("row_bytes")).alias("est_bytes")
    est = sides.select("tbl", "n_rows", "row_bytes", est_bytes).localCheckpoint(
        eager=True  # 4 rows; every derived column reads it
    )
    rec_parts = F.greatest(
        F.lit(_MIN_PARTS).cast("long"),
        int_div(F.col("est_bytes") + F.lit(_PART_TARGET - 1), F.lit(_PART_TARGET)),
    )
    scan_chunk = int_div(
        F.col("est_bytes") + F.lit(_SCAN_SLOTS - 1), F.lit(_SCAN_SLOTS)
    )
    mpb = F.lit(_MPB_LADDER[-1] * 1024 * 1024).cast("long")
    for m in reversed(_MPB_LADDER[:-1]):
        mpb = F.when(
            scan_chunk <= m * 1024 * 1024, F.lit(m * 1024 * 1024).cast("long")
        ).otherwise(mpb)
    return est.select(
        "tbl",
        "n_rows",
        "row_bytes",
        "est_bytes",
        rec_parts.cast("long").alias("rec_shuffle_partitions"),
        int_div(F.col("n_rows"), rec_parts).cast("long").alias("rows_per_partition"),
        mpb.alias("rec_max_partition_bytes"),
    ).orderBy("tbl")


# --- q304: customer spend decile mobility matrix ------------------------------

# P1: year <= split, P2: year > split.  The synthetic orders table spans
# 1995-01-01..2001-08-01 with a flat per-year customer count (median order
# year = 1998 at sf0.001/0.01/0.1, measured by DuckDB probe), so 1997
# splits every SF into two non-empty, roughly balanced halves.  The first
# shipped value (1994) predated the data entirely — both engines emitted
# ZERO rows at every SF and the hash gate stayed green (the r13 verdict's
# "semantically dead" finding); tests/test_nonzero_rows.py now guards the
# whole catalog against that failure mode.
_MOBILITY_SPLIT_YEAR = 1997
_MOBILITY_BUCKET_CENTS = 1_000_000  # two-level rank value-bucket width


@query(
    "q304_decile_mobility_matrix",
    oracle=f"""
    WITH s1 AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS spend
        FROM orders WHERE year(o_orderdate) <= {_MOBILITY_SPLIT_YEAR}
        GROUP BY 1
    ), d1 AS (
        SELECT o_custkey,
               CAST(ntile(10) OVER (ORDER BY spend, o_custkey) AS BIGINT) AS d
        FROM s1
    ), s2 AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS spend
        FROM orders WHERE year(o_orderdate) > {_MOBILITY_SPLIT_YEAR}
        GROUP BY 1
    ), d2 AS (
        SELECT o_custkey,
               CAST(ntile(10) OVER (ORDER BY spend, o_custkey) AS BIGINT) AS d
        FROM s2
    ), m AS (
        SELECT d1.d AS decile_from, d2.d AS decile_to,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM d1 JOIN d2 USING (o_custkey)
        GROUP BY 1, 2
    ), rt AS (
        SELECT decile_from, CAST(SUM(n_customers) AS BIGINT) AS row_total
        FROM m GROUP BY 1
    )
    SELECT m.decile_from, m.decile_to, m.n_customers,
           CAST(m.n_customers AS DOUBLE) / CAST(rt.row_total AS DOUBLE)
               AS row_share
    FROM m JOIN rt USING (decile_from)
    ORDER BY decile_from, decile_to
    """,
    tags=("relational", "analytics", "mobility", "ranking", "two-level-rank"),
    checkpointed_substrate=True,
)
def q304_decile_mobility_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend DECILE MOBILITY matrix — the rank-migration
    analysis (econ mobility matrices, RFM segment migration) built on
    corpus-scale EXACT ntile in both periods: customers are ranked by
    total spend within each half of the history (<= {_MOBILITY_SPLIT_YEAR}
    vs after), assigned exact ntile(10) deciles, and the (from, to)
    transition counts over customers active in BOTH halves form the
    10x10 matrix with per-row shares — the "do high spenders stay on
    top" table.

    The oracle uses ``ntile(10) OVER (ORDER BY spend, custkey)`` — a
    single-partition global sort that would never survive 100 TB. The
    Spark side reproduces the IDENTICAL assignment per period with the
    q94/q125 two-level rank: spends bucket by value
    (spend_cents intdiv {_MOBILITY_BUCKET_CENTS} — monotone in the sort
    key, so bucket b precedes b+1 entirely), a per-bucket row_number
    window runs one task per bucket, the bounded per-bucket counts get
    an exclusive prefix sum and broadcast back as rank bases, and
    ntile's remainder arithmetic (first N%10 buckets get one extra row)
    is applied to the global rank in closed form. Spends are exact
    integer cents (the money rule); the customer-keyed join of the two
    decile frames is the plan's one corpus-scale shuffle."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")

    def deciles(period_cond, tag: str) -> DataFrame:
        s = (
            o.where(period_cond)
            .groupBy("o_custkey")
            .agg(F.sum(to_cents("o_totalprice")).cast("long").alias("spend"))
            .withColumn(
                "_bucket", F.expr(f"spend DIV {_MOBILITY_BUCKET_CENTS}")
            )
            .localCheckpoint(eager=True)  # rank levels + totals share it
        )
        w_local = Window.partitionBy("_bucket").orderBy("spend", "o_custkey")
        w_buckets = Window.orderBy("_bucket").rowsBetween(
            Window.unboundedPreceding, -1
        )
        bucket_base = (
            s.groupBy("_bucket")
            .agg(F.count("*").alias("_cnt"))
            .withColumn(
                "_base",
                F.coalesce(F.sum("_cnt").over(w_buckets), F.lit(0).cast("long")),
            )
            .select("_bucket", "_base")
        )
        totals = s.agg(F.count("*").alias("n_total"))
        ranked = (
            s.withColumn("rn", F.row_number().over(w_local))
            .join(F.broadcast(bucket_base), "_bucket")
            .crossJoin(F.broadcast(totals))
            .withColumn("rank0", F.col("_base") + F.col("rn") - 1)
            .withColumn("qq", F.expr("n_total DIV 10"))
            .withColumn("rr", F.expr("n_total % 10"))
        )
        dec = F.when(
            F.col("rank0") < (F.col("qq") + 1) * F.col("rr"),
            F.expr("rank0 DIV (qq + 1) + 1"),
        ).otherwise(F.expr("rr + (rank0 - (qq + 1) * rr) DIV qq + 1"))
        return ranked.select("o_custkey", dec.cast("long").alias(tag))

    yr = F.year("o_orderdate")
    d1 = deciles(yr <= _MOBILITY_SPLIT_YEAR, "decile_from")
    d2 = deciles(yr > _MOBILITY_SPLIT_YEAR, "decile_to")
    # both decile frames are CUSTOMER-scale — unbounded at 100 TB — so the
    # period join is pinned shuffle-merge (Catalyst's static stats pick
    # broadcast at test scale; the invariant bans that for growing frames)
    m = (
        d1.hint("shuffle_merge")
        .join(d2, "o_custkey")
        .groupBy("decile_from", "decile_to")
        .agg(F.count("*").alias("n_customers"))
    )
    w_row = Window.partitionBy("decile_from")
    return (
        m.withColumn("row_total", F.sum("n_customers").over(w_row))
        .select(
            "decile_from",
            "decile_to",
            "n_customers",
            (
                F.col("n_customers").cast("double")
                / F.col("row_total").cast("double")
            ).alias("row_share"),
        )
        .orderBy("decile_from", "decile_to")
    )
