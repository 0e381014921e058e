"""Relational operator surface (SURVEY.md §2B rows E1–E11, plus pivot,
quantiles and deterministic sampling).

Every query is declarative DataFrame API — Catalyst handles predicate
pushdown, column pruning, partial aggregation, and join-strategy selection
(we add explicit ``broadcast`` hints for dimension tables so the plan is
shuffle-free on the fact side even before AQE kicks in; at 100 TB the fact
table never shuffles for these star joins).

Cross-engine determinism: see functions/exact.py (integer-cents sums) and
plans/registry.py (alias + ORDER BY contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_migrator_spark.functions.exact import cents_sum, sql_cents_sum, to_cents
from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import table


def _cents(expr: str) -> str:
    return sql_cents_sum(expr)


# ---------------------------------------------------------------------------
# E1 — scan + projection + filter (pushed down to the parquet reader)
# ---------------------------------------------------------------------------
@query(
    "q01_scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-06-01'
      AND l_discount BETWEEN 0.05 AND 0.07
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scan", "filter", "E1"),
)
def q01_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with predicate pushdown: .explain shows PushedFilters
    [GreaterThanOrEqual(l_shipdate), GreaterThanOrEqual/LessThanOrEqual
    (l_discount)] and a 3-column ReadSchema."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# E2 — hash aggregate (TPC-H Q1 shape); partial+final agg is automatic
# ---------------------------------------------------------------------------
@query(
    "q02_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity)                                   AS sum_qty,
           {_cents('l_extendedprice')}                       AS sum_base_price,
           {_cents('l_extendedprice * (1 - l_discount)')}    AS sum_disc_price,
           {_cents('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           AVG(l_quantity)                                   AS avg_qty,
           AVG(l_discount)                                   AS avg_disc,
           COUNT(*)                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("aggregate", "E2", "tpch-q1"),
)
def q02_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: 2-key hash aggregate with 7 aggregates. l_quantity is
    integral so its double SUM is exact; money sums use integer cents."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            cents_sum("l_extendedprice", "sum_base_price"),
            cents_sum(disc_price, "sum_disc_price"),
            cents_sum(charge, "sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# E3 — equi inner join, dimension broadcast
# ---------------------------------------------------------------------------
@query(
    "q03_join_customer_nation",
    oracle=f"""
    SELECT n_name,
           COUNT(*)              AS n_customers,
           {_cents('c_acctbal')} AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("join", "E3"),
)
def q03_join_customer_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join (25-row dim): no shuffle of the customer side
    until the final 1-key aggregate."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"), cents_sum("c_acctbal", "total_acctbal"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# E4 — multi-way star join + aggregate
# ---------------------------------------------------------------------------
@query(
    "q04_star_join_revenue",
    oracle=f"""
    SELECT r_name,
           {_cents('o_totalprice')} AS total_revenue,
           COUNT(*)                 AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
    tags=("join", "star", "E4"),
)
def q04_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact (orders) joins three broadcast dims — at 100 TB the
    fact table streams through three BroadcastHashJoins with zero shuffle,
    then one 5-group aggregate."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(cents_sum("o_totalprice", "total_revenue"), F.count("*").alias("n_orders"))
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# E5 — anti / semi joins
# ---------------------------------------------------------------------------
@query(
    "q05_anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    tags=("join", "anti", "E5"),
)
def q05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — the same algebra as the reference's pending-set
    computation (dirs − applied ledger, Core.pm:221-231)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "q06_semi_join_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    tags=("join", "semi", "E5"),
)
def q06_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# E6 — window functions: ranking, lag, running frame
# ---------------------------------------------------------------------------
@query(
    "q07_window_top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, rn, prev_price, running_spend
    FROM (
      SELECT o_custkey, o_orderkey,
             CAST(row_number() OVER w AS BIGINT) AS rn,
             lag(o_totalprice) OVER w            AS prev_price,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
                                                 AS running_spend
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    tags=("window", "E6"),
)
def q07_window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3-per-group via row_number, lag, and a running cents-exact SUM
    over an explicit ROWS frame — one shuffle on o_custkey serves all three
    window functions (same partitioning + ordering)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).cast("long").alias("rn"),
            F.lag("o_totalprice").over(w).alias("prev_price"),
            (F.sum(to_cents("o_totalprice")).over(run) / 100.0).alias("running_spend"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


# ---------------------------------------------------------------------------
# E7 — global sort / top-k
# ---------------------------------------------------------------------------
@query(
    "q08_topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "limit", "E7"),
)
def q08_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heap
    + driver merge of k rows, NOT a full sort; scales to any input size.
    Unique tiebreaker (o_orderkey) makes the cut deterministic."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# E8 — set operations
# ---------------------------------------------------------------------------
@query(
    "q09_intersect_nations",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    INTERSECT
    SELECT CAST(s_nationkey AS BIGINT) FROM supplier
    ORDER BY nationkey
    """,
    tags=("setop", "E8"),
)
def q09_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    )
    return c.intersect(s).orderBy("nationkey")


@query(
    "q10_except_nations",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    EXCEPT
    SELECT CAST(s_nationkey AS BIGINT) FROM supplier
    ORDER BY nationkey
    """,
    tags=("setop", "E8"),
)
def q10_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    )
    return c.subtract(s).orderBy("nationkey")  # EXCEPT DISTINCT semantics


# ---------------------------------------------------------------------------
# E9 — rollup / cube
# ---------------------------------------------------------------------------
@query(
    "q64_exceptall_bag_semantics",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    EXCEPT ALL
    SELECT CAST(s_nationkey AS BIGINT) FROM supplier
    ORDER BY nationkey
    """,
    tags=("setop", "bag", "E8"),
)
def q64_exceptall_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference — multiplicities subtract) vs q10's set
    EXCEPT; both engines implement the SQL:2003 bag semantics."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    )
    return c.exceptAll(s).orderBy("nationkey")


@query(
    "q65_window_navigation",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER w AS latest_price,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           CAST(ntile(4) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "navigation", "E6"),
)
def q65_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window navigation: first/last/nth value over an explicit running
    frame plus ntile bucketing — one shuffle serves all four."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w).alias("latest_price"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
            F.ntile(4).over(wo).cast("long").alias("quartile"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "q11_rollup_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT)   AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           COUNT(*)                                  AS n_orders,
           {_cents('o_totalprice')}                  AS total_price
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
    """,
    tags=("rollup", "E9"),
)
def q11_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count("*").alias("n_orders"),
            cents_sum("o_totalprice", "total_price"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n_orders", "total_price"
        )
        .orderBy("g_status", "g_priority", "o_orderstatus", "o_orderpriority")
    )


@query(
    "q12_cube_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*)        AS n_items,
           SUM(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("cube", "E9"),
)
def q12_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_items"), F.sum("l_quantity").alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


# ---------------------------------------------------------------------------
# E10 — exact & approximate distinct
# ---------------------------------------------------------------------------
@query(
    "q13_count_distinct",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey)     AS n_custs,
           COUNT(DISTINCT o_orderstatus) AS n_statuses,
           COUNT(DISTINCT o_orderdate)   AS n_dates
    FROM orders
    """,
    tags=("distinct", "E10"),
)
def q13_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.countDistinct("o_orderdate").alias("n_dates"),
    )


@query(
    "q14_approx_count_distinct",
    oracle=None,  # approximate by design — rows-only check (SURVEY §2B E10)
    tags=("distinct", "approx", "E10"),
)
def q14_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct — the 100 TB path (no shuffle of distinct
    values, fixed-size sketch per partition)."""
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx_custs"),
        F.count("*").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# E11 — scalar string / date / math functions (all codegen'd built-ins)
# ---------------------------------------------------------------------------
@query(
    "q62_approx_quantiles",
    oracle=None,  # t-digest sketch is approximate by design (E10 family);
    # rows-only check — exact twin is q18_quantiles
    tags=("quantile", "approx", "E10"),
)
def q62_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the sketch-based quantile path for 100 TB
    (fixed-size state per partition, no global sort); accuracy knob is the
    third argument (max relative error 1/acc)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000).alias("approx_pcts"),
            F.count("*").alias("n"),
        )
        .select(
            "o_orderstatus",
            F.element_at("approx_pcts", 1).alias("p50"),
            F.element_at("approx_pcts", 2).alias("p90"),
            F.element_at("approx_pcts", 3).alias("p99"),
            "n",
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q63_posexplode_components",
    oracle="""
    SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos, CAST(embedding[i] AS DOUBLE) AS component
    FROM embeddings, generate_series(1, 8) s(i)
    WHERE vec_id < 20
    ORDER BY vec_id, pos
    """,
    tags=("array", "explode", "E13"),
)
def q63_posexplode_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (lateral array flatten with ordinal) — the wide→long
    array primitive; oracle is the generate_series lateral join."""
    e = table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 20)
    return (
        e.select("vec_id", F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "comp"))
        .select(
            "vec_id",
            F.col("pos").cast("long").alias("pos"),
            F.col("comp").cast("double").alias("component"),
        )
        .orderBy("vec_id", "pos")
    )


@query(
    "q15_scalar_functions",
    oracle="""
    SELECT o_orderkey,
           UPPER(SUBSTR(o_orderpriority, 1, 1))            AS prio_initial,
           LOWER(o_orderstatus)                            AS status_lc,
           CONCAT(o_orderstatus, '-', o_orderpriority)     AS status_prio,
           CAST(LENGTH(o_orderpriority) AS BIGINT)         AS prio_len,
           CAST(YEAR(o_orderdate) AS BIGINT)               AS o_year,
           CAST(MONTH(o_orderdate) AS BIGINT)              AS o_month,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
                                                           AS days_since_1995,
           CAST(FLOOR(o_totalprice) AS BIGINT)             AS price_floor,
           CAST(ABS(o_custkey - 100) AS BIGINT)            AS key_dist,
           SQRT(o_totalprice)                              AS price_sqrt
    FROM orders
    ORDER BY o_orderkey
    LIMIT 100
    """,
    tags=("scalar", "E11"),
)
def q15_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalars. Deliberately uses only functions with
    IEEE-exact or integer results (floor, sqrt, datediff) — no libm pow/exp
    whose low bits differ across engines."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.upper(F.substring("o_orderpriority", 1, 1)).alias("prio_initial"),
            F.lower("o_orderstatus").alias("status_lc"),
            F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
            F.length("o_orderpriority").cast("long").alias("prio_len"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.month("o_orderdate").cast("long").alias("o_month"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "order_month"
            ),
            F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
            .cast("long")
            .alias("days_since_1995"),
            F.floor("o_totalprice").cast("long").alias("price_floor"),
            F.abs(F.col("o_custkey") - 100).cast("long").alias("key_dist"),
            F.sqrt("o_totalprice").alias("price_sqrt"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# CASE / conditional aggregation + pivot
# ---------------------------------------------------------------------------
@query(
    "q16_conditional_agg",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
           {_cents('CASE WHEN c_acctbal > 0 THEN c_acctbal ELSE 0 END')}  AS positive_balance
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("case", "aggregate"),
)
def q16_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_negative"),
            cents_sum(
                F.when(F.col("c_acctbal") > 0, F.col("c_acctbal")).otherwise(F.lit(0.0)),
                "positive_balance",
            ),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q17_pivot_event_counts",
    oracle="""
    SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events
    GROUP BY 1
    ORDER BY user_bucket
    """,
    tags=("pivot",),
)
def q17_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list — the scalable form (no extra pass
    to discover pivot values, map-side partial aggregation applies)."""
    e = table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    piv = (
        e.withColumn("user_bucket", (F.col("user_id") % 10).cast("long"))
        .groupBy("user_bucket")
        .pivot("event_type", kinds)
        .count()
    )
    return piv.select(
        "user_bucket", *[F.coalesce(F.col(k), F.lit(0)).cast("long").alias(k) for k in kinds]
    ).orderBy("user_bucket")


# ---------------------------------------------------------------------------
# Exact quantiles
# ---------------------------------------------------------------------------
@query(
    "q18_quantiles",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price,
           MIN(o_totalprice)                AS min_price,
           MAX(o_totalprice)                AS max_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("quantile",),
)
def q18_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines use the same
    linear-interpolation definition). The 100 TB path is
    approx_percentile (t-digest sketch) — see q14 pattern."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("median_price"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Deterministic hash sampling (reproducible across engines, runs, scales)
# ---------------------------------------------------------------------------
@query(
    "q19_deterministic_sample",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 1) = '0'
    ORDER BY event_id
    """,
    tags=("sample",),
)
def q19_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~1/16 Bernoulli sample keyed on md5(event_id) — unlike rand(), this
    is reproducible across engines, retries, and AQE re-plans; the standard
    trick for auditable training-data subsampling at 100 TB."""
    e = table(spark, sf_dir, "events")
    digest = F.md5(F.encode(F.col("event_id").cast("string"), "UTF-8"))
    return (
        e.where(F.substring(digest, 1, 1) == "0")
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


@query(
    "q57_stratified_sample",
    oracle="""
    SELECT event_id, event_type
    FROM events
    WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) <
          CASE event_type WHEN 'error' THEN 'ff' WHEN 'purchase' THEN '80' ELSE '10' END
    ORDER BY event_id
    """,
    tags=("sample", "stratified"),
)
def q57_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates (keep ~all errors, ~50%
    purchases, ~6% of the rest) — the deterministic, engine-portable
    `sampleBy`: rates rebalance class distributions for training data and
    reproduce exactly on retry or backfill."""
    e = table(spark, sf_dir, "events")
    digest2 = F.substring(
        F.md5(F.encode(F.col("event_id").cast("string"), "UTF-8")), 1, 2
    )
    cutoff = (
        F.when(F.col("event_type") == "error", F.lit("ff"))
        .when(F.col("event_type") == "purchase", F.lit("80"))
        .otherwise(F.lit("10"))
    )
    return (
        e.where(digest2 < cutoff)
        .select("event_id", "event_type")
        .orderBy("event_id")
    )
