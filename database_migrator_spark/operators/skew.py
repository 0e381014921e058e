"""Skew-handling join: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the explicit
fallback when one *key* (not partition) is pathologically hot — e.g. a
null-ish default user owning 1% of a 100 TB fact table: the hot side gets
a random salt in [0, n), the small side is replicated n× with every salt,
and the join key becomes (key, salt), spreading the hot key over n tasks.

The salt must be *deterministic per row* (hash-based, not rand()) so
retries and speculative tasks agree — the same reproducibility rule as
q19's deterministic sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_migrator_spark.functions.exact import exactness_guard, to_cents
from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import table


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    salt_by: str | None = None,
) -> DataFrame:
    """Join ``big`` (skewed on ``key``) with ``small`` by salting.

    ``salt_by`` names a column whose hash spreads the hot key's rows
    (defaults to all of big's columns via xxhash64) — deterministic, so
    task retries produce identical partitioning.

    Only inner/left joins are salting-correct: under right/full outer,
    each of the n_salts small-side replicas that finds no match survives
    as its own null-extended row.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    salt_src = F.col(salt_by) if salt_by else F.struct(*[F.col(c) for c in big.columns])
    salted_big = big.withColumn("__salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts)))
    exploded_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return salted_big.join(exploded_small, [key, "__salt"], how).drop("__salt")


@query(
    "q70_salted_skew_join",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*)                                        AS n_events,
           SUM(CAST(ROUND(e.value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY segment
    """,
    tags=("skew", "salted-join", "join"),
)
def q70_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact→dim join hash-matched against the plain join: events
    concentrate 10k rows on 150 user keys (hot keys by construction), so
    the hot side is salted 16 ways and the dim replicated per salt —
    spreading each hot key over 16 tasks. Salting is exact (same rows,
    same aggregates), which is why the oracle is simply the unsalted
    join + GROUP BY."""
    e = table(spark, sf_dir, "events").select("user_id", "value", "event_id")
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    j = salted_join(e, c, key="user_id", n_salts=16, salt_by="event_id")
    return (
        j.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(to_cents("value")) / 100.0).alias(
                "total_value"
            ),
        )
        .orderBy("segment")
    )


@query(
    "q154_join_key_skew_report",
    oracle="""
    WITH per_key AS (
        SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
    ), bounds AS (
        SELECT quantile_disc(n, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
        FROM per_key
    ), bucketed AS (
        SELECT n,
               len(list_filter(qs, q -> n > q)) AS bucket
        FROM per_key, bounds
    )
    SELECT CAST(bucket AS BIGINT)  AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MIN(n) AS BIGINT)  AS min_rows,
           CAST(MAX(n) AS BIGINT)  AS max_rows,
           CAST(SUM(n) AS BIGINT)  AS sum_rows
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("skew", "diagnostics", "percentile", "join"),
)
def q154_join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key SKEW report — the diagnostic read before choosing a
    salting factor (q70) or trusting AQE's skew-join split: per-key row
    counts of the orders⋈customer key, bucketed by the key-count decile
    boundaries. Deliberately WINDOW-FREE: a corpus-wide ntile would need
    a single-partition sort (the q125 trap); instead the 9 decile
    boundaries come from one percentile_disc aggregate (a single row,
    broadcast back), and each key buckets by counting boundaries
    strictly below its count — two shuffles total, both key-partitioned,
    at any scale. Exact because every quantity is an integer
    (percentile_disc picks actual values, never interpolates)."""
    o = table(spark, sf_dir, "orders")
    per_key = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    bounds = per_key.agg(
        F.percentile_approx("n", [i / 10 for i in range(1, 10)], 2147483647).alias("qs")
    )
    bucketed = per_key.crossJoin(F.broadcast(bounds)).select(
        "n", F.size(F.filter("qs", lambda q: F.col("n") > q)).alias("bucket")
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").alias("n_keys"),
            F.min("n").alias("min_rows"),
            F.max("n").alias("max_rows"),
            F.sum("n").alias("sum_rows"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_keys",
            "min_rows",
            "max_rows",
            "sum_rows",
        )
        .orderBy("bucket")
    )


@query(
    "q164_chi_square_drift",
    oracle="""
    WITH cells AS (
        SELECT event_type,
               (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7
                   AS dow,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM events
        GROUP BY 1, 2
    ), tot AS (
        SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells
    ), rows_t AS (
        SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1
    ), cols_t AS (
        SELECT dow, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1
    )
    SELECT cells.event_type, cells.dow, cells.o,
           CAST((rows_t.r * cols_t.c * 1000000) // tot.n AS BIGINT)
               AS expected_micro,
           CAST(ROUND(
               CAST(cells.o * tot.n - rows_t.r * cols_t.c AS DOUBLE)
               * CAST(cells.o * tot.n - rows_t.r * cols_t.c AS DOUBLE)
               / CAST(tot.n * rows_t.r * cols_t.c AS DOUBLE)
               * 1000000000) AS BIGINT) / 1000000000.0 AS chi2_contrib
    FROM cells
    JOIN rows_t USING (event_type)
    JOIN cols_t USING (dow)
    CROSS JOIN tot
    ORDER BY event_type, dow
    """,
    tags=("diagnostics", "chi-square", "drift", "statistics", "bounded-artifact"),
    checkpointed_substrate=True,
)
def q164_chi_square_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test on the event_type × weekday
    contingency table — the drift/anomaly diagnostic a pipeline runs to
    ask "did the event mix change by day of week?". Per cell: observed
    count, expected count (micro-units, exact integer r·c·10⁶ DIV n),
    and the chi² contribution (o·n − r·c)²/(n·r·c) — the deviation is
    computed EXACTLY in BIGINT (|o·n − r·c| < n² ≈ 2^53 up to ~10⁸ rows;
    beyond that ANSI mode fails loudly and the test should run on rates),
    then squared/divided in double with identical operand order on both
    engines and 1e-9 fixed-point rounding. Weekday is epoch-day
    arithmetic ((days+4) mod 7), immune to engine locale/week-start
    conventions. All margin tables are bounded (5 types × 7 days) —
    broadcast by construction; one corpus shuffle total."""
    e = table(spark, sf_dir, "events")
    dow = (
        (F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")) + 4) % 7
    ).cast("long")
    # cells is BOUNDED (5 types x 7 days) but read by four consumers
    # (itself + three margins) — checkpoint it so the corpus is scanned
    # once, not four times (the q171 re-derivation lesson)
    cells = (
        e.groupBy("event_type", dow.alias("dow"))
        .agg(F.count("*").alias("o"))
        .localCheckpoint(eager=True)
    )
    tot = cells.agg(F.sum("o").alias("n"))
    rows_t = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols_t = cells.groupBy("dow").agg(F.sum("o").alias("c"))
    j = (
        cells.join(F.broadcast(rows_t), "event_type")
        .join(F.broadcast(cols_t), "dow")
        .crossJoin(F.broadcast(tot))
    )
    dev = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    chi = dev * dev / (F.col("n") * F.col("r") * F.col("c")).cast("double")
    return j.select(
        "event_type",
        "dow",
        "o",
        F.expr("(r * c * 1000000L) DIV n").alias("expected_micro"),
        (F.round(chi * F.lit(1e9)).cast("long") / F.lit(1e9)).alias("chi2_contrib"),
    ).orderBy("event_type", "dow")


@query(
    "q168_rfm_segmentation",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               date_diff('day', CAST(MAX(ts) AS DATE), DATE '2024-02-01')
                   AS recency_d,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS monetary_c
        FROM events
        GROUP BY user_id
    ), bounds AS (
        SELECT quantile_disc(recency_d,  [0.25, 0.5, 0.75]) AS rq,
               quantile_disc(frequency,  [0.25, 0.5, 0.75]) AS fq,
               quantile_disc(monetary_c, [0.25, 0.5, 0.75]) AS mq
        FROM per_user
    ), scored AS (
        SELECT u.user_id,
               len(list_filter(b.rq, q -> u.recency_d  > q)) AS r_bucket,
               len(list_filter(b.fq, q -> u.frequency  > q)) AS f_bucket,
               len(list_filter(b.mq, q -> u.monetary_c > q)) AS m_bucket
        FROM per_user u CROSS JOIN bounds b
    )
    SELECT CAST(r_bucket AS BIGINT) AS r_bucket,
           CAST(f_bucket AS BIGINT) AS f_bucket,
           CAST(m_bucket AS BIGINT) AS m_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY r_bucket, f_bucket, m_bucket
    """,
    tags=("analytics", "rfm", "segmentation", "quartiles", "window-free"),
)
def q168_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-analytics cube: per user,
    recency (days from last event to the 2024-02-01 reference date),
    frequency (event count) and monetary value (exact cents) are each
    bucketed by their own QUARTILE boundaries, and the 4×4×4 segment
    grid reports its population. Window-free like q154: the boundaries
    are one exact percentile_disc aggregate (a single row broadcast
    back; percentile_disc picks actual values, never interpolates — all
    integers), and each user buckets by counting boundaries strictly
    below its value. Two key-partitioned shuffles at any scale."""
    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.datediff(
            F.lit("2024-02-01").cast("date"), F.max("ts").cast("date")
        ).cast("long").alias("recency_d"),
        F.count("*").alias("frequency"),
        F.sum(to_cents("value")).alias("monetary_c"),
    )
    big = 2147483647  # exact percentile_approx accuracy = percentile_disc
    bounds = per_user.agg(
        F.percentile_approx("recency_d", [0.25, 0.5, 0.75], big).alias("rq"),
        F.percentile_approx("frequency", [0.25, 0.5, 0.75], big).alias("fq"),
        F.percentile_approx("monetary_c", [0.25, 0.5, 0.75], big).alias("mq"),
    )
    scored = per_user.crossJoin(F.broadcast(bounds)).select(
        F.size(F.filter("rq", lambda q: F.col("recency_d") > q)).cast("long").alias("r_bucket"),
        F.size(F.filter("fq", lambda q: F.col("frequency") > q)).cast("long").alias("f_bucket"),
        F.size(F.filter("mq", lambda q: F.col("monetary_c") > q)).cast("long").alias("m_bucket"),
    )
    return (
        scored.groupBy("r_bucket", "f_bucket", "m_bucket")
        .agg(F.count("*").alias("n_users"))
        .orderBy("r_bucket", "f_bucket", "m_bucket")
    )


@query(
    "q170_event_type_correlation",
    oracle="""
    WITH hours AS (
        SELECT DISTINCT date_trunc('hour', ts) AS h FROM events
    ), types AS (
        SELECT DISTINCT event_type FROM events
    ), counts AS (
        SELECT date_trunc('hour', ts) AS h, event_type,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), dense AS (
        SELECT hours.h, types.event_type, COALESCE(counts.c, 0) AS c
        FROM hours CROSS JOIN types
        LEFT JOIN counts ON counts.h = hours.h
                        AND counts.event_type = types.event_type
    ), pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT)      AS n_hours,
               CAST(SUM(a.c) AS BIGINT)      AS sx,
               CAST(SUM(b.c) AS BIGINT)      AS sy,
               CAST(SUM(a.c * b.c) AS BIGINT) AS sxy,
               CAST(SUM(a.c * a.c) AS BIGINT) AS sxx,
               CAST(SUM(b.c * b.c) AS BIGINT) AS syy
        FROM dense a JOIN dense b ON a.h = b.h AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_hours,
           CAST(ROUND(
               CAST(n_hours * sxy - sx * sy AS DOUBLE)
               / (sqrt(CAST(n_hours * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n_hours * syy - sy * sy AS DOUBLE)))
               * 1000000000) AS BIGINT) / 1000000000.0 AS corr
    FROM pairs
    WHERE n_hours * sxx > sx * sx AND n_hours * syy > sy * sy
    ORDER BY type_a, type_b
    """,
    tags=("analytics", "correlation", "pearson", "diagnostics", "dense-hourly"),
    checkpointed_substrate=True,
)
def q170_event_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of hourly event-type volumes — the
    "do errors spike with traffic?" diagnostic. The hourly count matrix
    is DENSIFIED first (hours × types grid with explicit zeros — a
    cross join of two BOUNDED derived tables, ~720 × 5 rows; skipping
    the zeros would silently bias every correlation), then each type
    pair folds exact BIGINT sums (Σx, Σy, Σxy, Σx², Σy²) and the
    correlation is one double expression over those identical integers
    with 1e-9 fixed-point rounding — engine-exact like q155/q164.
    Integer bounds: hourly counts up to ~3M keep n·Σx² under 2^63 for a
    month of hours; beyond that ANSI overflow fails loudly (rate-
    normalize or day-bucket first). Degenerate (zero-variance) types
    are excluded by the integer guard."""
    from database_migrator_spark.operators.temporal import dense_hourly_counts

    dense = dense_hourly_counts(spark, sf_dir)
    a = dense.select(F.col("h"), F.col("event_type").alias("type_a"), F.col("c").alias("ca"))
    b = dense.select(F.col("h"), F.col("event_type").alias("type_b"), F.col("c").alias("cb"))
    pairs = (
        a.join(F.broadcast(b), "h")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").alias("n_hours"),
            F.sum("ca").alias("sx"),
            F.sum("cb").alias("sy"),
            F.sum(F.col("ca") * F.col("cb")).alias("sxy"),
            F.sum(F.col("ca") * F.col("ca")).alias("sxx"),
            F.sum(F.col("cb") * F.col("cb")).alias("syy"),
        )
    )
    corr = (F.col("n_hours") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (
        F.sqrt((F.col("n_hours") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
        * F.sqrt((F.col("n_hours") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    )
    return (
        pairs.where(
            (F.col("n_hours") * F.col("sxx") > F.col("sx") * F.col("sx"))
            & (F.col("n_hours") * F.col("syy") > F.col("sy") * F.col("sy"))
        )
        .select(
            "type_a",
            "type_b",
            "n_hours",
            (F.round(corr * F.lit(1e9)).cast("long") / F.lit(1e9)).alias("corr"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "q173_psi_value_drift",
    oracle="""
    WITH halves AS (
        SELECT event_type,
               CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END AS half,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ), bounds AS (
        SELECT event_type,
               quantile_disc(cents, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
        FROM halves WHERE half = 0 GROUP BY event_type
    ), bucketed AS (
        SELECT h.event_type, h.half,
               len(list_filter(b.qs, q -> h.cents > q)) AS bucket
        FROM halves h JOIN bounds b USING (event_type)
    ), cells AS (
        SELECT event_type, bucket,
               CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cb,
               CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cc
        FROM bucketed GROUP BY 1, 2
    ), tots AS (
        SELECT event_type, CAST(SUM(cb) AS BIGINT) AS nb,
               CAST(SUM(cc) AS BIGINT) AS nc
        FROM cells GROUP BY 1
    ), terms AS (
        SELECT c.event_type,
               (CAST(c.cb + 1 AS DOUBLE) / (t.nb + 10)
                - CAST(c.cc + 1 AS DOUBLE) / (t.nc + 10))
               * ln(CAST((c.cb + 1) * (t.nc + 10) AS DOUBLE)
                    / CAST((t.nb + 10) * (c.cc + 1) AS DOUBLE)) AS term,
               t.nb, t.nc
        FROM cells c JOIN tots t USING (event_type)
    )
    SELECT event_type,
           MIN(nb) AS n_baseline, MIN(nc) AS n_current,
           CAST(SUM(CAST(round(term * 1000000000000) AS BIGINT)) AS DOUBLE)
             / CAST(1000000000000 AS DOUBLE) AS psi
    FROM terms
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("diagnostics", "psi", "drift", "statistics", "mixing"),
    checkpointed_substrate=True,
)
def q173_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the VALUE distribution between the
    month's first and second half, per event type — the model-monitoring
    drift score (the distribution-shaped sibling of q164's count-based
    chi-square). Buckets are the baseline half's exact integer-cents
    DECILES (percentile_disc, never interpolated); both halves'
    populations are Laplace-smoothed (+1 per bucket, +10 per total —
    identical on both engines, so empty current buckets stay defined)
    and PSI = Σ (p−q)·ln(p/q) follows q103's exactness recipe: every ln
    input is a ratio of exact BIGINTs, the subtraction has a fixed
    operand order, and per-term 1e-12 fixed-point rounding makes the
    sum order-independent. One corpus shuffle; boundaries broadcast."""
    e = table(spark, sf_dir, "events")
    halves = e.select(
        "event_type",
        F.when(F.dayofmonth("ts") <= 15, 0).otherwise(1).alias("half"),
        to_cents("value").alias("cents"),
    )
    big = 2147483647
    bounds = (
        halves.where(F.col("half") == 0)
        .groupBy("event_type")
        .agg(F.percentile_approx("cents", [i / 10 for i in range(1, 10)], big).alias("qs"))
    )
    bucketed = halves.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "half",
        F.size(F.filter("qs", lambda q: F.col("cents") > q)).alias("bucket"),
    )
    # bounded (10 buckets x 5 types); read by the totals AND the term
    # join — checkpoint so the corpus bucketing runs once (rescan audit)
    cells = (
        bucketed.groupBy("event_type", "bucket")
        .agg(
            F.sum((F.col("half") == 0).cast("long")).alias("cb"),
            F.sum((F.col("half") == 1).cast("long")).alias("cc"),
        )
        .localCheckpoint(eager=True)
    )
    tots = cells.groupBy("event_type").agg(
        F.sum("cb").alias("nb"), F.sum("cc").alias("nc")
    )
    j = cells.join(F.broadcast(tots), "event_type")
    p_minus_q = (F.col("cb") + 1).cast("double") / (F.col("nb") + 10) - (
        F.col("cc") + 1
    ).cast("double") / (F.col("nc") + 10)
    lr = F.log(
        ((F.col("cb") + 1) * (F.col("nc") + 10)).cast("double")
        / ((F.col("nb") + 10) * (F.col("cc") + 1)).cast("double")
    )
    return (
        j.withColumn("term", p_minus_q * lr)
        .groupBy("event_type")
        .agg(
            F.min("nb").alias("n_baseline"),
            F.min("nc").alias("n_current"),
            (
                F.sum(F.round(F.col("term") * F.lit(1e12)).cast("long")).cast("double")
                / F.lit(1e12)
            ).alias("psi"),
        )
        .orderBy("event_type")
    )


@query(
    "q174_ks_value_drift",
    oracle="""
    WITH halves AS (
        SELECT event_type,
               CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END AS half,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ), hist AS (
        SELECT event_type, cents,
               CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
               CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cc
        FROM halves GROUP BY 1, 2
    ), cum AS (
        SELECT event_type, cents,
               CAST(SUM(ca) OVER w AS BIGINT) AS cuma,
               CAST(SUM(cc) OVER w AS BIGINT) AS cumc
        FROM hist
        WINDOW w AS (PARTITION BY event_type ORDER BY cents
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), tots AS (
        SELECT event_type, CAST(SUM(ca) AS BIGINT) AS na,
               CAST(SUM(cc) AS BIGINT) AS nc
        FROM hist GROUP BY 1
    )
    SELECT c.event_type, t.na AS n_baseline, t.nc AS n_current,
           CAST(MAX(abs(c.cuma * t.nc - c.cumc * t.na)) AS BIGINT) AS ks_num,
           CAST(MAX(abs(c.cuma * t.nc - c.cumc * t.na)) AS DOUBLE)
               / CAST(t.na * t.nc AS DOUBLE) AS ks
    FROM cum c JOIN tots t USING (event_type)
    GROUP BY c.event_type, t.na, t.nc
    ORDER BY event_type
    """,
    tags=("diagnostics", "ks", "drift", "statistics", "bounded-histogram"),
    checkpointed_substrate=True,
)
def q174_ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic on the VALUE distribution
    (first vs second half of the month) per event type — the
    distribution-drift test with NO transcendentals: KS = max over the
    merged support of |F̂a − F̂c|, computed as the exact BIGINT
    cross-multiplication max |cumA·nC − cumC·nA| and divided once at
    the end — bit-exact on both engines (q164/q155's integer
    discipline). The cumulative windows run over the per-type CENTS
    HISTOGRAM, bounded by the value range (≤ ~56K distinct cents),
    never the corpus — the length-histogram single-partition-window
    exemption. One corpus shuffle total."""
    e = table(spark, sf_dir, "events")
    halves = e.select(
        "event_type",
        F.when(F.dayofmonth("ts") <= 15, 0).otherwise(1).alias("half"),
        to_cents("value").alias("cents"),
    )
    # bounded by the value range (<= ~56K distinct cents per type); read
    # by the cumulative windows AND the totals — checkpoint so the
    # corpus histogram aggregate runs once (rescan audit)
    hist = (
        halves.groupBy("event_type", "cents")
        .agg(
            F.sum((F.col("half") == 0).cast("long")).alias("ca"),
            F.sum((F.col("half") == 1).cast("long")).alias("cc"),
        )
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "event_type",
        "cents",
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cc").over(w).alias("cumc"),
    )
    tots = hist.groupBy("event_type").agg(
        F.sum("ca").alias("na"), F.sum("cc").alias("nc")
    )
    dev = F.abs(F.col("cuma") * F.col("nc") - F.col("cumc") * F.col("na"))
    return (
        cum.join(F.broadcast(tots), "event_type")
        .groupBy("event_type", "na", "nc")
        .agg(
            F.max(dev).alias("ks_num"),
            (F.max(dev).cast("double") / (F.col("na") * F.col("nc")).cast("double")).alias("ks"),
        )
        .select(
            "event_type",
            F.col("na").alias("n_baseline"),
            F.col("nc").alias("n_current"),
            "ks_num",
            "ks",
        )
        .orderBy("event_type")
    )


@query(
    "q178_spearman_value_k",
    oracle="""
    WITH base AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
    ), joint AS (
        SELECT event_type, cents, k, CAST(COUNT(*) AS BIGINT) AS n
        FROM base GROUP BY 1, 2, 3
    ), xh AS (
        SELECT event_type, cents, CAST(SUM(n) AS BIGINT) AS cnt FROM joint GROUP BY 1, 2
    ), xr AS (
        SELECT event_type, cents,
               CAST(2 * COALESCE(SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + cnt + 1 AS BIGINT) AS r2x
        FROM xh
    ), yh AS (
        SELECT event_type, k, CAST(SUM(n) AS BIGINT) AS cnt FROM joint GROUP BY 1, 2
    ), yr AS (
        SELECT event_type, k,
               CAST(2 * COALESCE(SUM(cnt) OVER (PARTITION BY event_type ORDER BY k
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + cnt + 1 AS BIGINT) AS r2y
        FROM yh
    ), sums AS (
        SELECT j.event_type,
               CAST(SUM(j.n) AS BIGINT)                  AS n,
               CAST(SUM(j.n * xr.r2x) AS BIGINT)         AS s1,
               CAST(SUM(j.n * yr.r2y) AS BIGINT)         AS s2,
               CAST(SUM(j.n * xr.r2x * xr.r2x) AS BIGINT) AS s11,
               CAST(SUM(j.n * yr.r2y * yr.r2y) AS BIGINT) AS s22,
               CAST(SUM(j.n * xr.r2x * yr.r2y) AS BIGINT) AS s12
        FROM joint j
        JOIN xr ON xr.event_type = j.event_type AND xr.cents = j.cents
        JOIN yr ON yr.event_type = j.event_type AND yr.k = j.k
        GROUP BY 1
    )
    SELECT event_type, n,
           CAST(ROUND(
               CAST(n * s12 - s1 * s2 AS DOUBLE)
               / (sqrt(CAST(n * s11 - s1 * s1 AS DOUBLE))
                  * sqrt(CAST(n * s22 - s2 * s2 AS DOUBLE)))
               * 1000000000) AS BIGINT) / 1000000000.0 AS rho
    FROM sums
    WHERE n * s11 > s1 * s1 AND n * s22 > s2 * s2
    ORDER BY event_type
    """,
    tags=("statistics", "spearman", "rank", "association", "drift"),
    checkpointed_substrate=True,
)
def q178_spearman_value_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between event value and the VARIANT-
    borne metadata k, per event_type — the monotone-association monitor
    (Pearson q170 sees only linear structure; rank correlation survives
    the heavy-tailed value distributions pipelines actually emit).

    Exact by construction, WITHOUT a corpus-wide sort: with ties taking
    average ranks, a row's rank depends only on its VALUE's histogram
    cell — avg_rank = base + (cnt+1)/2, so DOUBLED ranks 2r = 2*base +
    cnt + 1 are integers and Pearson on (2rx, 2ry) equals Spearman.
    One (type, cents, k) count aggregate is the only corpus shuffle;
    both marginals, the per-type cumulative bases (windows over BOUNDED
    histograms — ~18k cents cells, 100 k cells), and the moment sums
    (n, S1, S2, S11, S22, S12) are exact BIGINTs; rho is one double
    expression over identical integers with q170's 1e-9 fixed-point
    rounding. The moment sums and their n·S11-style combination run in
    DECIMAL(38,0) (exact to 1e38 — int64 dies at ~1.5e6-row groups,
    caught by the 10× probe), valid through ~1.3e9-row groups; past
    that ANSI decimal overflow fails loudly (shard or rescale first).
    Zero-variance groups excluded by integer guard."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    base = e.where(F.get_json_object("props", "$.k").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    joint = base.groupBy("event_type", "cents", "k").agg(F.count("*").alias("n"))
    joint = joint.localCheckpoint(eager=True)  # 3 consumers, 1 corpus scan

    def doubled_ranks(col: str) -> DataFrame:
        w = (
            Window.partitionBy("event_type")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            joint.groupBy("event_type", col)
            .agg(F.sum("n").alias("cnt"))
            .select(
                "event_type",
                col,
                (
                    2 * F.coalesce(F.sum("cnt").over(w), F.lit(0)) + F.col("cnt") + 1
                ).alias(f"r2_{col}"),
            )
        )
    xr = doubled_ranks("cents")
    yr = doubled_ranks("k")
    # Moment sums and their combination exceed int64 fast (S11 ~ 4n³,
    # n·S11 ~ 4n⁴ — past 2^63 at ~1.5e6-row groups, which the 10× probe
    # hit): accumulate in DECIMAL(38,0), exact to 1e38, bounding valid
    # group size at ~1.3e9 rows; past that ANSI decimal overflow fails
    # loudly. DuckDB mirrors via its native HUGEINT sums.
    d38 = "decimal(38,0)"
    sums = (
        joint.join(F.broadcast(xr), ["event_type", "cents"])
        .join(F.broadcast(yr), ["event_type", "k"])
        .select(
            "event_type",
            F.col("n").cast(d38).alias("n"),
            F.col("r2_cents").cast(d38).alias("rx"),
            F.col("r2_k").cast(d38).alias("ry"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum(F.col("n") * F.col("rx")).alias("s1"),
            F.sum(F.col("n") * F.col("ry")).alias("s2"),
            F.sum(F.col("n") * F.col("rx") * F.col("rx")).alias("s11"),
            F.sum(F.col("n") * F.col("ry") * F.col("ry")).alias("s22"),
            F.sum(F.col("n") * F.col("rx") * F.col("ry")).alias("s12"),
        )
        .select(*[F.col(c).cast(d38).alias(c) for c in ("n", "s1", "s2", "s11", "s22", "s12", )], "event_type")
    )
    rho = (F.col("n") * F.col("s12") - F.col("s1") * F.col("s2")).cast("double") / (
        F.sqrt((F.col("n") * F.col("s11") - F.col("s1") * F.col("s1")).cast("double"))
        * F.sqrt((F.col("n") * F.col("s22") - F.col("s2") * F.col("s2")).cast("double"))
    )
    return (
        sums.where(
            (F.col("n") * F.col("s11") > F.col("s1") * F.col("s1"))
            & (F.col("n") * F.col("s22") > F.col("s2") * F.col("s2"))
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            (F.round(rho * F.lit(1e9)).cast("long") / F.lit(1e9)).alias("rho"),
        )
        .orderBy("event_type")
    )


@query(
    "q179_mann_whitney_value",
    oracle="""
    WITH hist AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), cells AS (
        SELECT t.event_type, t.cents,
               CAST(SUM(t.ct) AS BIGINT) AS ct,
               CAST(SUM(t.cv) AS BIGINT) AS cv
        FROM (
            SELECT event_type, cents, c AS ct, 0 AS cv
            FROM hist WHERE event_type <> 'view'
            UNION ALL
            SELECT o.event_type, v.cents, 0 AS ct, v.c AS cv
            FROM (SELECT DISTINCT event_type FROM hist
                  WHERE event_type <> 'view') o
            CROSS JOIN (SELECT cents, c FROM hist WHERE event_type = 'view') v
        ) t
        GROUP BY 1, 2
    ), ranked AS (
        SELECT event_type, ct, cv,
               CAST(2 * COALESCE(SUM(ct + cv) OVER (PARTITION BY event_type
                        ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + (ct + cv) + 1 AS BIGINT) AS r2
        FROM cells
    ), sums AS (
        SELECT event_type,
               CAST(SUM(ct) AS BIGINT)      AS n_x,
               CAST(SUM(cv) AS BIGINT)      AS n_view,
               CAST(SUM(ct * r2) AS BIGINT) AS r1_2
        FROM ranked GROUP BY 1
    )
    SELECT event_type, n_x, n_view,
           CAST(r1_2 - n_x * (n_x + 1) AS BIGINT) AS u2,
           CAST(r1_2 - n_x * (n_x + 1) AS DOUBLE)
               / CAST(n_x * n_view AS DOUBLE) - 1.0 AS rank_biserial
    FROM sums
    ORDER BY event_type
    """,
    tags=("statistics", "mann-whitney", "rank", "drift"),
    checkpointed_substrate=True,
)
def q179_mann_whitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) of each event type's value distribution
    against the 'view' baseline — the nonparametric two-sample location
    test (q174's KS sees max CDF gap; U sees stochastic dominance), plus
    the rank-biserial effect size. Same exact-rank machinery as q178:
    ties take average ranks, which depend only on the cents histogram,
    so DOUBLED rank-sums are exact BIGINTs — 2*R1 folds from the per-pair
    combined histogram (one bounded union of the type's and the
    baseline's cents cells; ~18k rows per pair), and 2U = 2*R1 −
    n1(n1+1). ONE corpus scan builds the (type, cents) histogram; every
    later table is histogram-sized. rank_biserial = 2U/(n1*n2) − 1 is
    one double expression over identical integers."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    hist = (
        e.select(
            "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
        )
        .groupBy("event_type", "cents")
        .agg(F.count("*").alias("c"))
    )
    hist = hist.localCheckpoint(eager=True)  # 3 consumers, 1 corpus scan
    others = hist.where(F.col("event_type") != "view").select(
        "event_type", "cents", F.col("c").alias("ct"), F.lit(0).cast("long").alias("cv")
    )
    otypes = others.select("event_type").distinct()
    view_side = otypes.crossJoin(
        F.broadcast(
            hist.where(F.col("event_type") == "view").select(
                "cents", F.col("c").alias("cv")
            )
        )
    ).select("event_type", "cents", F.lit(0).cast("long").alias("ct"), "cv")
    cells = (
        others.unionByName(view_side)
        .groupBy("event_type", "cents")
        .agg(F.sum("ct").alias("ct"), F.sum("cv").alias("cv"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r2 = 2 * F.coalesce(F.sum(F.col("ct") + F.col("cv")).over(w), F.lit(0)) + (
        F.col("ct") + F.col("cv")
    ) + 1
    sums = (
        cells.select("event_type", "ct", "cv", r2.alias("r2"))
        .groupBy("event_type")
        .agg(
            F.sum("ct").alias("n_x"),
            F.sum("cv").alias("n_view"),
            F.sum(F.col("ct") * F.col("r2")).alias("r1_2"),
        )
    )
    u2 = F.col("r1_2") - F.col("n_x") * (F.col("n_x") + 1)
    return sums.select(
        "event_type",
        "n_x",
        "n_view",
        u2.cast("long").alias("u2"),
        (u2.cast("double") / (F.col("n_x") * F.col("n_view")).cast("double") - F.lit(1.0)).alias(
            "rank_biserial"
        ),
    ).orderBy("event_type")


# Benford first-digit probabilities log10(1 + 1/d), rounded to 1e-12 in
# Python once and embedded as IDENTICAL literals in both engines — no
# engine evaluates a transcendental.
_BENFORD_P = {
    1: 0.301029995664, 2: 0.176091259056, 3: 0.124938736608,
    4: 0.096910013008, 5: 0.079181246048, 6: 0.066946789631,
    7: 0.057991946978, 8: 0.051152522447, 9: 0.045757490561,
}


@query(
    "q184_benford_drift",
    oracle=f"""
    WITH cents AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS c
        FROM events
        WHERE CAST(ROUND(value * 100) AS BIGINT) >= 1
    ), digits AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM cents GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM digits
    ), bp(digit, p) AS (
        VALUES {", ".join(f"({d}, {p})" for d, p in sorted(_BENFORD_P.items()))}
    )
    SELECT bp.digit,
           COALESCE(d.n_obs, 0) AS n_obs,
           CAST(ROUND(CAST(tot.n AS DOUBLE) * bp.p * 1000000000) AS BIGINT)
               / 1000000000.0 AS expected,
           CAST(ROUND(
               (CAST(COALESCE(d.n_obs, 0) AS DOUBLE) - CAST(tot.n AS DOUBLE) * bp.p)
               * (CAST(COALESCE(d.n_obs, 0) AS DOUBLE) - CAST(tot.n AS DOUBLE) * bp.p)
               / (CAST(tot.n AS DOUBLE) * bp.p) * 1000000000) AS BIGINT)
               / 1000000000.0 AS chi2_term
    FROM bp LEFT JOIN digits d ON d.digit = bp.digit
    CROSS JOIN tot
    ORDER BY bp.digit
    """,
    tags=("statistics", "benford", "drift", "bounded-histogram"),
    checkpointed_substrate=True,
)
def q184_benford_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit drift of the value distribution — the fraud /
    synthetic-data smell test: organically-generated magnitudes follow
    log10(1+1/d); generated or clipped feeds do not. First digits come
    from the exact integer cents (string head — identical on both
    engines; zero-cent rows excluded identically), fold to a 9-row
    histogram (one corpus scan, map-side combinable), and the expected
    counts + chi-square terms use PRE-ROUNDED Benford literals (1e-12,
    computed once in Python) so neither engine evaluates a
    transcendental — every double op runs on identical inputs, then
    1e-9 fixed-point rounding (q170's recipe). The 9-digit dimension is
    a VALUES literal so digits absent from the data still report."""
    e = table(spark, sf_dir, "events")
    cents = e.select(F.round(F.col("value") * 100).cast("long").alias("c")).where(
        F.col("c") >= 1
    )
    digits = (
        cents.select(
            F.substring(F.col("c").cast("string"), 1, 1).cast("long").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").alias("n_obs"))
        # ≤9-row histogram feeding BOTH the join and the total — checkpoint
        # so the corpus is scanned once, not re-expanded per consumer
        .localCheckpoint(eager=True)
    )
    bp = spark.createDataFrame(
        sorted(_BENFORD_P.items()), "digit long, p double"
    )
    tot = digits.agg(F.sum("n_obs").cast("long").alias("n"))
    exp = F.col("n").cast("double") * F.col("p")
    obs = F.coalesce(F.col("n_obs"), F.lit(0)).cast("double")
    chi2 = (obs - exp) * (obs - exp) / exp
    return (
        bp.join(F.broadcast(digits), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_obs"),
            (F.round(exp * F.lit(1e9)).cast("long") / F.lit(1e9)).alias("expected"),
            (F.round(chi2 * F.lit(1e9)).cast("long") / F.lit(1e9)).alias("chi2_term"),
        )
        .orderBy("digit")
    )


@query(
    "q240_kruskal_wallis_value",
    oracle="""
    WITH hist AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), pooled AS (
        SELECT cents, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY 1
    ), ranked AS (
        SELECT cents, n,
               CAST(2 * COALESCE(SUM(n) OVER (ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + n + 1 AS BIGINT) AS r2
        FROM pooled
    ), grp AS (
        SELECT event_type,
               CAST(SUM(c) AS BIGINT) AS n_i,
               CAST(SUM(c * r2) AS BIGINT) AS rank_sum_2x
        FROM hist JOIN ranked USING (cents)
        GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_i) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(CAST(rank_sum_2x AS DOUBLE)
                                   * CAST(rank_sum_2x AS DOUBLE)
                                   / (4.0 * CAST(n_i AS DOUBLE)))
                             AS BIGINT)) AS BIGINT) AS s_int
        FROM grp
    ), ties AS (
        SELECT CAST(SUM(CAST(n AS HUGEINT) * n * n - n) AS DECIMAL(38, 0))
                   AS t3
        FROM pooled
    )
    SELECT g.event_type, g.n_i, g.rank_sum_2x,
           CAST(ROUND((12.0 * CAST(t.s_int AS DOUBLE)
                       / (CAST(t.n AS DOUBLE) * (CAST(t.n AS DOUBLE) + 1.0))
                       - 3.0 * (CAST(t.n AS DOUBLE) + 1.0))
                      * 1000000000) AS BIGINT) / 1000000000.0 AS h,
           CAST(ROUND((12.0 * CAST(t.s_int AS DOUBLE)
                       / (CAST(t.n AS DOUBLE) * (CAST(t.n AS DOUBLE) + 1.0))
                       - 3.0 * (CAST(t.n AS DOUBLE) + 1.0))
                      / (1.0 - CAST(t3.t3 AS DOUBLE)
                               / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)
                                  * CAST(t.n AS DOUBLE) - CAST(t.n AS DOUBLE)))
                      * 1000000000) AS BIGINT) / 1000000000.0 AS h_corrected
    FROM grp g, tot t, ties t3
    ORDER BY g.event_type
    """,
    tags=("statistics", "kruskal-wallis", "rank", "drift"),
    checkpointed_substrate=True,
)
def q240_kruskal_wallis_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H over every event type's value distribution — the
    k-group generalization of q179's Mann-Whitney (one omnibus rank test
    instead of k pairwise U's, the correct first step before pairwise
    drill-down). Same exact-rank machinery: ties take average ranks off
    the pooled cents histogram, so DOUBLED rank sums are exact BIGINTs.
    H = 12/(N(N+1))·ΣR_i²/n_i − 3(N+1) with the tie correction
    C = 1 − Σ(t³−t)/(N³−N); both H and H/C are single double
    expressions over exact integers. The one non-analytic step —
    ΣR_i²/n_i — enters per group as ROUND(R2²/(4·n_i)) computed in
    DOUBLE (R2² exceeds 2^63 past ~1e5-row groups, but IEEE doubles over
    identical exact-integer inputs round identically on both engines),
    summed as BIGINTs over the k=5 bounded group rows — the sub-integer
    truncation shifts H by <1e-7, identically on both engines.

    Shape at scale: ONE corpus scan into the checkpointed (type, cents)
    histogram (read by the pooled rank build and the group fold); the
    pooled ranking window runs over the bounded cents value domain
    (~18k cells); everything after is k-row arithmetic."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    hist = (
        e.select(
            "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
        )
        .groupBy("event_type", "cents")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)  # 2 consumers, 1 corpus scan
    )
    pooled = hist.groupBy("cents").agg(F.sum("c").alias("n"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    ranked = pooled.select(
        "cents",
        "n",
        (
            2 * F.coalesce(F.sum("n").over(w), F.lit(0)) + F.col("n") + 1
        ).alias("r2"),
    )
    grp = (
        hist.join(ranked.hint("shuffle_merge"), "cents")
        .groupBy("event_type")
        .agg(
            F.sum("c").alias("n_i"),
            F.sum(F.col("c") * F.col("r2")).alias("rank_sum_2x"),
        )
    )
    d38 = "decimal(38,0)"
    tot = grp.agg(
        F.sum("n_i").alias("n"),
        F.sum(
            F.round(
                F.col("rank_sum_2x").cast("double")
                * F.col("rank_sum_2x").cast("double")
                / (F.lit(4.0) * F.col("n_i").cast("double"))
            ).cast("long")
        ).alias("s_int"),
    )
    ties = pooled.agg(
        F.sum(
            F.col("n").cast(d38) * F.col("n") * F.col("n") - F.col("n")
        ).alias("t3")
    )
    nd = F.col("n").cast("double")
    h = (
        F.lit(12.0) * F.col("s_int").cast("double") / (nd * (nd + F.lit(1.0)))
        - F.lit(3.0) * (nd + F.lit(1.0))
    )
    corr = F.lit(1.0) - F.col("t3").cast("double") / (nd * nd * nd - nd)

    def r9(c):
        return F.round(c * F.lit(1e9)).cast("long") / F.lit(1e9)

    return (
        grp.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ties))
        .select(
            "event_type",
            "n_i",
            "rank_sum_2x",
            r9(h).alias("h"),
            r9(h / corr).alias("h_corrected"),
        )
        .orderBy("event_type")
    )


_BOOT_B = 200  # bootstrap replicates
# 2.5%/97.5% CI bounds as order statistics, DERIVED from _BOOT_B so
# retuning the replicate count cannot silently leave the bounds computed
# at the wrong quantiles (rank 5 / 195 at B=200).
_BOOT_LO = _BOOT_B // 40
_BOOT_HI = _BOOT_B - _BOOT_LO
assert _BOOT_B % 40 == 0, "2.5% rank must be exact for order-statistic CI"


@query(
    "q242_bootstrap_ci_daily_revenue",
    oracle=f"""
    WITH days AS (
        SELECT o_orderdate AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS day_cents
        FROM orders GROUP BY 1
    ), idx AS (
        SELECT day_cents,
               CAST(ROW_NUMBER() OVER (ORDER BY d) - 1 AS BIGINT) AS i
        FROM days
    ), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM idx),
    draws AS (
        SELECT r.r,
               CAST('0x' || substr(md5(CAST(r.r AS VARCHAR) || '-' ||
                    CAST(s.i AS VARCHAR)), 1, 12) AS BIGINT)
                   % (SELECT nd FROM nn) AS pick
        FROM (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS r) r
        CROSS JOIN (SELECT unnest(generate_series(0,
                        (SELECT nd FROM nn) - 1)) AS i) s
    ), boot AS (
        SELECT d.r, CAST(SUM(i.day_cents) AS BIGINT) AS boot_sum
        FROM draws d JOIN idx i ON i.i = d.pick
        GROUP BY 1
    ), ranked AS (
        SELECT boot_sum, ROW_NUMBER() OVER (ORDER BY boot_sum, r) AS rk
        FROM boot
    ), tot AS (
        SELECT CAST(SUM(day_cents) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS nd
        FROM idx
    )
    SELECT t.nd AS n_days, CAST({_BOOT_B} AS BIGINT) AS n_boot,
           CAST(t.total AS DOUBLE) / t.nd AS mean_daily_cents,
           CAST((SELECT boot_sum FROM ranked WHERE rk = {_BOOT_LO}) AS DOUBLE)
               / t.nd AS ci_lo_cents,
           CAST((SELECT boot_sum FROM ranked WHERE rk = {_BOOT_HI}) AS DOUBLE)
               / t.nd AS ci_hi_cents
    FROM tot t
    """,
    tags=("statistics", "bootstrap", "confidence-interval", "resampling"),
    checkpointed_substrate=True,
)
def q242_bootstrap_ci_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric bootstrap 95% CI for mean daily order revenue — the
    distribution-free interval for statistics with no closed-form
    standard error (q232's Wilson covers proportions only). The
    resampling is ENGINE-REPRODUCIBLE: draw (replicate r, slot i) picks
    day index md5(r||'-'||i) mod n_days via the repo's md5-slice
    pseudo-randomness (q37/q121's trick — rand() would kill both the
    driver hash and Spark retry determinism). Replicate sums are exact
    BIGINT cents, so the 2.5%/97.5% bounds are ORDER STATISTICS of 200
    exact integers (rank 5/195 with replicate-id tiebreak) — no
    interpolation, no float compare, bit-identical cross-engine.

    Bootstrap-over-aggregates discipline: resample the BOUNDED daily
    aggregate (~2.4k cells — the time-domain bound), never corpus rows,
    so the draw spine is B×n_days ~ 480k rows regardless of corpus
    size; the day table broadcasts into the pick join; the only
    single-partition windows index the bounded day / 200-replicate
    tables. The one driver scalar (n_days) is the q110 setup-count
    precedent."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    days = (
        o.groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.sum(to_cents("o_totalprice")).alias("day_cents"))
        .localCheckpoint(eager=True)  # 1 corpus scan; 3 consumers
    )
    idx = days.select(
        "day_cents",
        (F.row_number().over(Window.orderBy("d")) - 1).cast("long").alias("i"),
    )
    nd = days.count()  # one scalar action at setup (the q110 precedent)
    spine = (
        spark.range(_BOOT_B)
        .select(F.col("id").alias("r"))
        .crossJoin(F.broadcast(spark.range(nd).select(F.col("id").alias("i"))))
    )
    pick = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("r").cast("string"),
                        F.lit("-"),
                        F.col("i").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(nd)
    )
    boot = (
        spine.select("r", pick.alias("pick"))
        .join(F.broadcast(idx), F.col("pick") == F.col("i"))
        .groupBy("r")
        .agg(F.sum("day_cents").alias("boot_sum"))
    )
    ranked = boot.select(
        "boot_sum",
        F.row_number().over(Window.orderBy("boot_sum", "r")).alias("rk"),
    )
    tot = days.agg(
        F.sum("day_cents").alias("total"), F.count("*").alias("n_days")
    )
    lo = ranked.where(F.col("rk") == _BOOT_LO).select(
        F.col("boot_sum").alias("lo_sum")
    )
    hi = ranked.where(F.col("rk") == _BOOT_HI).select(
        F.col("boot_sum").alias("hi_sum")
    )
    return (
        tot.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n_days",
            F.lit(_BOOT_B).cast("long").alias("n_boot"),
            (F.col("total").cast("double") / F.col("n_days")).alias(
                "mean_daily_cents"
            ),
            (F.col("lo_sum").cast("double") / F.col("n_days")).alias(
                "ci_lo_cents"
            ),
            (F.col("hi_sum").cast("double") / F.col("n_days")).alias(
                "ci_hi_cents"
            ),
        )
    )


@query(
    "q261_sampled_quantile_fidelity",
    oracle="""
    WITH h AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               CAST(COUNT(*) AS BIGINT) AS c,
               CAST(COUNT(*) FILTER (
                   WHERE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                             1, 4) AS BIGINT) % 8 = 0)
                   AS BIGINT) AS cs
        FROM events GROUP BY 1, 2
    ), cum AS (
        SELECT event_type, cents, c, cs,
               CAST(SUM(c)  OVER w AS BIGINT) AS cum_c,
               CAST(SUM(cs) OVER w AS BIGINT) AS cum_cs
        FROM h
        WINDOW w AS (PARTITION BY event_type ORDER BY cents
                     ROWS UNBOUNDED PRECEDING)
    ), tot AS (
        SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(cs) AS BIGINT) AS ns
        FROM h GROUP BY 1
    ), picks AS (
        SELECT cum.event_type,
               MIN(CASE WHEN cum_c >= (t.n + 1) // 2 THEN cents END)
                   AS p50_cents,
               MIN(CASE WHEN cum_c >= (9 * t.n + 9) // 10 THEN cents END)
                   AS p90_cents,
               MIN(CASE WHEN cum_c >= (99 * t.n + 99) // 100 THEN cents END)
                   AS p99_cents,
               MIN(CASE WHEN cum_cs >= (t.ns + 1) // 2 THEN cents END)
                   AS p50_est,
               MIN(CASE WHEN cum_cs >= (9 * t.ns + 9) // 10 THEN cents END)
                   AS p90_est,
               MIN(CASE WHEN cum_cs >= (99 * t.ns + 99) // 100 THEN cents END)
                   AS p99_est
        FROM cum JOIN tot t USING (event_type)
        GROUP BY 1
    )
    SELECT t.event_type, t.n AS n_events, t.ns AS n_sample,
           p.p50_cents, p.p90_cents, p.p99_cents,
           p.p50_est, p.p90_est, p.p99_est
    FROM tot t JOIN picks p USING (event_type)
    WHERE t.ns > 0
    ORDER BY t.event_type
    """,
    tags=("statistics", "sampling", "quantiles", "sketch", "fidelity"),
    checkpointed_substrate=True,
)
def q261_sampled_quantile_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-sampled quantile-sketch fidelity — the quantile tier's
    analogue of q221 (KMV vs exact distinct) and q223 (HLL vs exact):
    per-type p50/p90/p99 from a DETERMINISTIC 1-in-8 md5 row sample
    (gate on event_id hex — engine-reproducible and retry-safe where
    Bernoulli rand() is neither, and union-of-samples == sample-of-union
    so shard samples merge losslessly) next to the EXACT q218-style
    percentiles, so the estimation error a 100 TB pipeline accepts when
    the full value histogram is too hot to maintain is MEASURED, not
    assumed. Both extractions use q201/q218's pure-integer ceil(q·n)
    thresholds.

    Scale shape: ONE corpus pass builds a single (type, cents) histogram
    carrying BOTH populations (full count + sampled count per cell —
    the sample adds zero extra scans), checkpointed; cumulative windows
    run over the bounded histogram only."""
    e = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    gate = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 8
        == 0
    )
    h = (
        e.groupBy("event_type", to_cents("value").alias("cents"))
        .agg(
            F.count("*").alias("c"),
            F.sum(gate.cast("long")).alias("cs"),
        )
        .localCheckpoint(eager=True)  # bounded: value-domain-sized
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = h.select(
        "event_type",
        "cents",
        F.sum("c").over(w).alias("cum_c"),
        F.sum("cs").over(w).alias("cum_cs"),
    )
    tot = h.groupBy("event_type").agg(
        F.sum("c").alias("n"), F.sum("cs").alias("ns")
    )
    def pick(cum_col: str, n_col: str, num: int, den: int, alias: str):
        return F.min(
            F.when(
                F.col(cum_col) >= F.expr(f"({num} * {n_col} + {num}) DIV {den}"),
                F.col("cents"),
            )
        ).alias(alias)

    picks = (
        cum.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            pick("cum_c", "n", 1, 2, "p50_cents"),
            pick("cum_c", "n", 9, 10, "p90_cents"),
            pick("cum_c", "n", 99, 100, "p99_cents"),
            pick("cum_cs", "ns", 1, 2, "p50_est"),
            pick("cum_cs", "ns", 9, 10, "p90_est"),
            pick("cum_cs", "ns", 99, 100, "p99_est"),
        )
    )
    return (
        tot.where(F.col("ns") > 0)
        .join(picks, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_events"),
            F.col("ns").alias("n_sample"),
            "p50_cents",
            "p90_cents",
            "p99_cents",
            "p50_est",
            "p90_est",
            "p99_est",
        )
        .orderBy("event_type")
    )


# --- q286: Bloom join-pruning audit -----------------------------------------
#
# One 16-bit position computation serves every filter size: the swept
# sizes all divide 2^16, so bits_m = p16 % m. Build side = one month of
# orders (the dimension-side predicate a runtime filter would push).
_BLOOM_SIZES = (4096, 16384, 65536)
_BLOOM_K = 4


@query(
    "q286_bloom_join_pruning",
    oracle=f"""
    WITH build AS (
        SELECT o_orderkey AS k, md5(CAST(o_orderkey AS VARCHAR)) AS h
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-05-01'
          AND o_orderdate < TIMESTAMP '1998-06-01'
    ), ms AS (
        SELECT unnest(ARRAY{list(_BLOOM_SIZES)}) AS m
    ), bpos AS (
        SELECT DISTINCT ms.m,
               ( (strpos('0123456789abcdef', substr(h, 1 + 4*j, 1)) - 1) * 4096
               + (strpos('0123456789abcdef', substr(h, 2 + 4*j, 1)) - 1) * 256
               + (strpos('0123456789abcdef', substr(h, 3 + 4*j, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(h, 4 + 4*j, 1)) - 1) ) % ms.m
                   AS p
        FROM build, (SELECT unnest(generate_series(0, {_BLOOM_K - 1})) AS j), ms
    ), probe AS (
        SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY l_orderkey
    ), pk AS (
        SELECT p.k, p.n_rows, md5(CAST(p.k AS VARCHAR)) AS h,
               CASE WHEN b.k IS NULL THEN 0 ELSE 1 END AS is_true
        FROM probe p LEFT JOIN (SELECT DISTINCT k FROM build) b ON p.k = b.k
    ), ppos AS (
        SELECT pk.k, pk.n_rows, pk.is_true, ms.m,
               ( (strpos('0123456789abcdef', substr(h, 1 + 4*j, 1)) - 1) * 4096
               + (strpos('0123456789abcdef', substr(h, 2 + 4*j, 1)) - 1) * 256
               + (strpos('0123456789abcdef', substr(h, 3 + 4*j, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(h, 4 + 4*j, 1)) - 1) ) % ms.m
                   AS p
        FROM pk, (SELECT unnest(generate_series(0, {_BLOOM_K - 1})) AS j), ms
    ), passed AS (
        SELECT pp.k, pp.m, ANY_VALUE(pp.n_rows) AS n_rows,
               ANY_VALUE(pp.is_true) AS is_true,
               CASE WHEN COUNT(bp.p) = {_BLOOM_K} THEN 1 ELSE 0 END AS pass
        FROM ppos pp LEFT JOIN bpos bp ON bp.m = pp.m AND bp.p = pp.p
        GROUP BY pp.k, pp.m
    ), bits AS (
        SELECT m, CAST(COUNT(*) AS BIGINT) AS bits_set FROM bpos GROUP BY m
    )
    SELECT CAST(pa.m AS BIGINT) AS m_bits,
           b.bits_set,
           CAST(COUNT(*) AS BIGINT) AS n_probe_keys,
           CAST(SUM(pa.pass) AS BIGINT) AS keys_pass,
           CAST(SUM(pa.is_true) AS BIGINT) AS keys_true,
           CAST(SUM(CASE WHEN pa.pass = 1 AND pa.is_true = 0
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(SUM(CASE WHEN pa.is_true = 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) AS key_fp_rate,
           CAST(SUM(pa.n_rows) AS BIGINT) AS rows_total,
           CAST(SUM(pa.pass * pa.n_rows) AS BIGINT) AS rows_scanned,
           CAST(SUM(pa.is_true * pa.n_rows) AS BIGINT) AS rows_matched,
           1.0 - CAST(SUM(pa.pass * pa.n_rows) AS DOUBLE)
                 / CAST(SUM(pa.n_rows) AS DOUBLE) AS scan_reduction
    FROM passed pa JOIN bits b ON b.m = pa.m
    GROUP BY pa.m, b.bits_set
    ORDER BY m_bits
    """,
    tags=("join", "bloom", "runtime-filter", "pruning"),
    checkpointed_substrate=True,
)
def q286_bloom_join_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom JOIN-PRUNING audit — the size-tradeoff measurement behind
    Spark's runtime bloom-filter joins (q121 uses a Bloom for ingest
    dedup; this audits it as a JOIN pre-filter): the dimension-side
    month of orders builds k={_BLOOM_K} md5-slice filters at
    {_BLOOM_SIZES} bits (ONE 16-bit position computation serves every
    size — the swept sizes divide 2^16, so bits = p16 % m), and the
    fact side reports, per size: keys/rows surviving the filter, the
    exact truth (semi join), the key false-positive rate among true
    negatives, and the scan reduction a pruned scan achieves. No false
    negative is possible by construction; the curve shows precisely the
    memory ↔ pruning trade a runtime filter tunes. Scale shape:
    membership is evaluated per DISTINCT probe key (keys ≪ rows — one
    map-side-combinable groupBy), the bit tables are bounded
    (≤ {max(_BLOOM_SIZES)} rows) broadcasts, and the probe-key frame is
    checkpointed so lineitem is scanned once."""
    o = table(spark, sf_dir, "orders")
    build = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1998-05-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp"))
        )
        .select(F.col("o_orderkey").alias("k"))
        .localCheckpoint(eager=True)  # bounded build-key frame, read 2x
    )
    ms = F.array(*[F.lit(m) for m in _BLOOM_SIZES])
    js = F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))

    def positions(frame: DataFrame) -> DataFrame:
        h = F.md5(F.col("k").cast("string"))
        return (
            frame.withColumn("h", h)
            .withColumn("j", F.explode(js))
            .withColumn(
                "p16",
                F.conv(F.substring(F.col("h"), 1 + 4 * F.col("j"), 4), 16, 10).cast(
                    "long"
                ),
            )
            .withColumn("m", F.explode(ms))
            .withColumn("p", F.pmod(F.col("p16"), F.col("m")))
        )

    bpos = positions(build).select("m", "p").distinct().localCheckpoint(eager=True)
    li = table(spark, sf_dir, "lineitem")
    probe = (
        li.groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count("*").alias("n_rows"))
        .join(
            F.broadcast(build.select("k").distinct().withColumn("is_true", F.lit(1))),
            "k",
            "left",
        )
        .select("k", "n_rows", F.coalesce("is_true", F.lit(0)).alias("is_true"))
        .localCheckpoint(eager=True)  # one lineitem scan; reused per size
    )
    passed = (
        positions(probe)
        .join(
            F.broadcast(bpos.withColumn("hit", F.lit(1))), ["m", "p"], "left"
        )
        .groupBy("k", "m")
        .agg(
            F.first("n_rows").alias("n_rows"),
            F.first("is_true").alias("is_true"),
            (F.sum(F.coalesce("hit", F.lit(0))) == _BLOOM_K)
            .cast("long")
            .alias("pass"),
        )
    )
    bits = bpos.groupBy("m").agg(F.count("*").alias("bits_set"))
    return (
        passed.join(F.broadcast(bits), "m")
        .groupBy("m", "bits_set")
        .agg(
            F.count("*").alias("n_probe_keys"),
            F.sum("pass").alias("keys_pass"),
            F.sum("is_true").alias("keys_true"),
            (
                F.sum(
                    F.when((F.col("pass") == 1) & (F.col("is_true") == 0), 1).otherwise(
                        0
                    )
                ).cast("double")
                / F.sum(F.when(F.col("is_true") == 0, 1).otherwise(0)).cast("double")
            ).alias("key_fp_rate"),
            F.sum("n_rows").alias("rows_total"),
            F.sum(F.col("pass") * F.col("n_rows")).alias("rows_scanned"),
            F.sum(F.col("is_true") * F.col("n_rows")).alias("rows_matched"),
        )
        .select(
            F.col("m").cast("long").alias("m_bits"),
            "bits_set",
            "n_probe_keys",
            "keys_pass",
            "keys_true",
            "key_fp_rate",
            "rows_total",
            "rows_scanned",
            "rows_matched",
            (
                F.lit(1.0)
                - F.col("rows_scanned").cast("double")
                / F.col("rows_total").cast("double")
            ).alias("scan_reduction"),
        )
        .orderBy("m_bits")
    )


# --- q287: clustering-factor statistic --------------------------------------
#
# Physical order proxy = (l_orderkey, l_linenumber) FOLLOWED BY every
# compared column: the synthetic lineitem repeats (orderkey, linenumber)
# heavily, and a run count is only well-defined under a TOTAL order —
# ties identical in every compared column cannot move any run boundary,
# so ordering by the full projection makes the statistic exact on both
# engines. Adjacency is two-level: within-bucket lag windows (parallel)
# + one boundary lag over the ~N/B bucket frame (√N bucketing keeps
# that frame one ordinary partition; a third level applies the same
# trick at extreme scale).
_CLUSTER_BUCKET = 512


@query(
    "q287_clustering_factor",
    oracle=f"""
    WITH li AS (
        SELECT l_orderkey * 16 + l_linenumber AS ok16,
               l_orderkey // {_CLUSTER_BUCKET} AS bucket,
               CAST(l_shipdate AS DATE) AS c_ship,
               l_partkey AS c_part,
               l_suppkey AS c_supp,
               l_returnflag AS c_flag
        FROM lineitem
    ), lagged AS (
        SELECT bucket, c_ship, c_part, c_supp, c_flag,
               lag(c_ship) OVER w AS p_ship,
               lag(c_part) OVER w AS p_part,
               lag(c_supp) OVER w AS p_supp,
               lag(c_flag) OVER w AS p_flag,
               first_value(c_ship) OVER wf AS f_ship,
               last_value(c_ship) OVER wf AS l_ship,
               first_value(c_part) OVER wf AS f_part,
               last_value(c_part) OVER wf AS l_part,
               first_value(c_supp) OVER wf AS f_supp,
               last_value(c_supp) OVER wf AS l_supp,
               first_value(c_flag) OVER wf AS f_flag,
               last_value(c_flag) OVER wf AS l_flag
        FROM li
        WINDOW
          w AS (PARTITION BY bucket
                ORDER BY ok16, c_ship, c_part, c_supp, c_flag),
          wf AS (PARTITION BY bucket
                 ORDER BY ok16, c_ship, c_part, c_supp, c_flag
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ), within AS (
        SELECT
          CAST(SUM(CASE WHEN p_ship IS NOT NULL AND c_ship <> p_ship
                        THEN 1 ELSE 0 END) AS BIGINT) AS b_ship,
          CAST(SUM(CASE WHEN p_part IS NOT NULL AND c_part <> p_part
                        THEN 1 ELSE 0 END) AS BIGINT) AS b_part,
          CAST(SUM(CASE WHEN p_supp IS NOT NULL AND c_supp <> p_supp
                        THEN 1 ELSE 0 END) AS BIGINT) AS b_supp,
          CAST(SUM(CASE WHEN p_flag IS NOT NULL AND c_flag <> p_flag
                        THEN 1 ELSE 0 END) AS BIGINT) AS b_flag
        FROM lagged
    ), bounds AS (
        SELECT bucket,
               MIN(f_ship) AS f_ship, MIN(l_ship) AS l_ship,
               MIN(f_part) AS f_part, MIN(l_part) AS l_part,
               MIN(f_supp) AS f_supp, MIN(l_supp) AS l_supp,
               MIN(f_flag) AS f_flag, MIN(l_flag) AS l_flag
        FROM lagged GROUP BY bucket
    ), blagged AS (
        SELECT f_ship, f_part, f_supp, f_flag,
               lag(l_ship) OVER wb AS pl_ship,
               lag(l_part) OVER wb AS pl_part,
               lag(l_supp) OVER wb AS pl_supp,
               lag(l_flag) OVER wb AS pl_flag
        FROM bounds
        WINDOW wb AS (ORDER BY bucket)
    ), cross_b AS (
        SELECT
          CAST(SUM(CASE WHEN pl_ship IS NOT NULL AND f_ship <> pl_ship
                        THEN 1 ELSE 0 END) AS BIGINT) AS b_ship,
          CAST(SUM(CASE WHEN pl_part IS NOT NULL AND f_part <> pl_part
                        THEN 1 ELSE 0 END) AS BIGINT) AS b_part,
          CAST(SUM(CASE WHEN pl_supp IS NOT NULL AND f_supp <> pl_supp
                        THEN 1 ELSE 0 END) AS BIGINT) AS b_supp,
          CAST(SUM(CASE WHEN pl_flag IS NOT NULL AND f_flag <> pl_flag
                        THEN 1 ELSE 0 END) AS BIGINT) AS b_flag
        FROM blagged
    ), dst AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT c_ship) AS BIGINT) AS d_ship,
               CAST(COUNT(DISTINCT c_part) AS BIGINT) AS d_part,
               CAST(COUNT(DISTINCT c_supp) AS BIGINT) AS d_supp,
               CAST(COUNT(DISTINCT c_flag) AS BIGINT) AS d_flag
        FROM li
    ), unp AS (
        SELECT 'l_shipdate' AS candidate, n_rows, d_ship AS n_distinct,
               1 + within.b_ship + cb.b_ship AS n_runs
        FROM within, cross_b cb, dst
        UNION ALL
        SELECT 'l_partkey', n_rows, d_part, 1 + within.b_part + cb.b_part
        FROM within, cross_b cb, dst
        UNION ALL
        SELECT 'l_suppkey', n_rows, d_supp, 1 + within.b_supp + cb.b_supp
        FROM within, cross_b cb, dst
        UNION ALL
        SELECT 'l_returnflag', n_rows, d_flag, 1 + within.b_flag + cb.b_flag
        FROM within, cross_b cb, dst
    )
    SELECT candidate, n_rows, n_distinct, CAST(n_runs AS BIGINT) AS n_runs,
           CAST(n_distinct AS DOUBLE) / CAST(n_runs AS DOUBLE)
               AS clustering_ratio
    FROM unp
    ORDER BY candidate
    """,
    tags=("layout", "clustering-factor", "physical-design", "advisor"),
    checkpointed_substrate=True,
)
def q287_clustering_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTERING FACTOR per candidate sort column — the statistic an
    index/layout advisor reads before recommending a re-sort (the
    physical-design family: q277 zone maps, q285 encoding, q282
    compaction, q188 z-order): under the table's physical order, the
    number of VALUE RUNS each column exhibits, against its distinct
    count — ratio 1.0 means perfectly clustered (every value one
    contiguous run → min-max pruning works), →0 means scattered (zone
    maps useless for that column). Runs are counted exactly with a
    TWO-LEVEL adjacency: per-bucket lag windows (parallel) plus one
    boundary lag over the N/B bucket frame (√N bucketing keeps that
    frame a single ordinary partition), never a corpus-wide window;
    bucket first/last values ride the SAME window pass
    (first_value/last_value over the full frame). All four candidates
    share ONE scan and ONE lagged struct row — not four sibling
    windows."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select(
            (F.col("l_orderkey") * 16 + F.col("l_linenumber")).alias("ok16"),
            F.expr(f"l_orderkey DIV {_CLUSTER_BUCKET}L").alias("bucket"),
            F.to_date("l_shipdate").alias("c_ship"),
            F.col("l_partkey").alias("c_part"),
            F.col("l_suppkey").alias("c_supp"),
            F.col("l_returnflag").alias("c_flag"),
        )
        .localCheckpoint(eager=True)  # one scan feeds the window pass + stats
    )
    from pyspark.sql import Window

    cols = ["ship", "part", "supp", "flag"]
    order = ["ok16", "c_ship", "c_part", "c_supp", "c_flag"]
    w = Window.partitionBy("bucket").orderBy(*order)
    wf = (
        Window.partitionBy("bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    prev = F.lag(F.struct(*[F.col(f"c_{c}").alias(c) for c in cols])).over(w)
    # the corpus-scale window pass reduces to ONE bucket-level row inside
    # the same job — only the N/B bucket frame ever materializes
    bfr = (
        li.withColumn("prev", prev)
        .select(
            "bucket",
            *[
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col(f"c_{c}") != F.col("prev")[c]),
                    1,
                )
                .otherwise(0)
                .alias(f"brk_{c}")
                for c in cols
            ],
            *[F.first(f"c_{c}").over(wf).alias(f"f_{c}") for c in cols],
            *[F.last(f"c_{c}").over(wf).alias(f"l_{c}") for c in cols],
        )
        .groupBy("bucket")
        .agg(
            *[F.sum(f"brk_{c}").alias(f"b_{c}") for c in cols],
            *[F.min(f"f_{c}").alias(f"f_{c}") for c in cols],
            *[F.min(f"l_{c}").alias(f"l_{c}") for c in cols],
        )
        .localCheckpoint(eager=True)
    )
    within = bfr.agg(*[F.sum(f"b_{c}").alias(f"b_{c}") for c in cols])
    bounds = bfr
    wb = Window.orderBy("bucket")
    blagged = bounds.select(
        *[F.col(f"f_{c}") for c in cols],
        *[F.lag(f"l_{c}").over(wb).alias(f"pl_{c}") for c in cols],
    )
    cross_b = blagged.agg(
        *[
            F.sum(
                F.when(
                    F.col(f"pl_{c}").isNotNull()
                    & (F.col(f"f_{c}") != F.col(f"pl_{c}")),
                    1,
                ).otherwise(0)
            ).alias(f"x_{c}")
            for c in cols
        ]
    )
    dst = li.agg(
        F.count("*").alias("n_rows"),
        *[F.countDistinct(f"c_{c}").alias(f"d_{c}") for c in cols],
    )
    wide = (
        within.crossJoin(F.broadcast(cross_b))
        .crossJoin(F.broadcast(dst))
        .localCheckpoint(eager=True)  # 1 row; the four candidate selects share it
    )
    names = {
        "ship": "l_shipdate",
        "part": "l_partkey",
        "supp": "l_suppkey",
        "flag": "l_returnflag",
    }
    parts = [
        wide.select(
            F.lit(names[c]).alias("candidate"),
            "n_rows",
            F.col(f"d_{c}").alias("n_distinct"),
            (F.lit(1) + F.col(f"b_{c}") + F.col(f"x_{c}"))
            .cast("long")
            .alias("n_runs"),
        )
        for c in cols
    ]
    unp = parts[0]
    for p in parts[1:]:
        unp = unp.unionByName(p)
    return unp.select(
        "candidate",
        "n_rows",
        "n_distinct",
        "n_runs",
        (
            F.col("n_distinct").cast("double") / F.col("n_runs").cast("double")
        ).alias("clustering_ratio"),
    ).orderBy("candidate")


# --- q297: Wasserstein-1 length shift between sources ------------------------


@query(
    "q297_wasserstein_length_shift",
    oracle=r"""
    WITH hist AS (
        SELECT source,
               CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                    t -> len(t) > 0)) AS BIGINT) AS ln,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ), tots AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY 1
    ), pairs AS (
        SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
        FROM tots a JOIN tots b ON a.source < b.source
    ), ph AS (
        SELECT p.sa, p.sb, p.na, p.nb, h.ln,
               CAST(SUM(CASE WHEN h.source = p.sa THEN h.c ELSE 0 END)
                    AS BIGINT) AS ca,
               CAST(SUM(CASE WHEN h.source = p.sb THEN h.c ELSE 0 END)
                    AS BIGINT) AS cb
        FROM pairs p
        JOIN hist h ON h.source IN (p.sa, p.sb)
        GROUP BY 1, 2, 3, 4, 5
    ), cum AS (
        SELECT sa, sb, na, nb, ln,
               CAST(SUM(ca) OVER w AS BIGINT) AS cuma,
               CAST(SUM(cb) OVER w AS BIGINT) AS cumb,
               COALESCE(lead(ln) OVER w2 - ln, 0) AS gap
        FROM ph
        WINDOW w AS (PARTITION BY sa, sb ORDER BY ln
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w2 AS (PARTITION BY sa, sb ORDER BY ln)
    )
    SELECT sa AS source_a, sb AS source_b, na AS n_a, nb AS n_b,
           CAST(SUM(abs(cuma * nb - cumb * na) * gap) AS BIGINT) AS w1_num,
           CAST(SUM(abs(cuma * nb - cumb * na) * gap) AS DOUBLE)
               / CAST(na * nb AS DOUBLE) AS w1_tokens
    FROM cum
    GROUP BY sa, sb, na, nb
    ORDER BY source_a, source_b
    """,
    tags=("diagnostics", "wasserstein", "drift", "statistics", "llm-pipeline"),
    checkpointed_substrate=True,
)
def q297_wasserstein_length_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise WASSERSTEIN-1 (earth mover's) distance between source
    token-length distributions — the MAGNITUDE-aware member the drift
    family lacked: PSI (q173) and chi-square (q164) bin and take logs,
    KS (q174) is the sup metric, JS (q203) compares token identities;
    W1 answers "by how many TOKENS do the length profiles differ" — the
    number q290's quantile normalization then corrects, read before
    setting source mixing rates.

    NO transcendentals anywhere: on the merged length support,
    W1 = Σ_i |F_A(x_i) − F_B(x_i)|·(x_{i+1} − x_i), accumulated as the
    exact BIGINT cross-multiplication Σ |cumA·nB − cumB·nA|·gap and
    divided ONCE at the end (q174's integer discipline extended from
    max to a gap-weighted sum — exact because the sum is over BIGINTs,
    order-independent). One corpus scan → bounded (source, length)
    histogram (checkpointed); the pair fan-out, cumulative windows and
    the final reduction all run on bounded frames (sources² × distinct
    lengths), the per-pair window exemption. Overflow bound:
    cum·n·Σgap ≤ n²·length_range — at 2^63 that allows ~10⁸ docs per
    source pair at 1e3-token range; beyond that, pre-bin lengths.
    The bound is ENFORCED (r12 advice): an exactness_guard on
    na·nb·(max_ln − min_ln) in the pair frame fails the job loudly
    instead of relying on ANSI overflow, matching q295/q301/q302."""
    from database_migrator_spark.operators.dedup import tokens_of
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    hist = (
        d.select("source", F.size(tokens_of("text")).cast("long").alias("ln"))
        .groupBy("source", "ln")
        .agg(F.count("*").alias("c"))
        # bounded (sources × distinct lengths); pair fan-out + totals
        # both read it — checkpoint so the corpus aggregate runs once
        .localCheckpoint(eager=True)
    )
    tots = hist.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    rng = hist.agg((F.max("ln") - F.min("ln")).cast("long").alias("ln_range"))
    pairs = (
        tots.select(F.col("source").alias("sa"), F.col("n").alias("na"))
        .join(
            tots.select(F.col("source").alias("sb"), F.col("n").alias("nb")),
            F.col("sa") < F.col("sb"),
        )
        .crossJoin(F.broadcast(rng))  # 1-row corpus length range
        .where(
            exactness_guard(
                F.col("na").cast("double")
                * F.col("nb").cast("double")
                * F.col("ln_range").cast("double")
                <= F.lit(9.0e18),
                "q297: W1 accumulator overflows 2^63 "
                "(need nA*nB*(max_len-min_len) < 2^63) — pre-bin lengths",
            )
        )
        .drop("ln_range")
    )
    ph = (
        F.broadcast(pairs)
        .join(hist, F.col("source").isin(F.col("sa"), F.col("sb")))
        .groupBy("sa", "sb", "na", "nb", "ln")
        .agg(
            F.sum(F.when(F.col("source") == F.col("sa"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("ca"),
            F.sum(F.when(F.col("source") == F.col("sb"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("cb"),
        )
    )
    w = (
        Window.partitionBy("sa", "sb")
        .orderBy("ln")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w2 = Window.partitionBy("sa", "sb").orderBy("ln")
    cum = ph.select(
        "sa",
        "sb",
        "na",
        "nb",
        "ln",
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
        F.coalesce(F.lead("ln").over(w2) - F.col("ln"), F.lit(0)).alias("gap"),
    )
    dev = F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")) * F.col("gap")
    return (
        cum.groupBy("sa", "sb", "na", "nb")
        .agg(
            F.sum(dev).cast("long").alias("w1_num"),
            (
                F.sum(dev).cast("double")
                / (F.col("na") * F.col("nb")).cast("double")
            ).alias("w1_tokens"),
        )
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            "w1_num",
            "w1_tokens",
        )
        .orderBy("source_a", "source_b")
    )
