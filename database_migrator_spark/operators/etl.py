"""ETL maintenance operators: SCD2 merge emulation and data-quality
validation — the operators a migration/pipeline engine runs between
queries.

SCD2 without Delta/Iceberg MERGE (jars absent here): the classic
anti-join + union emulation — close changed rows, append new versions,
pass unchanged rows through. One shuffle on the business key; on a real
lakehouse the same logic is a single MERGE INTO.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from database_migrator_spark.functions.exact import exactness_guard, int_div, to_cents
from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import table


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    compare_cols: list[str],
    effective_date: str,
) -> DataFrame:
    """Apply updates to a type-2 dimension ``dim(key, ..., valid_from,
    valid_to)`` (open rows have valid_to NULL). Rows whose compare_cols
    changed are closed at ``effective_date`` and a new open version is
    appended; unchanged and unmatched rows pass through.

    Only OPEN rows participate in change detection and closing — closed
    historical versions pass through untouched, so applying the output of
    one apply as the next apply's input is safe (idempotent on history).
    Change detection is null-safe: NULL→value and value→NULL both count
    as a change instead of silently routing to 'unchanged'.
    """
    # prefix update columns so dim/updates sharing lineage (self-derived
    # updates are common) never produce ambiguous references
    upd = updates.select(
        F.col(key),
        *[F.col(c).alias(f"__u_{c}") for c in updates.columns if c != key],
        F.lit(True).alias("__u_matched"),
    )
    # null-safe attr comparison, gated on an actual update existing —
    # eqNullSafe alone would flag every unmatched dim row as changed
    # (its __u_ columns are NULL from the left join)
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    changed = F.coalesce(F.col("__u_matched"), F.lit(False)) & differs
    attr_cols = [c for c in dim.columns if c not in (key, "valid_from", "valid_to")]
    upd_cols = {c for c in updates.columns if c != key}
    open_rows = dim.where(F.col("valid_to").isNull())
    closed_history = dim.where(F.col("valid_to").isNotNull())
    # Three consumers read this join (closed, new_versions, unchanged);
    # without materialization each re-derives it — measured 8 corpus
    # scans in q60's plan. One dimension-sized checkpoint caps the scans
    # at two per input (a real lakehouse does this as one MERGE INTO,
    # per the module docstring — this is the emulation's equivalent).
    joined = open_rows.join(upd, key, "left").localCheckpoint(eager=True)
    changed_rows = joined.where(changed)
    closed = changed_rows.select(
        *[F.col(c) for c in dim.columns if c != "valid_to"],
        F.lit(effective_date).cast("string").alias("valid_to"),
    )
    # new open version: updated value where the update provides one,
    # otherwise carry the dimension's current attribute forward
    new_versions = changed_rows.select(
        F.col(key),
        *[
            (F.col(f"__u_{c}") if c in upd_cols else F.col(c)).alias(c)
            for c in attr_cols
        ],
        F.lit(effective_date).cast("string").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    unchanged = joined.where(~F.coalesce(changed, F.lit(False))).select(
        *[F.col(c) for c in dim.columns]
    )
    # keys with no current open version (brand-new, or previously deleted)
    # insert as open rows; columns the update doesn't provide are NULL of
    # the dim's type
    inserts = upd.join(open_rows.select(key), key, "left_anti").select(
        F.col(key),
        *[
            (
                F.col(f"__u_{c}") if c in upd_cols
                else F.lit(None).cast(dim.schema[c].dataType)
            ).alias(c)
            for c in attr_cols
        ],
        F.lit(effective_date).cast("string").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    return (
        closed_history.unionByName(unchanged)
        .unionByName(closed)
        .unionByName(new_versions)
        .unionByName(inserts)
    )


@query(
    "q60_scd2_merge",
    oracle="""
    WITH dim AS (
        SELECT c_custkey, c_name, c_acctbal,
               '1990-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
        FROM customer
    ), upd AS (
        SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
        FROM customer WHERE c_custkey % 7 = 0
    ), changed AS (
        SELECT d.* FROM dim d JOIN upd u USING (c_custkey)
        WHERE d.c_acctbal != u.c_acctbal
    )
    SELECT c_custkey, c_name, c_acctbal, valid_from, valid_to FROM (
        -- unchanged rows
        SELECT d.c_custkey, d.c_name, d.c_acctbal, d.valid_from, d.valid_to
        FROM dim d LEFT JOIN upd u USING (c_custkey)
        WHERE u.c_custkey IS NULL OR d.c_acctbal = u.c_acctbal
        UNION ALL
        -- closed old versions
        SELECT c_custkey, c_name, c_acctbal, valid_from, '2024-06-01' FROM changed
        UNION ALL
        -- new open versions
        SELECT u.c_custkey, u.c_name, u.c_acctbal, '2024-06-01', NULL
        FROM upd u JOIN changed c USING (c_custkey)
    )
    ORDER BY c_custkey, valid_from, c_acctbal
    """,
    tags=("scd2", "merge", "etl"),
    checkpointed_substrate=True,
)
def q60_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 upsert emulation over the customer dim: +100.0 balance updates
    for every 7th key close the old row at 2024-06-01 and append an open
    version; hash-matched against the equivalent set algebra in SQL."""
    c = table(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        F.lit("1990-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    updates = c.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", "c_name", (F.col("c_acctbal") + 100.0).alias("c_acctbal")
    )
    out = scd2_apply(dim, updates, "c_custkey", ["c_acctbal"], "2024-06-01")
    return out.select(
        "c_custkey", "c_name", "c_acctbal", "valid_from", "valid_to"
    ).orderBy("c_custkey", "valid_from", "c_acctbal")


@query(
    "q89_pii_redaction",
    oracle=r"""
    SELECT c_custkey,
           concat(regexp_replace(substr(c_name, 1, greatest(length(c_name) - 4, 0)),
                                 '[0-9]', '*', 'g'),
                  substr(c_name, greatest(length(c_name) - 3, 1), 4)) AS masked_name,
           CAST(length(substr(c_name, 1, greatest(length(c_name) - 4, 0)))
                - length(regexp_replace(substr(c_name, 1, greatest(length(c_name) - 4, 0)),
                                        '[0-9]', '', 'g')) AS BIGINT) AS n_redacted,
           md5('pepper:' || c_name) AS pseudonym
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("text", "pii", "redaction", "etl", "llm-pipeline"),
)
def q89_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass — the step every training-data pipeline runs
    before tokenization: mask identifier digits except the last four,
    count redactions, and emit a salted-hash pseudonym for joinability
    after the raw identifier is dropped (here on customer names, the
    only PII-shaped field in the testdata). Pure codegen'd string
    expressions (substr/regexp_replace/md5), zero shuffle before the
    presentation sort; the same expressions drop into any text column —
    identifiers shorter than five characters sit entirely inside the
    keep-last-4 window, and the greatest()-clamped lengths leave them
    unmasked instead of producing engine-dependent negative-length
    substrings (Spark returns '' where DuckDB errors).
    ASCII character classes only, so Java and RE2 regex engines agree;
    DuckDB needs the explicit 'g' flag to match Spark's replace-all
    default."""
    c = table(spark, sf_dir, "customer")
    name = F.col("c_name")
    nlen = F.length(name)
    prefix = name.substr(F.lit(1), F.greatest(nlen - 4, F.lit(0)))
    return c.select(
        "c_custkey",
        F.concat(
            F.regexp_replace(prefix, "[0-9]", "*"),
            name.substr(F.greatest(nlen - 3, F.lit(1)), F.lit(4)),
        ).alias("masked_name"),
        (F.length(prefix) - F.length(F.regexp_replace(prefix, "[0-9]", "")))
        .cast("long")
        .alias("n_redacted"),
        F.md5(F.encode(F.concat(F.lit("pepper:"), name), "UTF-8")).alias("pseudonym"),
    ).orderBy("c_custkey")


@query(
    "q61_data_quality",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM orders)                                   AS n_rows,
      (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)      AS pk_duplicates,
      (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL)          AS pk_nulls,
      (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))           AS fk_orphans,
      (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)           AS nonpositive_prices,
      (SELECT COUNT(*) FROM orders
        WHERE o_orderdate < TIMESTAMP '1990-01-01'
           OR o_orderdate > TIMESTAMP '2030-01-01')                   AS out_of_range_dates
    """,
    tags=("quality", "validation", "etl"),
)
def q61_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit in ONE pass + one anti-join: PK uniqueness and
    nulls, FK orphan count (left-anti against the dim), and range checks —
    the validation block that gates every pipeline promotion. All checks
    are conditional aggregates, so the fact table is scanned once."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey")
    orphans = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(
            F.count("*").alias("fk_orphans")
        )
    )
    audit = o.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("pk_duplicates"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("pk_nulls"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("nonpositive_prices"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
                | (F.col("o_orderdate") > F.lit("2030-01-01").cast("timestamp")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("out_of_range_dates"),
    )
    return audit.crossJoin(orphans).select(
        "n_rows", "pk_duplicates", "pk_nulls", "fk_orphans",
        "nonpositive_prices", "out_of_range_dates",
    )


def snapshot_diff(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Classify the difference between two snapshots of a table into
    added / removed / changed keys — the reconciliation step of every
    CDC / backfill pipeline. The EXCEPT ALLs (linear, replicate-rows
    rewrite — see q64's plan) run over (key, xxhash64(row)) projections,
    so the unavoidable full-table shuffles move 16 bytes/row instead of
    whole rows, and the key classification joins run on the DIFF only.
    A 64-bit row-hash collision would need ~2^32 DIFFERING rows sharing
    a hash — reconciliation diffs are tiny fractions of the table, so
    this is the standard engineering trade. Returns (change_type, key)."""
    def hashed(df: DataFrame) -> DataFrame:
        cols = [c for c in df.columns if c != key]
        return df.select(
            F.col(key), F.xxhash64(*[F.col(c) for c in sorted(cols)]).alias("__rh")
        )

    old_h, new_h = hashed(old), hashed(new)
    # The two one-sided diffs are each consumed TWICE below (changed-key
    # intersect + their own anti-join); without materialization Catalyst
    # re-derives every consumer's whole subtree — measured 24 corpus
    # scans for q80's plan. Checkpointing the DIFF-sized frames (tiny by
    # the reconciliation assumption) caps it at two scans per snapshot
    # side (one per exceptAll direction) with no corpus-sized
    # materialization — the right trade at 100 TB, where persisting the
    # 16 B/row hash projection itself would cost terabytes of storage.
    old_only = old_h.exceptAll(new_h).localCheckpoint(eager=True)
    new_only = new_h.exceptAll(old_h).localCheckpoint(eager=True)
    changed_keys = old_only.select(key).intersect(new_only.select(key))
    removed = old_only.join(changed_keys, key, "left_anti").select(
        F.lit("removed").alias("change_type"), F.col(key)
    )
    added = new_only.join(changed_keys, key, "left_anti").select(
        F.lit("added").alias("change_type"), F.col(key)
    )
    changed = changed_keys.select(F.lit("changed").alias("change_type"), F.col(key))
    return removed.unionByName(added).unionByName(changed)


@query(
    "q79_table_checksum",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(('0x' || substring(md5(
                concat_ws('|', CAST(o_orderkey AS VARCHAR),
                               CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                               o_orderstatus)), 1, 8)) AS BIGINT)) AS BIGINT)
               AS checksum
    FROM orders
    """,
    tags=("etl", "checksum", "reconciliation"),
)
def q79_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum for source↔target reconciliation
    at 100 TB: per-row md5 over a canonical string (exact-cents money),
    folded to 32 bits, SUMMED — integer addition commutes, so partition
    order, retries, and engine never move the result; comparing two
    checksums replaces a full sort-and-diff. md5 is the cross-engine
    anchor (xxhash64 exists only in Spark, hash() only in DuckDB)."""
    o = table(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        to_cents("o_totalprice").cast("string"),
        F.col("o_orderstatus"),
    )
    row_hash = F.conv(F.substring(F.md5(F.encode(canon, "UTF-8")), 1, 8), 16, 10).cast(
        "bigint"
    )
    return o.agg(
        F.count("*").alias("n_rows"), F.sum(row_hash).alias("checksum")
    )


@query(
    "q80_snapshot_diff",
    oracle="""
    WITH oldv AS (
        SELECT c_custkey, c_name, c_acctbal FROM customer
    ), newv AS (
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 31 = 0
                    THEN c_acctbal + CAST(50.0 AS DOUBLE)
                    ELSE c_acctbal END AS c_acctbal
        FROM customer WHERE c_custkey % 97 != 0
        UNION ALL
        SELECT c_custkey + 1000000, c_name, c_acctbal
        FROM customer WHERE c_custkey < 25
    ), old_only AS (
        SELECT * FROM oldv EXCEPT ALL SELECT * FROM newv
    ), new_only AS (
        SELECT * FROM newv EXCEPT ALL SELECT * FROM oldv
    ), chk AS (
        SELECT c_custkey FROM old_only
        INTERSECT
        SELECT c_custkey FROM new_only
    )
    SELECT change_type, c_custkey FROM (
        SELECT 'removed' AS change_type, c_custkey FROM old_only
        WHERE c_custkey NOT IN (SELECT c_custkey FROM chk)
        UNION ALL
        SELECT 'added', c_custkey FROM new_only
        WHERE c_custkey NOT IN (SELECT c_custkey FROM chk)
        UNION ALL
        SELECT 'changed', c_custkey FROM chk
    )
    ORDER BY change_type, c_custkey
    """,
    tags=("etl", "cdc", "diff", "reconciliation"),
    checkpointed_substrate=True,
)
def q80_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff over a simulated table evolution (every 97th key
    deleted, every 31st rebalanced, 25 keys cloned into a new range):
    added/removed/changed classification hash-matched against the same
    set algebra in SQL."""
    c = table(spark, sf_dir, "customer")
    old = c.select("c_custkey", "c_name", "c_acctbal")
    new = (
        c.where(F.col("c_custkey") % 97 != 0)
        .select(
            "c_custkey",
            "c_name",
            F.when(
                F.col("c_custkey") % 31 == 0, F.col("c_acctbal") + F.lit(50.0)
            )
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
        )
        .unionByName(
            c.where(F.col("c_custkey") < 25).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                "c_name",
                "c_acctbal",
            )
        )
    )
    return snapshot_diff(old, new, "c_custkey").orderBy("change_type", "c_custkey")


@query(
    "q165_incremental_agg_refresh",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)                        AS n_events,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total_value,
           MIN(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS min_value,
           MAX(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("etl", "incremental", "partial-aggregate", "merge"),
)
def q165_incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate REFRESH: the production pattern where a
    stored aggregate is updated by MERGING yesterday's partials with
    today's delta instead of rescanning history. The engine computes
    per-type partial aggregates over the history slice (day <= 20) and
    the delta slice (day > 20) SEPARATELY, then merges them with the
    algebraic combine rules (count/sum add, min/max least/greatest,
    full-outer on the group key for types appearing in only one slice).
    The ORACLE aggregates the whole table directly — so the hash gate
    proves the merge is exactly equivalent to a full recompute, which is
    the invariant an incremental pipeline lives on. At 100 TB the
    history side is the stored partial table (no rescan); here both
    sides scan with pushed day filters. Exact-cents everywhere."""
    e = table(spark, sf_dir, "events")

    def partials(df: DataFrame) -> DataFrame:
        cents = F.round(F.col("value") * 100).cast("long")
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(cents).alias("s"),
            F.min(cents).alias("mn"),
            F.max(cents).alias("mx"),
        )
    hist = partials(e.where(F.dayofmonth("ts") <= 20))
    delta = partials(e.where(F.dayofmonth("ts") > 20))
    h = hist.select("event_type", *[F.col(c).alias(f"{c}_h") for c in ("n", "s", "mn", "mx")])
    d = delta.select("event_type", *[F.col(c).alias(f"{c}_d") for c in ("n", "s", "mn", "mx")])
    merged = h.join(d, "event_type", "full_outer")
    zero = F.lit(0).cast("long")
    return merged.select(
        "event_type",
        (F.coalesce("n_h", zero) + F.coalesce("n_d", zero)).alias("n_events"),
        (
            (F.coalesce("s_h", zero) + F.coalesce("s_d", zero)) / F.lit(100.0)
        ).alias("total_value"),
        (F.least("mn_h", "mn_d") / F.lit(100.0)).alias("min_value"),
        (F.greatest("mx_h", "mx_d") / F.lit(100.0)).alias("max_value"),
    ).orderBy("event_type")


def _zspread(e: str, shift_fn) -> str:
    """Bit-spread expression text: 16-bit int -> 32-bit with zeros
    interleaved (Morton encoding step). ``shift_fn(expr, n)`` renders a
    left shift in the target dialect; masks are plain decimal so the
    SAME arithmetic runs on both engines."""
    for sh, mask in ((8, 16711935), (4, 252645135), (2, 858993459), (1, 1431655765)):
        e = f"((({e}) | {shift_fn(e, sh)}) & {mask})"
    return e


def _zorder_sql(dialect: str) -> tuple[str, str]:
    """(z_expr for cents/k, bucket shift) in the given dialect."""
    if dialect == "spark":
        sh = lambda e, n: f"shiftleft(({e}), {n})"
        x = _zspread("cents", sh)
        y = _zspread("k", sh)
        return f"({x} | shiftleft({y}, 1))", "shiftright(z, 26)"
    sh = lambda e, n: f"(({e}) << {n})"
    x = _zspread("cents", sh)
    y = _zspread("k", sh)
    return f"({x} | ({y} << 1))", "(z >> 26)"


_Z_DUCK, _ZB_DUCK = _zorder_sql("duck")
_Z_SPARK, _ZB_SPARK = _zorder_sql("spark")


@query(
    "q188_zorder_layout",
    oracle=f"""
    WITH base AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
        WHERE CAST(ROUND(value * 100) AS BIGINT) BETWEEN 0 AND 65535
          AND CAST(json_extract_string(props, '$.k') AS BIGINT)
              BETWEEN 0 AND 65535
    ), zed AS (
        SELECT cents, k, {_Z_DUCK} AS z FROM base
    )
    SELECT CAST({_ZB_DUCK} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM zed
    GROUP BY 1
    ORDER BY bucket
    """,
    tags=("etl", "zorder", "layout", "data-skipping", "llm-pipeline"),
)
def q188_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton) layout clustering — the multi-dimensional
    data-skipping primitive behind OPTIMIZE ZORDER: interleaving the
    bits of (cents, k) gives a single sort key under which ANY
    contiguous bucket bounds BOTH columns' ranges, so parquet min/max
    zone maps prune files for predicates on either column (a plain sort
    clusters only its leading column). The report groups rows by their
    top-6 Morton bits (64 buckets — the "files" a writer would emit)
    and shows each bucket's per-dimension span; the measurable claim is
    span(bucket) ≪ span(global) on BOTH dims simultaneously. The
    encoding is the classic 4-step mask-spread, identical decimal
    arithmetic on both engines (16-bit inputs guarded by an explicit
    range filter); everything is exact BIGINT. At 100 TB the z key
    feeds a repartitionByRange + sortWithinPartitions write — the
    bucketing here is the verifiable core of that layout."""
    e = table(spark, sf_dir, "events")
    base = (
        e.select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .where(F.col("cents").between(0, 65535) & F.col("k").between(0, 65535))
    )
    zed = base.withColumn("z", F.expr(_Z_SPARK))
    return (
        zed.groupBy(F.expr(_ZB_SPARK).cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("bucket")
    )


@query(
    "q192_column_profile",
    oracle="""
    WITH unp AS (
        SELECT 'o_orderkey' AS col_name,
               lpad(CAST(o_orderkey AS VARCHAR), 20, '0') AS val FROM orders
        UNION ALL
        SELECT 'o_custkey', lpad(CAST(o_custkey AS VARCHAR), 20, '0') FROM orders
        UNION ALL
        SELECT 'o_orderstatus', o_orderstatus FROM orders
        UNION ALL
        SELECT 'o_totalprice',
               lpad(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                    20, '0') FROM orders
        UNION ALL
        SELECT 'o_orderdate', strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', o_orderpriority FROM orders
    ), counts AS (
        SELECT col_name, val, CAST(COUNT(*) AS BIGINT) AS c
        FROM unp GROUP BY 1, 2
    ), prof AS (
        SELECT col_name,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(COALESCE(SUM(c) FILTER (val IS NULL), 0) AS BIGINT)
                   AS n_nulls,
               CAST(COUNT(*) FILTER (val IS NOT NULL) AS BIGINT) AS n_distinct,
               MIN(val) AS min_val, MAX(val) AS max_val
        FROM counts GROUP BY 1
    ), top AS (
        SELECT col_name, val AS top_val, c AS top_count
        FROM counts WHERE val IS NOT NULL
        QUALIFY row_number() OVER (PARTITION BY col_name
                                   ORDER BY c DESC, val) = 1
    )
    SELECT p.col_name, p.n_rows, p.n_nulls, p.n_distinct,
           p.min_val, p.max_val, t.top_val, t.top_count
    FROM prof p JOIN top t USING (col_name)
    ORDER BY col_name
    """,
    tags=("etl", "profiling", "data-quality", "single-pass"),
    checkpointed_substrate=True,
)
def q192_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table column profile — row count, null count, exact
    distinct count, min/max, and the modal value per column — from ONE
    scan of the table: the stats pass every ingest pipeline runs before
    trusting a new drop.  The naive formulation is one COUNT(DISTINCT)
    + min/max + mode query PER COLUMN (6 scans here, hundreds on a wide
    fact table); instead each row is unpivoted (`stack`) into
    (col_name, canonical_value) pairs — one scan, one (col, val)
    shuffle — and every statistic derives from that value-count table.
    Values are canonicalized to strings whose LEXICOGRAPHIC order equals
    the native order (numerics zero-padded to width 20, money in exact
    cents, timestamps ISO), so min/max/mode are engine-independent.
    The per-column mode is a top-1 row_number over the value-count
    table; Spark's rank-limit pushdown (WindowGroupLimit, plan-locked)
    keeps one candidate row per column per map task, so the mode never
    globally sorts a corpus-sized distinct-value table."""
    o = table(spark, sf_dir, "orders")
    pairs = o.select(
        F.expr(
            "stack(6, "
            "'o_orderkey', lpad(CAST(o_orderkey AS STRING), 20, '0'), "
            "'o_custkey', lpad(CAST(o_custkey AS STRING), 20, '0'), "
            "'o_orderstatus', o_orderstatus, "
            "'o_totalprice', lpad(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)"
            " AS STRING), 20, '0'), "
            "'o_orderdate', date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss'), "
            "'o_orderpriority', o_orderpriority"
            ") AS (col_name, val)"
        )
    )
    counts = (
        pairs.groupBy("col_name", "val")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)  # one corpus scan; prof + mode read it
    )
    prof = counts.groupBy("col_name").agg(
        F.sum("c").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("val").isNull(), F.col("c"))), F.lit(0)
        ).alias("n_nulls"),
        F.count(F.when(F.col("val").isNotNull(), F.lit(1))).alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("col_name").orderBy(F.col("c").desc(), "val")
    top = (
        counts.where(F.col("val").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("col_name", F.col("val").alias("top_val"), F.col("c").alias("top_count"))
    )
    return (
        prof.join(F.broadcast(top), "col_name")
        .select(
            "col_name", "n_rows", "n_nulls", "n_distinct",
            "min_val", "max_val", "top_val", "top_count",
        )
        .orderBy("col_name")
    )


@query(
    "q214_referential_integrity",
    oracle="""
    WITH rels AS (
        SELECT 'events.user_id->customer' AS relationship,
               CAST(COUNT(*) AS BIGINT) AS n_child,
               CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_orphans,
               CAST(COUNT(DISTINCT CASE WHEN c.c_custkey IS NULL
                                        THEN e.user_id END) AS BIGINT)
                   AS n_orphan_keys
        FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
        UNION ALL
        SELECT 'lineitem.l_orderkey->orders',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(COUNT(DISTINCT CASE WHEN o.o_orderkey IS NULL
                                        THEN l.l_orderkey END) AS BIGINT)
        FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
        UNION ALL
        SELECT 'lineitem.l_partkey->part',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(COUNT(DISTINCT CASE WHEN p.p_partkey IS NULL
                                        THEN l.l_partkey END) AS BIGINT)
        FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
        UNION ALL
        SELECT 'lineitem.l_suppkey->supplier',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(COUNT(DISTINCT CASE WHEN s.s_suppkey IS NULL
                                        THEN l.l_suppkey END) AS BIGINT)
        FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
        UNION ALL
        SELECT 'orders.o_custkey->customer',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(COUNT(DISTINCT CASE WHEN c.c_custkey IS NULL
                                        THEN o.o_custkey END) AS BIGINT)
        FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT relationship, n_child, n_orphans, n_orphan_keys,
           CAST(n_orphans AS DOUBLE) / CAST(n_child AS DOUBLE) AS orphan_rate
    FROM rels
    ORDER BY relationship
    """,
    tags=("etl", "data-quality", "referential-integrity", "audit"),
    checkpointed_substrate=True,
)
def q214_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit — the FK orphan report a
    warehouse runs after every load (q61 checks WITHIN-table nulls /
    ranges / duplicates; this checks BETWEEN tables): for each declared
    child→parent relationship, total child rows, rows whose key has no
    parent, distinct orphan keys, and the orphan rate. Includes the
    deliberately-unconstrained events.user_id→customer edge — event
    streams are exactly where real pipelines leak unknown actors.

    Shape at scale: each relationship is ONE left join on its key (the
    parent side projected to the key column — Catalyst broadcasts the
    small dims and shuffle-joins the big ones) folded immediately to a
    4-number summary; the lineitem key projection is checkpointed once
    and reused by its three relationship branches instead of re-scanning
    the fact table."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey")
        .localCheckpoint(eager=True)  # 3 relationship branches read it
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey")
    e = table(spark, sf_dir, "events")

    def audit(rel, child, key, parent, pkey):
        j = child.select(F.col(key)).join(
            parent.select(F.col(pkey)).distinct(),
            F.col(key) == F.col(pkey),
            "left",
        )
        orphan = F.col(pkey).isNull()
        return j.agg(
            F.lit(rel).alias("relationship"),
            F.count("*").alias("n_child"),
            F.sum(orphan.cast("long")).alias("n_orphans"),
            F.countDistinct(F.when(orphan, F.col(key))).alias("n_orphan_keys"),
        ).select(
            "relationship",
            "n_child",
            "n_orphans",
            "n_orphan_keys",
            (F.col("n_orphans").cast("double") / F.col("n_child").cast("double")).alias(
                "orphan_rate"
            ),
        )

    parts = [
        audit("events.user_id->customer", e, "user_id", c, "c_custkey"),
        audit("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
        audit("lineitem.l_partkey->part", li, "l_partkey",
              table(spark, sf_dir, "part"), "p_partkey"),
        audit("lineitem.l_suppkey->supplier", li, "l_suppkey",
              table(spark, sf_dir, "supplier"), "s_suppkey"),
        audit("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.orderBy("relationship")


# q224's candidate FDs: a mix of key-implied dependencies that must HOLD
# and plausible-but-false ones that must be measured, over two tables.
_FD_CANDIDATES: list[tuple[str, list[str], str]] = [
    ("orders", ["o_orderkey"], "o_custkey"),
    ("orders", ["o_custkey"], "o_orderstatus"),
    ("orders", ["o_orderdate"], "o_orderpriority"),
    ("lineitem", ["l_orderkey"], "l_suppkey"),
    ("lineitem", ["l_partkey"], "l_suppkey"),
    ("lineitem", ["l_orderkey", "l_linenumber"], "l_partkey"),
]


def _fd_label(tbl: str, lhs: list[str], rhs: str) -> str:
    return f"{tbl}: {','.join(lhs)} -> {rhs}"


def _fd_oracle_block(tbl: str, lhs: list[str], rhs: str) -> str:
    lhs_csv = ", ".join(lhs)
    return f"""
    SELECT '{_fd_label(tbl, lhs, rhs)}' AS fd,
           CAST(SUM(nx) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_lhs,
           CAST(SUM(CASE WHEN n_y > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_lhs,
           CAST(SUM(nx) - SUM(mx) AS BIGINT) AS g3_rows_to_remove,
           CAST(CASE WHEN SUM(CASE WHEN n_y > 1 THEN 1 ELSE 0 END) = 0
                     THEN 1 ELSE 0 END AS BIGINT) AS holds,
           CAST(SUM(nx) - SUM(mx) AS DOUBLE) / CAST(SUM(nx) AS DOUBLE)
               AS g3_error
    FROM (
        SELECT {lhs_csv}, COUNT(*) AS n_y, SUM(c) AS nx, MAX(c) AS mx
        FROM (
            SELECT {lhs_csv}, {rhs}, CAST(COUNT(*) AS BIGINT) AS c
            FROM {tbl} GROUP BY {lhs_csv}, {rhs}
        ) GROUP BY {lhs_csv}
    )"""


@query(
    "q224_functional_dependencies",
    oracle=(
        "\n    UNION ALL\n".join(
            _fd_oracle_block(t, l, r) for t, l, r in _FD_CANDIDATES
        )
        + "\n    ORDER BY fd\n    "
    ),
    tags=("etl", "data-quality", "profiling", "functional-dependency", "audit"),
)
def q224_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit (TANE-style g3 measure) — the
    INTRA-table schema-discovery companion of q192's single-column
    profile and q214's cross-table FK audit: for each candidate
    X -> Y dependency, the number of X groups, how many are violated
    (>= 2 distinct Y), and the EXACT g3 repair cost — the minimum rows
    to delete so the FD holds, Σ_x (group size − modal-Y count), the
    standard approximate-FD error measure. Candidates mix key-implied
    FDs that must hold (o_orderkey -> o_custkey, the composite lineitem
    key) with plausible-but-false ones whose violation rate is the
    signal. Shape at scale: per candidate one (X, Y) count aggregate
    (map-side combinable) feeding one X-keyed re-aggregate — no joins,
    no windows; the six candidates are independent single-table
    pipelines unioned into a 6-row report (a profiling batch scans per
    candidate by design — each scan is column-pruned to X∪Y)."""
    frames = []
    for tbl, lhs, rhs in _FD_CANDIDATES:
        t = table(spark, sf_dir, tbl).select(*lhs, rhs)
        xy = t.groupBy(*lhs, rhs).agg(F.count("*").alias("c"))
        px = xy.groupBy(*lhs).agg(
            F.count("*").alias("n_y"),
            F.sum("c").alias("nx"),
            F.max("c").alias("mx"),
        )
        viol = F.sum((F.col("n_y") > 1).cast("long"))
        frames.append(
            px.agg(
                F.sum("nx").alias("n_rows"),
                F.count("*").alias("n_lhs"),
                viol.alias("n_violating_lhs"),
                (F.sum("nx") - F.sum("mx")).alias("g3_rows_to_remove"),
            ).select(
                F.lit(_fd_label(tbl, lhs, rhs)).alias("fd"),
                "n_rows",
                "n_lhs",
                "n_violating_lhs",
                "g3_rows_to_remove",
                (F.col("n_violating_lhs") == 0).cast("long").alias("holds"),
                (
                    F.col("g3_rows_to_remove").cast("double")
                    / F.col("n_rows").cast("double")
                ).alias("g3_error"),
            )
        )
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out.orderBy("fd")


@query(
    "q228_delete_propagation_audit",
    oracle=r"""
    WITH d AS (
        SELECT doc_id, text, doc_id % 37 = 0 AS del FROM documents
    ), toks AS (
        SELECT doc_id, del,
               list_filter(string_split_regex(lower(text), '\s+'),
                           t -> len(t) > 0) AS t
        FROM d
    ), tf AS (
        SELECT DISTINCT doc_id, del, unnest(t) AS term FROM toks
    ), grams AS (
        SELECT DISTINCT doc_id, del,
               list_aggregate(t[i:i+7], 'string_agg', ' ') AS g
        FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
        WHERE len(t) >= 8
    ), groups AS (
        SELECT md5(text) AS dg, MIN(doc_id) AS keeper,
               COUNT(*) AS n,
               SUM(CASE WHEN del THEN 1 ELSE 0 END) AS n_del
        FROM d GROUP BY 1
    ), rows_ AS (
        SELECT 'documents' AS artifact,
               CAST(SUM(CASE WHEN del THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_invalidated,
               CAST(COUNT(*) AS BIGINT) AS n_total
        FROM d
        UNION ALL
        SELECT 'token_volume',
               CAST(SUM(CASE WHEN del THEN len(t) ELSE 0 END) AS BIGINT),
               CAST(SUM(len(t)) AS BIGINT)
        FROM toks
        UNION ALL
        SELECT 'tf_rows',
               CAST(SUM(CASE WHEN del THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM tf
        UNION ALL
        SELECT 'shingle_rows',
               CAST(SUM(CASE WHEN del THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM grams
        UNION ALL
        SELECT 'dedup_keeper_reelections',
               CAST(SUM(CASE WHEN keeper % 37 = 0 AND n - n_del >= 1
                             THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM groups
    )
    SELECT artifact, n_invalidated, n_total,
           CAST(n_invalidated AS DOUBLE) / n_total AS pct
    FROM rows_
    ORDER BY artifact
    """,
    tags=("etl", "governance", "deletion", "gdpr", "audit", "llm-pipeline"),
)
def q228_delete_propagation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten IMPACT AUDIT — the derived-artifact
    companion of q137's file-level delete propagation: before a
    deletion batch (here doc_id % 37 == 0) is applied, a 100 TB
    pipeline must know what it invalidates downstream. Reports, per
    derived artifact, the invalidated row count and fraction:
    documents, token volume, tf-substrate rows (distinct (doc, term)),
    8-gram shingle rows (q118's definition), and — the subtle one —
    exact-dedup KEEPER RE-ELECTIONS: md5-content groups whose canonical
    representative (min doc_id) is being deleted while survivors
    remain, each of which forces a new canonical downstream. Every
    metric is an exact count from the artifact's defining expression
    (no cached state — the audit must be recomputable standalone).
    Shape at scale: one corpus scan per artifact definition,
    map-side-combinable aggregates, no joins, no windows; the
    dedup-group pass is the same digest shuffle q58 runs."""
    from database_migrator_spark.operators.dedup import tokens_of, word_shingles

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("doc_id") % 37 == 0).alias("del")
    )
    toks = d.select("doc_id", "del", tokens_of("text").alias("t"))
    del_l = F.col("del").cast("long")
    docs_row = d.agg(
        F.sum(del_l).alias("n_invalidated"), F.count("*").alias("n_total")
    ).select(F.lit("documents").alias("artifact"), "n_invalidated", "n_total")
    tok_row = toks.agg(
        F.sum(F.when(F.col("del"), F.size("t")).otherwise(0).cast("long")).alias(
            "n_invalidated"
        ),
        F.sum(F.size("t").cast("long")).alias("n_total"),
    ).select(F.lit("token_volume").alias("artifact"), "n_invalidated", "n_total")
    tf = toks.select("doc_id", "del", F.explode(F.array_distinct("t")).alias("term"))
    tf_row = tf.agg(
        F.sum(del_l).alias("n_invalidated"), F.count("*").alias("n_total")
    ).select(F.lit("tf_rows").alias("artifact"), "n_invalidated", "n_total")
    grams = toks.where(F.size("t") >= 8).select(
        "doc_id",
        "del",
        F.explode(F.array_distinct(word_shingles(F.col("t"), 8))).alias("g"),
    )
    gram_row = grams.agg(
        F.sum(del_l).alias("n_invalidated"), F.count("*").alias("n_total")
    ).select(F.lit("shingle_rows").alias("artifact"), "n_invalidated", "n_total")
    groups = d.groupBy(F.md5("text").alias("dg")).agg(
        F.min("doc_id").alias("keeper"),
        F.count("*").alias("n"),
        F.sum(del_l).alias("n_del"),
    )
    reelect = groups.agg(
        F.sum(
            (
                (F.col("keeper") % 37 == 0) & (F.col("n") - F.col("n_del") >= 1)
            ).cast("long")
        ).alias("n_invalidated"),
        F.count("*").alias("n_total"),
    ).select(
        F.lit("dedup_keeper_reelections").alias("artifact"),
        "n_invalidated",
        "n_total",
    )
    return (
        docs_row.unionByName(tok_row)
        .unionByName(tf_row)
        .unionByName(gram_row)
        .unionByName(reelect)
        .select(
            "artifact",
            "n_invalidated",
            "n_total",
            (
                F.col("n_invalidated").cast("double")
                / F.col("n_total").cast("double")
            ).alias("pct"),
        )
        .orderBy("artifact")
    )


@query(
    "q257_k_anonymity_audit",
    oracle="""
    WITH rel AS (
        SELECT c.c_nationkey AS nation,
               strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS ym,
               o.o_orderpriority AS priority,
               o.o_orderstatus AS status
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cls AS (
        SELECT nation, ym, priority,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(COUNT(DISTINCT status) AS BIGINT) AS l
        FROM rel GROUP BY 1, 2, 3
    ), banded AS (
        SELECT CASE WHEN k = 1 THEN '1:unique'
                    WHEN k < 5 THEN '2:2-4'
                    WHEN k < 10 THEN '3:5-9'
                    ELSE '4:10+' END AS band,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(k) AS BIGINT)   AS n_rows,
               CAST(MIN(l) AS BIGINT)   AS min_l_diversity
        FROM cls GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_rows) AS BIGINT) AS t FROM banded
    )
    SELECT * FROM (
        SELECT band, n_classes, n_rows,
               CAST((n_rows * 1000000000000) // t AS DOUBLE)
                   / 1000000000000.0 AS row_share,
               min_l_diversity
        FROM banded, tot
        UNION ALL
        SELECT 'ALL', CAST(SUM(n_classes) AS BIGINT),
               CAST(SUM(n_rows) AS BIGINT), 1.0,
               CAST(MIN(min_l_diversity) AS BIGINT)
        FROM banded
    ) ORDER BY band
    """,
    tags=("governance", "privacy", "k-anonymity", "audit"),
    checkpointed_substrate=True,
)
def q257_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity + l-diversity release audit (Sweeney; Machanavajjhala
    et al.) — the privacy gate before publishing a derived dataset, next
    to q228's deletion propagation and q137's erasure: treating
    (customer nation, order month, order priority) as the
    quasi-identifier combination a re-identification attacker links on,
    every equivalence class's size k and its sensitive-attribute
    (order status) diversity l are computed exactly, then rolled into
    release-policy bands — '1:unique' rows are directly re-identifiable,
    k<5 classes fail the common k=5 policy, and min_l=1 classes leak
    the sensitive value even when k is large (the homogeneity attack
    l-diversity exists for). The ALL row carries totals and the global
    worst-case l.

    Scale shape: one orders⋈customer key join (both sides unbounded —
    pinned shuffle-merge, never a forced broadcast of a 100 TB-side
    dimension), one (QI) aggregate with map-side combine, then the ≤4-row
    band table (checkpointed; band projection + ALL row). Exactness:
    pure BIGINT counts; row_share is one non-negative floor division."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderpriority", "o_orderstatus"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    rel = o.join(
        c.hint("shuffle_merge"), o["o_custkey"] == c["c_custkey"]
    ).select(
        F.col("c_nationkey").alias("nation"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("ym"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    )
    cls = rel.groupBy("nation", "ym", "priority").agg(
        F.count("*").alias("k"), F.countDistinct("status").alias("l")
    )
    banded = (
        cls.groupBy(
            F.when(F.col("k") == 1, "1:unique")
            .when(F.col("k") < 5, "2:2-4")
            .when(F.col("k") < 10, "3:5-9")
            .otherwise("4:10+")
            .alias("band")
        )
        .agg(
            F.count("*").alias("n_classes"),
            F.sum("k").alias("n_rows"),
            F.min("l").alias("min_l_diversity"),
        )
        .localCheckpoint(eager=True)  # ≤4 rows; band projection + ALL row
    )
    tot = banded.agg(F.sum("n_rows").alias("t"))
    per = banded.crossJoin(F.broadcast(tot)).select(
        "band",
        "n_classes",
        "n_rows",
        (
            int_div(F.col("n_rows") * F.lit(1_000_000_000_000), F.col("t")).cast(
                "double"
            )
            / F.lit(1e12)
        ).alias("row_share"),
        "min_l_diversity",
    )
    allr = banded.agg(
        F.sum("n_classes").alias("n_classes"),
        F.sum("n_rows").alias("n_rows"),
        F.min("min_l_diversity").alias("min_l_diversity"),
    ).select(
        F.lit("ALL").alias("band"),
        "n_classes",
        "n_rows",
        F.lit(1.0).alias("row_share"),
        "min_l_diversity",
    )
    return per.unionByName(allr).orderBy("band")


@query(
    "q264_randomized_response_release",
    oracle="""
    WITH base AS (
        SELECT o_orderpriority AS priority,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS truth,
               CASE WHEN CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                                                 || '-rr'), 1, 4)
                         AS BIGINT) % 4 = 0 THEN 1 ELSE 0 END AS flip
        FROM orders
    ), rep AS (
        SELECT priority, truth,
               CASE WHEN flip = 1 THEN 1 - truth ELSE truth END AS reported
        FROM base
    ), agg AS (
        SELECT priority,
               CAST(COUNT(*) AS BIGINT)      AS n,
               CAST(SUM(truth) AS BIGINT)    AS true_pos,
               CAST(SUM(reported) AS BIGINT) AS released_pos
        FROM rep GROUP BY 1
    )
    SELECT priority, n, true_pos, released_pos,
           CAST(4 * released_pos - n AS DOUBLE) / 2.0 AS dp_estimate,
           ABS(CAST(4 * released_pos - n AS DOUBLE) / 2.0
               - CAST(true_pos AS DOUBLE)) AS abs_err
    FROM agg ORDER BY priority
    """,
    tags=("governance", "privacy", "differential-privacy", "randomized-response"),
)
def q264_randomized_response_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-DP randomized response (Warner 1965; the RAPPOR primitive) —
    the privacy mechanism a telemetry/training-data release applies
    BEFORE aggregation, completing the governance family next to q257's
    k-anonymity audit and q137's erasure: each row reports its sensitive
    bit (order is in final status) truthfully with p = 3/4 and flipped
    with 1 - p = 1/4 (ε = ln 3 local DP), the flip decision being the
    engine-reproducible md5 coin (q121's recipe — slice the row-key
    digest, mod 4); the release then publishes the per-group debiased
    estimator (obs − n(1−p)) / (2p − 1) = (4·obs − n) / 2 next to the
    true count the curator still holds, so the report shows exactly what
    utility the DP release trades away (abs_err). Every quantity is
    BIGINT until the final ×1/2 — both engines divide the same exact
    integer, so the hash gate certifies the whole mechanism.

    Scale shape: one scan, one map-side-combinable 5-group aggregate —
    no joins, no windows; the md5 coin is per-row codegen, deterministic
    across retries/re-plans (a seeded rand() would not survive either
    engine's re-execution semantics)."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("truth"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit("-rr"))),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 4
            == 0
        ).alias("flip"),
    )
    rep = o.select(
        "priority",
        "truth",
        F.when(F.col("flip"), 1 - F.col("truth")).otherwise(F.col("truth")).alias(
            "reported"
        ),
    )
    agg = rep.groupBy("priority").agg(
        F.count("*").alias("n"),
        F.sum("truth").alias("true_pos"),
        F.sum("reported").alias("released_pos"),
    )
    est = (F.lit(4) * F.col("released_pos") - F.col("n")).cast("double") / F.lit(2.0)
    return agg.select(
        "priority",
        "n",
        "true_pos",
        "released_pos",
        est.alias("dp_estimate"),
        F.abs(est - F.col("true_pos").cast("double")).alias("abs_err"),
    ).orderBy("priority")


# --- q271: incremental join-view maintenance (delta rules) ------------------

_IVM_CUTOFF = "1997-01-01"


@query(
    "q271_join_view_delta_refresh",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
             / 100.0 AS revenue
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN customer ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    ORDER BY segment
    """,
    tags=("etl", "ivm", "incremental", "materialized-view"),
    checkpointed_substrate=True,
)
def q271_join_view_delta_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view by the classic delta rules:
    the revenue-by-segment view V = γ(O ⋈ L ⋈ C) is refreshed from a
    MATERIALIZED base aggregate over the historical halves (O_old ⋈
    L_old, emulated by an eager localCheckpoint — in production this is
    the stored view) plus the three delta terms ΔO⋈L_old, O_old⋈ΔL and
    ΔO⋈ΔL, where Δ = rows past the refresh cutoff. The four partial
    aggregates (exact integer-cents, so the merge is order-independent)
    union into ONE final re-aggregation — the oracle recomputes the view
    from scratch, proving base + deltas ≡ full recompute bit-for-bit.
    Scale shape: the delta scans carry pushed-down date predicates (at
    100 TB the deltas are a day's partitions, not the corpus); the
    customer dim broadcasts; only the base term — computed once, then
    served from the materialization — touches full history."""
    cutoff = F.lit(_IVM_CUTOFF).cast("timestamp")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", (F.col("o_orderdate") < cutoff).alias("o_old")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        to_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_c"),
        (F.col("l_shipdate") < cutoff).alias("l_old"),
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )

    def part(o_side: DataFrame, l_side: DataFrame) -> DataFrame:
        """One partial aggregate γ_segment(o_side ⋈ l_side ⋈ C)."""
        return (
            o_side.join(l_side, o_side["o_orderkey"] == l_side["l_orderkey"])
            .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("segment")
            .agg(F.count("*").alias("n"), F.sum("rev_c").alias("cents"))
        )

    o_old, o_new = o.where("o_old"), o.where("NOT o_old")
    l_old, l_new = li.where("l_old"), li.where("NOT l_old")
    # the stored view: computed once over history, then read back — the
    # refresh never re-joins the historical halves
    base = part(o_old, l_old).localCheckpoint(eager=True)
    refreshed = (
        base.unionByName(part(o_new, l_old))
        .unionByName(part(o_old, l_new))
        .unionByName(part(o_new, l_new))
        .groupBy("segment")
        .agg(
            F.sum("n").alias("n_lines"),
            (F.sum("cents") / F.lit(100.0)).alias("revenue"),
        )
    )
    return refreshed.orderBy("segment")


# --- q277: zone-map prunability audit ---------------------------------------
#
# Two candidate layouts for the same rows: "arrival" files chunk by order
# key (insertion order), "clustered" files are shipdate-month partitions.
# The audit evaluates the monthly predicate workload against each
# layout's per-file min/max zone maps — the data-skipping decision every
# lakehouse table service makes before rewriting a table (q188 builds a
# 2D z-order layout; this measures what a layout is worth for a workload).
_ZONE_ARRIVAL_CHUNK = 4096  # orders per arrival file


@query(
    "q277_zone_map_prunability",
    oracle=f"""
    WITH base AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
                   AS d,
               strftime(l_shipdate, '%Y-%m') AS m,
               l_orderkey // {_ZONE_ARRIVAL_CHUNK} AS arrival_file
        FROM lineitem
    ), files AS (
        SELECT layout, file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(d) AS BIGINT) AS min_d, CAST(MAX(d) AS BIGINT) AS max_d
        FROM (
            SELECT 'arrival' AS layout, CAST(arrival_file AS VARCHAR) AS file_id, d
            FROM base
            UNION ALL
            SELECT 'clustered' AS layout, m AS file_id, d FROM base
        ) GROUP BY layout, file_id
    ), months AS (
        -- the monthly workload frame IS the clustered layout's zone maps
        SELECT file_id AS m, min_d AS m_start, max_d AS m_end,
               n_rows AS true_rows
        FROM files WHERE layout = 'clustered'
    ), hit AS (
        SELECT f.layout, mo.m, mo.true_rows,
               CAST(COUNT(*) FILTER (WHERE f.min_d <= mo.m_end
                                       AND f.max_d >= mo.m_start) AS BIGINT)
                   AS files_hit,
               CAST(COUNT(*) AS BIGINT) AS files_total,
               CAST(COALESCE(SUM(f.n_rows) FILTER (WHERE f.min_d <= mo.m_end
                                       AND f.max_d >= mo.m_start), 0) AS BIGINT)
                   AS rows_scanned
        FROM files f CROSS JOIN months mo
        GROUP BY f.layout, mo.m, mo.true_rows
    )
    SELECT layout, m AS month, files_total, files_hit, rows_scanned,
           true_rows,
           CAST(rows_scanned - true_rows AS DOUBLE)
               / CAST(rows_scanned AS DOUBLE) AS waste_ratio
    FROM hit
    ORDER BY layout, month
    """,
    tags=("etl", "zone-map", "data-skipping", "layout"),
    checkpointed_substrate=True,
)
def q277_zone_map_prunability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max data-skipping) prunability audit — the
    measurement a lakehouse table service runs before deciding a
    re-clustering rewrite is worth it: the SAME lineitem rows land in
    two candidate layouts ('arrival' files chunked by order key, i.e.
    insertion order, vs 'clustered' shipdate-month partitions), per-file
    min/max zone maps are collected for the ship-date column, and the
    monthly-range predicate workload is evaluated against each layout:
    files hit, rows a zone-map-pruned scan must read, the true matching
    rows, and the wasted-scan ratio. One corpus scan builds BOTH
    layouts' zone maps (the layout tag is exploded per row before ONE
    aggregate); everything after is bounded (files × months). At 100 TB
    zone maps are O(files) — this is exactly the footprint the audit
    has there too."""
    li = table(spark, sf_dir, "lineitem").select(
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date")).alias("d"),
        F.date_format("l_shipdate", "yyyy-MM").alias("m"),
        F.expr(f"l_orderkey DIV {_ZONE_ARRIVAL_CHUNK}L").alias("arrival_file"),
    )
    tagged = li.select(
        "d",
        "m",
        F.explode(
            F.array(
                F.struct(
                    F.lit("arrival").alias("layout"),
                    F.col("arrival_file").cast("string").alias("file_id"),
                ),
                F.struct(
                    F.lit("clustered").alias("layout"), F.col("m").alias("file_id")
                ),
            )
        ).alias("t"),
    )
    files = (
        tagged.groupBy(F.col("t.layout").alias("layout"), F.col("t.file_id").alias("file_id"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("d").alias("min_d"),
            F.max("d").alias("max_d"),
        )
        .localCheckpoint(eager=True)  # bounded zone-map frame, one corpus scan
    )
    # the monthly workload frame IS the clustered layout's own zone maps —
    # no second corpus scan
    months = files.where(F.col("layout") == "clustered").select(
        F.col("file_id").alias("m"),
        F.col("min_d").alias("m_start"),
        F.col("max_d").alias("m_end"),
        F.col("n_rows").alias("true_rows"),
    )
    hit_cond = (F.col("min_d") <= F.col("m_end")) & (F.col("max_d") >= F.col("m_start"))
    hit = (
        files.crossJoin(F.broadcast(months))
        .groupBy("layout", "m", "true_rows")
        .agg(
            F.sum(F.when(hit_cond, 1).otherwise(0)).alias("files_hit"),
            F.count("*").alias("files_total"),
            F.coalesce(
                F.sum(F.when(hit_cond, F.col("n_rows"))), F.lit(0).cast("long")
            ).alias("rows_scanned"),
        )
    )
    return hit.select(
        "layout",
        F.col("m").alias("month"),
        "files_total",
        "files_hit",
        "rows_scanned",
        "true_rows",
        (
            (F.col("rows_scanned") - F.col("true_rows")).cast("double")
            / F.col("rows_scanned").cast("double")
        ).alias("waste_ratio"),
    ).orderBy("layout", "month")


# --- q282: compaction bin-packing planner (FFD) -----------------------------
#
# First-Fit-Decreasing over the small-file inventory — the greedy the
# table services run for OPTIMIZE/compaction. The inventory is a bounded
# derived frame (one row per ~64-doc input file), so the sequential
# greedy folds over ONE collected array — the same bounded-planning
# stance as sources/sink.py's compaction planner; the corpus itself is
# touched only by the size aggregate.
_PACK_FILE_DOCS = 64
_PACK_CAP = 65_536  # target compacted-file size (chars)


@query(
    "q282_compaction_bin_packing",
    oracle=f"""
    WITH RECURSIVE files AS (
        SELECT doc_id // {_PACK_FILE_DOCS} AS file_id,
               CAST(SUM(n_chars) AS BIGINT) AS sz
        FROM documents GROUP BY 1
    ), ordered AS (
        SELECT file_id, sz,
               row_number() OVER (ORDER BY sz DESC, file_id) AS rn
        FROM files
    ), nf AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST((SUM(sz) + {_PACK_CAP - 1}) // {_PACK_CAP} AS BIGINT) AS lb
        FROM files
    ),
    pack(step, loads, nfs) AS (
        SELECT 0, CAST([] AS BIGINT[]), CAST([] AS BIGINT[])
        UNION ALL
        SELECT p.step + 1,
               CASE WHEN list_position(list_transform(p.loads,
                            l -> l + o.sz <= {_PACK_CAP}), true) = 0
                    THEN list_append(p.loads, o.sz)
                    ELSE list_slice(p.loads, 1,
                             list_position(list_transform(p.loads,
                                 l -> l + o.sz <= {_PACK_CAP}), true) - 1)
                         || [p.loads[list_position(list_transform(p.loads,
                                 l -> l + o.sz <= {_PACK_CAP}), true)] + o.sz]
                         || list_slice(p.loads,
                             list_position(list_transform(p.loads,
                                 l -> l + o.sz <= {_PACK_CAP}), true) + 1,
                             len(p.loads))
               END,
               CASE WHEN list_position(list_transform(p.loads,
                            l -> l + o.sz <= {_PACK_CAP}), true) = 0
                    THEN list_append(p.nfs, CAST(1 AS BIGINT))
                    ELSE list_slice(p.nfs, 1,
                             list_position(list_transform(p.loads,
                                 l -> l + o.sz <= {_PACK_CAP}), true) - 1)
                         || [p.nfs[list_position(list_transform(p.loads,
                                 l -> l + o.sz <= {_PACK_CAP}), true)] + 1]
                         || list_slice(p.nfs,
                             list_position(list_transform(p.loads,
                                 l -> l + o.sz <= {_PACK_CAP}), true) + 1,
                             len(p.nfs))
               END
        FROM pack p JOIN ordered o ON o.rn = p.step + 1
    ), final AS (
        SELECT unnest(generate_series(1, len(loads))) AS bin, loads, nfs
        FROM pack, nf WHERE step = n
    )
    SELECT CAST(f.bin AS BIGINT) AS bin,
           f.nfs[f.bin] AS n_files,
           f.loads[f.bin] AS load,
           f.loads[f.bin] / CAST({_PACK_CAP} AS DOUBLE) AS fill,
           CAST(len(f.loads) AS BIGINT) AS n_bins,
           nf.lb AS lb_bins
    FROM final f, nf
    ORDER BY bin
    """,
    tags=("etl", "compaction", "bin-packing", "planner"),
)
def q282_compaction_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction PLANNER — First-Fit-Decreasing bin packing of the
    small-file inventory into target-capacity output files, the greedy
    every lakehouse OPTIMIZE implements (q135 executes a compaction;
    this plans one and reports its quality): files sorted by size
    descending fold through a bin-load accumulator (first bin that
    fits, else open a new bin — one array-accumulator HOF fold over the
    BOUNDED inventory collected to a single planning row, exactly the
    driver-side footprint sink.py's planner has), emitting per-bin file
    counts, loads and fill ratios next to the LP lower bound
    ⌈Σsize/cap⌉ — FFD is guaranteed within 11/9·OPT + 6/9 of it. The
    DuckDB oracle replays the identical greedy as a recursive CTE over
    list state (both engines' list_position return 0 for 'no fit' —
    measured, not assumed). Corpus work is ONE size aggregate; the
    fold's cost is O(files · bins), independent of row count."""
    d = table(spark, sf_dir, "documents").select(
        F.expr(f"doc_id DIV {_PACK_FILE_DOCS}L").alias("file_id"), "n_chars"
    )
    files = d.groupBy("file_id").agg(F.sum("n_chars").alias("sz"))
    inv = files.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("sz")).alias("k1"),
                    F.col("file_id").alias("k2"),
                    F.col("sz").alias("sz"),
                )
            )
        ).alias("inv"),
        F.sum("sz").alias("total"),
        F.count("*").alias("n_files_in"),
    )
    empty = F.array().cast("array<bigint>")
    acc0 = F.struct(empty.alias("loads"), empty.alias("nfs"))

    def step(acc, f):
        sz = f["sz"]
        idx = F.array_position(
            F.transform(acc["loads"], lambda l: l + sz <= F.lit(_PACK_CAP)),
            F.lit(True),
        )
        i = idx.cast("int")
        upd = lambda arr, inc: F.when(  # noqa: E731
            idx == 0, F.concat(arr, F.array(inc(F.lit(0).cast("long"), True)))
        ).otherwise(
            F.concat(
                F.slice(arr, 1, i - 1),
                F.array(inc(F.element_at(arr, i), False)),
                F.slice(arr, i + 1, F.size(arr) - i),
            )
        )
        new_loads = upd(acc["loads"], lambda cur, fresh: (cur + sz))
        new_nfs = upd(acc["nfs"], lambda cur, fresh: (cur + 1))
        return F.struct(new_loads.alias("loads"), new_nfs.alias("nfs"))

    packed = inv.select(
        F.aggregate(F.col("inv"), acc0, step).alias("p"),
        F.expr(f"(total + {_PACK_CAP - 1}L) DIV {_PACK_CAP}L").alias("lb_bins"),
    )
    return (
        packed.select(
            F.posexplode(F.arrays_zip(F.col("p.loads"), F.col("p.nfs"))).alias(
                "pos", "z"
            ),
            F.size("p.loads").cast("long").alias("n_bins"),
            "lb_bins",
        )
        .select(
            (F.col("pos") + 1).cast("long").alias("bin"),
            F.col("z.nfs").alias("n_files"),
            F.col("z.loads").alias("load"),
            (F.col("z.loads") / F.lit(float(_PACK_CAP))).alias("fill"),
            "n_bins",
            "lb_bins",
        )
        .orderBy("bin")
    )


# --- q285: column encoding advisor ------------------------------------------


@query(
    "q285_encoding_advisor",
    oracle="""
    WITH cols AS (
        SELECT 'o_orderstatus' AS col, o_orderstatus AS v FROM orders
        UNION ALL
        SELECT 'o_orderpriority', o_orderpriority FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'o_orderkey', CAST(o_orderkey AS VARCHAR) FROM orders
    ), stats AS (
        SELECT col,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
               CAST(SUM(len(v)) AS BIGINT) AS plain_bytes
        FROM cols GROUP BY col
    ), dictsz AS (
        SELECT col, CAST(SUM(len(v)) AS BIGINT) AS dict_entry_bytes
        FROM (SELECT DISTINCT col, v FROM cols) GROUP BY col
    ), est AS (
        SELECT s.col AS col, s.n_rows, s.n_distinct, s.plain_bytes,
               d.dict_entry_bytes
                 + s.n_rows * (CASE WHEN s.n_distinct <= 256 THEN 1
                                    WHEN s.n_distinct <= 65536 THEN 2
                                    WHEN s.n_distinct <= 16777216 THEN 3
                                    ELSE 4 END) AS dict_bytes
        FROM stats s JOIN dictsz d ON s.col = d.col
    )
    SELECT col, n_rows, n_distinct, plain_bytes, dict_bytes,
           CAST(dict_bytes AS DOUBLE) / CAST(plain_bytes AS DOUBLE)
               AS dict_ratio,
           CASE WHEN dict_bytes < plain_bytes THEN 'dictionary'
                ELSE 'plain' END AS advice
    FROM est
    ORDER BY col
    """,
    tags=("etl", "encoding", "advisor", "physical-design"),
    checkpointed_substrate=True,
)
def q285_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column ENCODING advisor — the dictionary-vs-plain estimate a
    columnar writer (Parquet/ORC) makes per column chunk, surfaced as a
    table-level advisory (the physical-design family next to q277 zone
    maps, q282 compaction, q188 z-order): per candidate column, the
    exact plain-encoded byte count, the dictionary estimate
    (distinct-entry bytes + n_rows · ⌈log₂(max(d,2))/8⌉ index bytes),
    their ratio, and the verdict. Low-cardinality strings win huge
    (status: 1 byte/row), near-unique keys lose — exactly the signal
    that drives real writer heuristics. ONE corpus scan (the candidates
    explode per row before the checkpoint), two bounded aggregates over
    it; index width via a pure-INTEGER threshold ladder (d≤2^8→1,
    ≤2^16→2, ≤2^24→3, else 4) on both engines — a float CEIL(log) would
    flip on a 1-ulp libm skew exactly at d=2^(8k)."""
    o = table(spark, sf_dir, "orders")
    pair = lambda name, col: F.struct(  # noqa: E731
        F.lit(name).alias("col"), col.cast("string").alias("v")
    )
    cols = (
        o.select(
            F.explode(
                F.array(
                    pair("o_orderstatus", F.col("o_orderstatus")),
                    pair("o_orderpriority", F.col("o_orderpriority")),
                    pair("o_custkey", F.col("o_custkey")),
                    pair("o_orderkey", F.col("o_orderkey")),
                )
            ).alias("t")
        )
        .select(F.col("t.col").alias("col"), F.col("t.v").alias("v"))
        # ONE orders scan builds the unpivot; stats + dictionary sizes re-read it
        .localCheckpoint(eager=True)
    )
    stats = cols.groupBy("col").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("v").alias("n_distinct"),
        F.sum(F.length("v")).alias("plain_bytes"),
    )
    dictsz = (
        cols.distinct()
        .groupBy("col")
        .agg(F.sum(F.length("v")).alias("dict_entry_bytes"))
    )
    # pure-integer ⌈log₂(max(d,2))/8⌉: a runtime float log near the hash
    # is the exact hazard the q292 invariant bans (a 1-ulp libm skew
    # flips CEIL when d lands on 2^(8k)) — CASE ladder on both sides
    idx_bytes = (
        F.when(F.col("n_distinct") <= 256, F.lit(1))
        .when(F.col("n_distinct") <= 65536, F.lit(2))
        .when(F.col("n_distinct") <= 16777216, F.lit(3))
        .otherwise(F.lit(4))
        .cast("long")
    )
    est = stats.join(dictsz, "col").select(
        "col",
        "n_rows",
        "n_distinct",
        "plain_bytes",
        (F.col("dict_entry_bytes") + F.col("n_rows") * idx_bytes).alias("dict_bytes"),
    )
    return est.select(
        "col",
        "n_rows",
        "n_distinct",
        "plain_bytes",
        "dict_bytes",
        (
            F.col("dict_bytes").cast("double") / F.col("plain_bytes").cast("double")
        ).alias("dict_ratio"),
        F.when(F.col("dict_bytes") < F.col("plain_bytes"), "dictionary")
        .otherwise("plain")
        .alias("advice"),
    ).orderBy("col")


# q310's probe columns: every id-shaped integer column across the ten
# tables (keys, FKs, plus two deliberate non-keys — p_size, n_chars —
# whose accidental overlaps demonstrate why discovered INDs are
# CANDIDATES, not facts).  Shared verbatim by the Spark builder and the
# generated oracle text so both engines probe the identical column set.
_IND_COLUMNS: list[tuple[str, str]] = [
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("nation", "n_regionkey"),
    ("customer", "c_custkey"),
    ("customer", "c_nationkey"),
    ("supplier", "s_suppkey"),
    ("supplier", "s_nationkey"),
    ("part", "p_partkey"),
    ("part", "p_size"),
    ("orders", "o_orderkey"),
    ("orders", "o_custkey"),
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("lineitem", "l_linenumber"),
    ("events", "event_id"),
    ("events", "user_id"),
    ("documents", "doc_id"),
    ("documents", "n_chars"),
    ("embeddings", "vec_id"),
    ("embeddings", "label"),
]


def inclusion_dependencies(vals: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Sindy-style unary inclusion-dependency discovery over a
    ``(col: string, v: long)`` value stream (duplicates allowed).

    One value-keyed aggregate folds each distinct value's attribute set
    into a BIGINT bitmask (``bit_or`` dedups columns, so no pre-distinct
    pass is needed); the mask HISTOGRAM then bounds all downstream work
    (|masks| ≤ 2^n_columns regardless of corpus size — the reason this
    never degenerates into a values x values self-join).  Exact distinct
    counts per column and per-ordered-pair co-occurrence counts are both
    Σ cnt over the histogram.  containment(a->b) = |A∩B| / |A| in floor
    ppm; ``is_candidate_fk`` marks exact subsets (n_inter = n_a) — no
    tolerance constant to go stale.

    The caller must reuse one physical build of the bounded mask
    histogram for both branches (counts + pairs); q310 localCheckpoints
    it.  Returns ``(mask_counts, col_ids)``: the histogram plus the
    bounded cid→name mapping the report stage needs."""
    from pyspark.sql import Window

    col_ids = (
        vals.select("col")
        .distinct()
        .withColumn("cid", F.row_number().over(Window.orderBy("col")) - 1)
        # single-partition window: bounded derived table (≤ n_columns
        # rows), the sanctioned exception.  cid ≥ 63 would overflow the
        # BIGINT mask — fail loudly, never silently.
        .where(
            exactness_guard(
                F.col("cid") < 63,
                "inclusion_dependencies: more than 63 probe columns — "
                "the BIGINT attribute bitmask is full; shard the column "
                "set",
            )
        )
        .localCheckpoint(eager=True)
    )
    with_ids = vals.join(F.broadcast(col_ids), "col").select("cid", "v")
    return ind_mask_histogram(with_ids), col_ids


def ind_mask_histogram(vals_ids: DataFrame) -> DataFrame:
    """(cid, v) value stream → bounded attribute-set histogram
    ``(mask, cnt)``: one value-keyed shuffle with map-side partial
    ``bit_or`` folds each distinct value's column set into a BIGINT
    bitmask (8 bytes of aggregate state vs the former
    ``collect_set<string>`` array — guide §2.3, narrower shuffle), and
    the mask histogram then collapses the distinct-value-scale frame to
    ≤ 2^n_columns rows BEFORE any pair expansion, so the ≤ n² per-mask
    fan-out runs over a bounded table instead of per distinct value."""
    masks = (
        vals_ids.where(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.bit_or(F.expr("shiftleft(1L, cid)")).alias("mask"))
    )
    return masks.groupBy("mask").agg(F.count("*").alias("cnt"))


def _ind_report(mask_counts: DataFrame, col_ids: DataFrame) -> DataFrame:
    """Bounded report stage over the (mask, cnt) histogram: per-column
    distinct counts and per-ordered-pair co-occurrence counts are both
    Σ cnt over the masks containing the relevant bit(s) — every frame
    here is ≤ 2^n_columns rows, independent of corpus size."""
    bits = F.expr("filter(sequence(0, 62), i -> (shiftright(mask, i) & 1) = 1)")
    counts = (
        mask_counts.select(F.explode(bits).alias("cid"), "cnt")
        .groupBy("cid")
        .agg(F.sum("cnt").cast("long").alias("n"))
    )
    # names + counts fused once (≤ 63 rows, read by both pair sides)
    aug = counts.join(F.broadcast(col_ids), "cid").localCheckpoint(eager=True)
    pairs = (
        mask_counts.select(bits.alias("bits"), "cnt")
        .select(F.explode("bits").alias("a_cid"), "bits", "cnt")
        .select("a_cid", F.explode("bits").alias("b_cid"), "cnt")
        .where(F.col("a_cid") != F.col("b_cid"))
        .groupBy("a_cid", "b_cid")
        .agg(F.sum("cnt").cast("long").alias("n_inter"))
    )
    return (
        pairs.join(
            F.broadcast(
                aug.select(
                    F.col("cid").alias("a_cid"),
                    F.col("col").alias("a_col"),
                    F.col("n").alias("n_a"),
                )
            ),
            "a_cid",
        )
        .join(
            F.broadcast(
                aug.select(
                    F.col("cid").alias("b_cid"),
                    F.col("col").alias("b_col"),
                    F.col("n").alias("n_b"),
                )
            ),
            "b_cid",
        )
        .select(
            "a_col",
            "b_col",
            "n_a",
            "n_b",
            "n_inter",
            int_div(F.col("n_inter") * F.lit(1_000_000), F.col("n_a")).alias(
                "containment_ppm"
            ),
            (F.col("n_inter") == F.col("n_a")).cast("long").alias("is_candidate_fk"),
        )
        .orderBy("a_col", "b_col")
    )


def _ind_oracle() -> str:
    branches = "\n      UNION ALL\n      ".join(
        f"SELECT DISTINCT '{t}.{c}' AS col, CAST({c} AS BIGINT) AS v "
        f"FROM {t} WHERE {c} IS NOT NULL"
        for t, c in _IND_COLUMNS
    )
    return f"""
    WITH vals AS (
      {branches}
    ), counts AS (
        SELECT col, CAST(COUNT(*) AS BIGINT) AS n FROM vals GROUP BY col
    ), inter AS (
        SELECT a.col AS a_col, b.col AS b_col,
               CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM vals a JOIN vals b ON a.v = b.v AND a.col <> b.col
        GROUP BY 1, 2
    )
    SELECT i.a_col, i.b_col, ca.n AS n_a, cb.n AS n_b, i.n_inter,
           CAST(i.n_inter * 1000000 // ca.n AS BIGINT) AS containment_ppm,
           CAST(CASE WHEN i.n_inter = ca.n THEN 1 ELSE 0 END AS BIGINT)
               AS is_candidate_fk
    FROM inter i
    JOIN counts ca ON i.a_col = ca.col
    JOIN counts cb ON i.b_col = cb.col
    ORDER BY a_col, b_col
    """


@query(
    "q310_inclusion_dependency_discovery",
    oracle=_ind_oracle(),
    tags=("etl", "profiling", "schema-discovery", "inclusion-dependency"),
    checkpointed_substrate=True,
)
def q310_inclusion_dependency_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table JOINABILITY discovery (unary inclusion dependencies,
    the Sindy/SPIDER algorithm class) — completes the schema-discovery
    family: q192 profiles single columns, q224 finds FDs WITHIN a
    table, q214 audits KNOWN FKs; this DISCOVERS candidate FKs across
    all ten tables, the first question against an undocumented data
    lake ("which columns can I join?").

    For every ordered pair of the 21 id-shaped integer columns,
    containment |A∩B|/|A| over exact distinct value sets, floor ppm;
    ``is_candidate_fk`` = exact subset.  True FKs surface at exactly
    1,000,000 (o_custkey -> c_custkey, l_orderkey -> o_orderkey,
    n_regionkey -> r_regionkey ...), reverse directions and accidental
    overlaps (p_size, n_chars, small-domain labels) fill a ~400-row
    spectrum — probed live at all three SFs (72-99 distinct ppm
    values) before registering.

    Shape at scale (Sindy's one-pass MR shape): 21 column-pruned scans
    union into a (cid, v) stream — a 4-byte static column id, never the
    name string; ONE value-keyed shuffle with map-side partial
    ``bit_or`` folds each value's attribute set into a BIGINT bitmask
    (8 bytes of aggregate state, never a values x values self-join),
    and the checkpointed substrate is the mask HISTOGRAM — ≤ 2^21 rows
    independent of corpus size — which feeds both the exact per-column
    distinct counts and the ≤ 441-per-mask pair expansion; the fused
    count+name frame is column-domain-bounded (≤ 21 rows), attached
    via broadcast.  ppm fixed point:
    n_inter * 1e6 <= 1e16 at 1e10 distinct keys — no 2^63 hazard.
    DuckDB `//` truncates but both operands are non-negative, so it
    equals int_div's floor on both engines."""
    # cids are assigned statically (the column set is the declared
    # constant _IND_COLUMNS), so the corpus-scale union carries a 4-byte
    # cid instead of a ~20-byte table.column string and needs no
    # name-attach join before the value shuffle (guide §2.3: shuffle
    # keys and metadata, narrow types).
    frames = [
        table(spark, sf_dir, t).select(
            F.lit(i).cast("int").alias("cid"), F.col(c).cast("long").alias("v")
        )
        for i, (t, c) in enumerate(_IND_COLUMNS)
    ]
    vals = frames[0]
    for f_ in frames[1:]:
        vals = vals.unionByName(f_)
    hist = ind_mask_histogram(vals).localCheckpoint(eager=True)
    col_ids = spark.createDataFrame(
        [(i, f"{t}.{c}") for i, (t, c) in enumerate(_IND_COLUMNS)],
        "cid int, col string",
    )
    return _ind_report(hist, col_ids)
