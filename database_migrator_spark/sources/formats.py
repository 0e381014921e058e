"""Source/sink format coverage beyond parquet: CSV, JSON-lines, ORC.

Each declared query writes a projection of a test table through the
format and reads it back, hash-matching against the oracle computed from
the original parquet — so the check proves the FORMAT path (writer +
reader + schema) loses nothing, not just that Spark can call the API.

Format rules at 100 TB:
- CSV/JSONL are interchange formats: header/schema must be pinned
  explicitly (inferSchema is a second full scan and type-unstable);
  floats are kept OUT of the round-trip columns here because decimal
  text round-trips are writer-dependent — money crosses text formats as
  integer cents only.
- ORC is the columnar alternative when the lake standardizes on it;
  same pushdown/pruning properties as parquet through the DSv2 reader.
- Files land in a per-invocation temp dir; a real pipeline would target
  the lake layout rules in sources/sink.py (partitioning, ~128 MB files).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_migrator_spark.functions.exact import cents_sum, to_cents
from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import table

_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
FROM orders
WHERE o_orderkey < 5000
ORDER BY o_orderkey
"""


def _projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 5000)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        to_cents("o_totalprice").alias("price_cents"),
    )


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str, **reader_opts) -> DataFrame:
    # stable overwrite path per (sf, fmt): repeated gate/bench/audit runs
    # rewrite in place instead of leaking a new temp dir each build
    path = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_formats",
        f"{os.path.basename(os.path.normpath(sf_dir))}-{fmt}",
    )
    df = _projection(spark, sf_dir)
    writer = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)
    # schema pinned explicitly — inferSchema would be a second full scan
    # and is type-unstable on empty partitions
    back = spark.read.format(fmt).options(**reader_opts).schema(df.schema).load(path)
    return back.orderBy("o_orderkey")


@query("q83_csv_roundtrip", oracle=_ORACLE, tags=("source", "sink", "csv"))
def q83_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV write→read round-trip of an exact-typed projection (ints +
    strings + integer cents; no raw floats — decimal text round-trips are
    writer-dependent), hash-matched against the parquet-derived oracle."""
    return _roundtrip(spark, sf_dir, "csv", header="true")


@query("q84_jsonl_roundtrip", oracle=_ORACLE, tags=("source", "sink", "json"))
def q84_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines write→read round-trip with a pinned schema — the
    interchange format of every web-corpus pipeline stage."""
    return _roundtrip(spark, sf_dir, "json")


@query("q85_orc_roundtrip", oracle=_ORACLE, tags=("source", "sink", "orc"))
def q85_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write→read round-trip — the columnar alternative to parquet,
    same vectorized/pushdown-capable DSv2 path."""
    return _roundtrip(spark, sf_dir, "orc")


@query(
    "q129_text_roundtrip",
    oracle="SELECT doc_id, text FROM documents ORDER BY doc_id",
    tags=("source", "sink", "text"),
)
def q129_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-text corpus round-trip — the most common ingest format for web
    corpora (one record per line): documents are written as
    ``<doc_id>\\t<text>`` lines through the ``text`` writer and recovered
    by splitting at the FIRST tab on read, hash-matched against the
    parquet-derived oracle so the id↔line pairing provably survives.
    Line-per-record requires the payload to be non-NULL and newline/
    tab-free (true of this corpus; a real pipeline escapes or
    length-prefixes first — that's exactly why q84's JSONL is the safer
    interchange format). The preconditions are ASSERTED in-plan, not
    assumed: a NULL text would make concat_ws drop the field, the
    written line would have no tab, and the read side would silently
    mispair (doc_id=NULL, text=<the id>) — a loud job failure beats
    that."""
    from database_migrator_spark.functions.exact import exactness_guard

    path = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_formats",
        f"{os.path.basename(os.path.normpath(sf_dir))}-text",
    )
    d = table(spark, sf_dir, "documents").where(
        exactness_guard(
            F.col("text").isNotNull() & ~F.col("text").rlike("[\t\n\r]"),
            "q129: NULL or tab/newline-bearing text cannot round-trip the "
            "line-per-record layout — escape or use JSONL (q84)",
        )
    )
    d.select(
        F.concat_ws("\t", F.col("doc_id").cast("string"), F.col("text")).alias("value")
    ).write.mode("overwrite").format("text").save(path)
    back = spark.read.text(path)
    tab = F.instr("value", "\t")
    return back.select(
        F.substring("value", F.lit(1), tab - 1).cast("long").alias("doc_id"),
        F.substring("value", tab + 1, F.length("value") - tab).alias("text"),
    ).orderBy("doc_id")


@query(
    "q130_schema_evolution",
    oracle="""
    SELECT doc_id, text, NULL AS lang FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, text, lang FROM documents WHERE doc_id % 2 = 1
    ORDER BY doc_id
    """,
    tags=("source", "schema-evolution", "parquet"),
)
def q130_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: an old batch written WITHOUT the ``lang``
    column and a new batch WITH it land in the same dataset directory;
    ``mergeSchema=true`` reconciles them (old rows surface NULL lang),
    hash-matched against the explicit-NULL union oracle. This is the lake
    reality at 100 TB — columns appear over months of ingest and
    re-writing history is off the table; mergeSchema is per-read opt-in
    because footer-merging every scan is a real planning cost (pin the
    merged schema in a table definition once it stabilizes)."""
    path = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_formats",
        f"{os.path.basename(os.path.normpath(sf_dir))}-evolve",
    )
    d = table(spark, sf_dir, "documents")
    d.where(F.col("doc_id") % 2 == 0).select("doc_id", "text").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "batch=old"))
    d.where(F.col("doc_id") % 2 == 1).select("doc_id", "text", "lang").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "batch=new"))
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "batch=old"), os.path.join(path, "batch=new")
    )
    return back.select("doc_id", "text", "lang").orderBy("doc_id")


@query(
    "q131_partition_pruned_read",
    oracle="""
    SELECT doc_id, n_chars FROM documents WHERE source = 'src3'
    ORDER BY doc_id
    """,
    tags=("source", "partitioning", "pruning", "parquet"),
)
def q131_partition_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-layout partitioned write + partition-PRUNED read: documents
    are written ``PARTITION BY source`` and read back filtered to one
    source — the filter must become a PartitionFilter (directory-level
    skip; test_plans asserts it), so the scan touches 1/N of the files
    regardless of corpus size. This is the physical layout rule that
    makes per-source curation (q114/q119/q126) cheap at 100 TB: source,
    date, and language are directory keys, not row predicates."""
    path = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_formats",
        f"{os.path.basename(os.path.normpath(sf_dir))}-bysource",
    )
    d = table(spark, sf_dir, "documents")
    d.write.mode("overwrite").partitionBy("source").parquet(path)
    back = spark.read.parquet(path).where(F.col("source") == "src3")
    return back.select("doc_id", "n_chars").orderBy("doc_id")


@query(
    "q134_bucketed_colocated_join",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*)                                             AS n_items,
           SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
             / 100.0                                            AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("source", "bucketing", "join", "colocated", "E3"),
)
def q134_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-fact join — THE layout lever for the 100 TB
    join neither side of which broadcasts: ``lineitem`` and ``orders`` are
    written ONCE as external tables bucketed (and sorted) by their join
    key into the same bucket count, so every subsequent join on that key
    reads bucket i of each side into the same task and the sort-merge join
    runs with ZERO shuffle of either table (plan-locked in
    tests/test_plans.py: the only Exchange left is the final 5-group
    aggregate's). At 100 TB this converts the pipeline's dominant
    recurring cost — re-shuffling ~TBs of fact table per join — into a
    one-time ingest-layout decision, exactly like the IVF/BPE fit
    artifacts. The pre-write ``repartition(nb, key)`` co-locates each
    bucket's rows in one task so each bucket lands in one file per side,
    which also lets the bucket-sorted property satisfy the SMJ's sort
    requirement on read. Hash-matched against the oracle running the same
    join-aggregate on the ORIGINAL parquet, so the bucketed layout
    provably loses/duplicates nothing."""
    nb = 8
    tag = "".join(c if c.isalnum() else "_" for c in os.path.basename(os.path.normpath(sf_dir)))
    base = os.path.join(tempfile.gettempdir(), "spark_graft_bucketed", tag)
    li_name, o_name = f"q134_lineitem_{tag}", f"q134_orders_{tag}"

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    (li.repartition(nb, "l_orderkey").write.mode("overwrite")
       .option("path", os.path.join(base, "lineitem"))
       .bucketBy(nb, "l_orderkey").sortBy("l_orderkey").saveAsTable(li_name))
    (o.repartition(nb, "o_orderkey").write.mode("overwrite")
       .option("path", os.path.join(base, "orders"))
       .bucketBy(nb, "o_orderkey").sortBy("o_orderkey").saveAsTable(o_name))

    lb, ob = spark.table(li_name), spark.table(o_name)
    return (
        lb.hint("merge")
        .join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            cents_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q135_compaction_roundtrip",
    oracle=_ORACLE,
    tags=("source", "sink", "compaction", "maintenance"),
)
def q135_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the standing maintenance job of every
    incremental/streaming lake at 100 TB (per-batch writers leave
    thousands of KB-sized files; scan throughput and driver planning both
    collapse under the file-listing and per-file open cost): the orders
    projection is deliberately FRAGMENTED into 64 tiny files, then
    compacted with ``compact_parquet(range_col=...)`` into size-targeted,
    RANGE-CLUSTERED files (each output file covers a disjoint o_orderkey
    range, sorted within, so parquet min/max row-group stats prune point
    scans to one file afterwards — compaction should leave a zone-map
    layout behind, not just fewer files). The read-back is hash-matched
    against the oracle on the ORIGINAL parquet, so the fragment→compact→
    read chain provably loses/duplicates nothing; file-count mechanics
    and range disjointness are asserted in tests/test_streaming_sinks.py."""
    from database_migrator_spark.sources.sink import compact_parquet

    tag = os.path.basename(os.path.normpath(sf_dir))
    base = os.path.join(tempfile.gettempdir(), "spark_graft_compact", tag)
    frag, compacted = os.path.join(base, "frag"), os.path.join(base, "compact")
    df = _projection(spark, sf_dir)
    df.repartition(64).write.mode("overwrite").parquet(frag)
    compact_parquet(spark, frag, compacted, range_col="o_orderkey")
    return spark.read.schema(df.schema).parquet(compacted).orderBy("o_orderkey")


@query(
    "q137_delete_propagation",
    oracle="""
    SELECT event_id, user_id,
           CAST(ROUND(value * 100) AS BIGINT) AS value_cents
    FROM events
    WHERE user_id % 50 <> 7
    ORDER BY event_id
    """,
    tags=("source", "sink", "deletes", "compliance", "maintenance"),
)
def q137_delete_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-deletion propagation (GDPR right-to-be-forgotten) against a
    range-clustered lake layout: the events projection is written
    clustered by user_id (q135's zone-map layout), a deterministic
    deletion-request set (user_id % 50 = 7 — the stand-in for the
    compliance request table) is joined against per-file min/max key
    stats, and ONLY the files that can contain a requested key are
    rewritten with a broadcast anti-join; untouched files stay
    byte-identical. The final read-back (untouched ∪ rewritten) is
    hash-matched against the oracle's logical delete on the ORIGINAL
    parquet — proving the partial rewrite deleted every requested row
    and nothing else. File-targeting mechanics (affected < total for a
    localized key set) are asserted in tests/test_streaming_sinks.py.
    At 100 TB this is the difference between rewriting ~#keys files and
    rewriting the whole table; the collected affected-file list is
    planner METADATA (one row per file), the same thing a Delta/Iceberg
    deletion-vector planner materializes."""
    from database_migrator_spark.sources.sink import propagate_deletes

    tag = os.path.basename(os.path.normpath(sf_dir))
    base = os.path.join(tempfile.gettempdir(), "spark_graft_deletes", tag)
    v1, v2 = os.path.join(base, "v1"), os.path.join(base, "v2")
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", to_cents("value").alias("value_cents")
    )
    (e.repartitionByRange(8, "user_id").sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(v1))
    deletes = (
        spark.read.parquet(v1)
        .where(F.col("user_id") % 50 == 7)
        .select("user_id")
        .distinct()
    )
    final, _n_aff, _n_files = propagate_deletes(spark, v1, v2, deletes, "user_id")
    return final.select("event_id", "user_id", "value_cents").orderBy("event_id")


@query(
    "q139_corrupt_tolerant_ingest",
    oracle="""
    SELECT doc_id, n_chars
    FROM documents
    WHERE doc_id % 37 <> 0
    ORDER BY doc_id
    """,
    tags=("source", "json", "corrupt-records", "permissive"),
)
def q139_corrupt_tolerant_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-tolerant JSONL ingest — the fault-reality of web-scale
    feeds (truncated uploads, encoder bugs, mid-line splits): a corpus
    is written with every doc_id % 37 == 0 line deliberately TRUNCATED
    mid-object, then read back in PERMISSIVE mode with an explicit
    ``_corrupt_record`` column. Good rows must survive bit-exact (the
    hash match against the clean subset proves the malformed neighbors
    neither crashed the scan — FAILFAST's behavior — nor corrupted
    adjacent parses), and the quarantined-row accounting (every bad line
    lands in ``_corrupt_record`` with its raw payload preserved for a
    dead-letter queue, count asserted) lives in
    tests/test_formats_corrupt.py. At 100 TB PERMISSIVE + corrupt-column
    is the only viable posture: one bad line among billions must cost
    one quarantined row, not a failed 1000-executor job; DROPMALFORMED
    is the silent-loss anti-pattern (no audit trail of what vanished)."""
    path = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_formats",
        f"{os.path.basename(os.path.normpath(sf_dir))}-corrupt",
    )
    d = table(spark, sf_dir, "documents")
    lines = d.select(
        F.when(
            F.col("doc_id") % 37 == 0,
            F.concat(F.lit('{"doc_id": '), F.col("doc_id"), F.lit(', "n_chars": ')),
        )
        .otherwise(F.to_json(F.struct("doc_id", "n_chars")))
        .alias("value")
    )
    lines.write.mode("overwrite").format("text").save(path)
    back = (
        spark.read.schema("doc_id long, n_chars long, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # the doc_id guard is semantic (a good row must have parsed its key)
    # AND load-bearing: under count()-style column pruning a filter whose
    # only referenced column is _corrupt_record makes the scan illegal
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    return (
        back.where(F.col("_corrupt_record").isNull() & F.col("doc_id").isNotNull())
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


@query("q140_xml_roundtrip", oracle=_ORACLE, tags=("source", "sink", "xml"))
def q140_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML write→read round-trip of the exact-typed projection — Spark 4
    ships the (formerly spark-xml) reader/writer natively, and XML is
    still the interchange reality of enterprise/API feeds. Same rules as
    q83/q84: schema pinned on read (inference is a second scan and
    type-unstable), no raw floats across a text format, integer cents
    only. rowTag is explicit — the XML source has no default record
    element."""
    path = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_formats",
        f"{os.path.basename(os.path.normpath(sf_dir))}-xml",
    )
    df = _projection(spark, sf_dir)
    (df.write.mode("overwrite").format("xml")
       .option("rootTag", "orders").option("rowTag", "order").save(path))
    back = (
        spark.read.format("xml").option("rowTag", "order")
        .schema(df.schema).load(path)
    )
    return back.orderBy("o_orderkey")
