"""SparkSession factory tuned for the driver's local[N] harness while keeping
cluster-scale defaults (AQE, Arrow, sane shuffle parallelism).

On a real cluster the same knobs apply; only master/memory change. We pin the
session time zone to UTC so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "database_migrator_spark",
    cpus: int | None = None,
    persistent_catalog: bool = False,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. Shuffle partitions
    are sized to the core count — at 100 TB you would instead rely on AQE
    coalescing from a high initial number; locally 200 default partitions
    just adds task-scheduling overhead.

    ``persistent_catalog=True`` backs the catalog with the Hive/derby
    metastore (in the working directory) so databases/tables — notably the
    migration ledger — survive across processes; the migrator CLI needs
    this, one-shot analytics sessions don't. On a real cluster this is the
    shared Hive metastore / Unity-style catalog and the flag is moot.
    """
    n = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local[32] means 32 concurrent tasks sharing one heap: 8g gave
        # ~250MB/task and OOM'd the 30× dedup probe's bucket join; 20g
        # (~600MB/task) matches what a real executor would get and is
        # still a fraction of the 128 GiB box
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g"))
        .config("spark.ui.enabled", "false")
    )
    if persistent_catalog:
        builder = builder.enableHiveSupport()
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
