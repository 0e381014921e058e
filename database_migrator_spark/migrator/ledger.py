"""Applied-migration ledger (SURVEY.md §1.1): one table whose single
required column is named ``migration`` (reference Migrator.pm:140-153; the
column is named explicitly in the INSERT so users may add extra columns,
Changes:34-36).

Backends behind one interface:
- CatalogLedger — a Spark catalog table (parquet-backed). The append is
  not atomic with the migration itself, faithfully mirroring the
  reference's documented at-least-once semantics (Migrator.pm:183-189);
  a Delta-backed ledger would upgrade this to an atomic append and is the
  recommended production backend (jar not present in this environment).
- JdbcLedger — reads/writes the ledger over JDBC (the reference's actual
  I/O plane); requires a JDBC driver jar on the classpath, so it is
  import-safe but raises a clear error when used without one.
"""

from __future__ import annotations

import abc

from pyspark.sql import DataFrame, SparkSession


class Ledger(abc.ABC):
    @abc.abstractmethod
    def exists(self) -> bool: ...

    @abc.abstractmethod
    def applied_df(self) -> DataFrame:
        """DataFrame with the single column ``migration: string``."""

    @abc.abstractmethod
    def record(self, name: str) -> None: ...


class CatalogLedger(Ledger):
    def __init__(self, spark: SparkSession, table: str = "applied_migration"):
        self.spark = spark
        self.table = table

    def exists(self) -> bool:
        # exact-match existence check — deliberately fixes the reference's
        # substring false-positive risk (`/\b\Q$table\E\b/` over
        # dbh->tables(), Core.pm:221)
        return self.spark.catalog.tableExists(self.table)

    def applied_df(self) -> DataFrame:
        return self.spark.table(self.table).select("migration")

    def record(self, name: str) -> None:
        # named column, parameterized literal (Core.pm:208-210)
        self.spark.sql(
            f"INSERT INTO {self.table} (migration) VALUES (:name)",  # noqa: S608
            args={"name": name},
        )


class JdbcLedger(Ledger):
    def __init__(
        self,
        spark: SparkSession,
        url: str,
        table: str = "applied_migration",
        properties: dict[str, str] | None = None,
    ):
        self.spark = spark
        self.url = url
        self.table = table
        self.properties = properties or {}

    def exists(self) -> bool:
        """True iff the ledger table exists. A missing table means
        'applied = ∅' (the documented bootstrap rule); anything else —
        connection refused, bad credentials, missing driver — must RAISE,
        not return False, or a transient failure would silently re-apply
        every migration."""
        # JDBC metadata probe, not exception-message parsing: an unrelated
        # error whose message happens to contain 'not found' must RAISE,
        # never silently classify as 'ledger missing'. Connectivity errors
        # propagate from getConnection itself.
        jvm = self.spark._jvm  # noqa: SLF001
        props = jvm.java.util.Properties()
        for k, v in self.properties.items():
            props.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(self.url, props)
        try:
            meta = conn.getMetaData()
            # unquoted identifiers are stored case-folded per DBMS (Derby/
            # Oracle upper, Postgres lower) — probe the plausible foldings.
            # '_' is a JDBC pattern wildcard, so getTables('applied_migration')
            # also matches e.g. APPLIED1MIGRATION: re-check the returned
            # names for EXACT equality instead of trusting the pattern.
            for candidate in dict.fromkeys(
                (self.table, self.table.upper(), self.table.lower())
            ):
                rs = meta.getTables(None, None, candidate, None)
                try:
                    while rs.next():
                        if rs.getString("TABLE_NAME") == candidate:
                            return True
                finally:
                    rs.close()
            return False
        finally:
            conn.close()

    def applied_df(self) -> DataFrame:
        from pyspark.sql import functions as F

        # case-normalize: some DBMSes (Derby, Oracle) uppercase unquoted
        # identifiers; resolution is case-insensitive but output isn't
        return self.spark.read.jdbc(self.url, self.table, properties=self.properties).select(
            F.col("migration").alias("migration")
        )

    def record(self, name: str) -> None:
        df = self.spark.createDataFrame([(name,)], "migration string")
        df.write.jdbc(self.url, self.table, mode="append", properties=self.properties)
