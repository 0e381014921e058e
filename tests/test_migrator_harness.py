"""The reusable harness (migrator/testing.py — port of the reference's
shipped Test::Database::Migrator) run against BOTH built-in backends."""

from __future__ import annotations

import uuid

import pytest

from database_migrator_spark.migrator.core import Migrator
from database_migrator_spark.migrator.jdbc import JdbcMigrator
from database_migrator_spark.migrator.testing import MigratorHarness


def test_harness_catalog_backend(spark, tmp_path):
    db = f"harness_{uuid.uuid4().hex[:8]}"

    def factory(root):
        return Migrator(
            spark,
            database=db,
            migrations_dir=str(root / "migrations"),
            schema_file=str(root / "schema.sql"),
            quiet=True,
        )

    def applied(m):
        return [
            r["migration"]
            for r in spark.table(f"{db}.applied_migration").orderBy("migration").collect()
        ]

    def exists(m, t):
        return spark.catalog.tableExists(f"{db}.{t}")

    try:
        MigratorHarness(factory).run_scenario(tmp_path, applied, exists)
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS `{db}` CASCADE")


def test_harness_jdbc_backend(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/hdb;create=true"

    def factory(root):
        return JdbcMigrator(
            spark,
            jdbc_url=url,
            migrations_dir=str(root / "migrations"),
            schema_file=str(root / "schema.sql"),
            quiet=True,
        )

    def applied(m):
        return sorted(r[0] for r in m.ledger.applied_df().collect())

    def exists(m, t):
        try:
            spark.read.jdbc(url, t).limit(1).collect()
            return True
        except Exception:
            return False

    MigratorHarness(factory).run_scenario(tmp_path, applied, exists)
