"""Reusable migrator test harness — the analogue of the reference's
shipped ``Test::Database::Migrator`` class (lib/Test/Database/Migrator.pm:
65-303): backend authors point it at a factory for THEIR migrator and it
replays the golden end-to-end scenario — bootstrap, ordered multi-file
migrations, idempotent re-run, code migration through the migrator handle,
and the strict failure path (stderr ⇒ die, ledger untouched).

Usage (see tests/test_migrator_harness.py for both built-in backends)::

    harness = MigratorHarness(factory=lambda tree: Migrator(spark, ...))
    harness.run_scenario(tmp_path, applied_names, table_exists)
"""

from __future__ import annotations

import os
import stat
import sys
from collections.abc import Callable
from pathlib import Path

from .core import MigrationError, Migrator


def wait_before_cleanup() -> None:
    """Debug hook mirroring the reference's DATABASE_MIGRATOR_TEST_WAIT
    (Test/Database/Migrator.pm:340-353): when the env var is set, pause on
    stdin before the harness tears the test database down so a human can
    inspect it. No-op otherwise (and when stdin isn't a tty — CI safe)."""
    if os.environ.get("DATABASE_MIGRATOR_TEST_WAIT") and sys.stdin.isatty():
        print("\n  Waiting to clean up the test database\n")
        sys.stdin.readline()

SCHEMA_SQL = """
CREATE TABLE applied_migration (
    migration  VARCHAR(250)   PRIMARY KEY
);
CREATE TABLE foo (
    foo_id     INTEGER        PRIMARY KEY,
    foo_name   VARCHAR(50)    NOT NULL
)
"""

FIRST_TABLES_SQL = (
    "CREATE TABLE bar ( bar_id INTEGER PRIMARY KEY, bar_name VARCHAR(50) );\n"
    "CREATE TABLE baz ( baz_id INTEGER PRIMARY KEY, baz_name VARCHAR(50) )"
)
BAR_INDEX_SQL = "CREATE INDEX bar_bar_name ON bar (bar_name)"
BAZ_INDEX_SQL = "CREATE INDEX baz_baz_name ON baz (baz_name)"

CODE_MIGRATION = """
def migrate(migrator):
    migrator.run_sql("CREATE TABLE myperlsub (id INT)")
"""

FAILING_PROGRAM = """#!/bin/sh
echo "Use of uninitialized value" >&2
exit 0
"""


def build_tree(root: Path) -> Path:
    """Write the reference scenario's schema + migration tree
    (Test/Database/Migrator.pm:193-303, layout in FIXTURES.md §A)."""
    (root / "schema.sql").write_text(SCHEMA_SQL)
    mig = root / "migrations"
    first = mig / "01-first"
    first.mkdir(parents=True, exist_ok=True)
    (first / "01-create-tables.sql").write_text(FIRST_TABLES_SQL)
    (first / "02-create-bar-table-index.sql").write_text(BAR_INDEX_SQL)
    second = mig / "02-second"
    second.mkdir(exist_ok=True)
    (second / "01-create-baz-table-index.sql").write_text(BAZ_INDEX_SQL)
    return root


class MigratorHarness:
    """Replays the golden scenario against any Migrator implementation.

    ``factory(tree_root)`` must return a *fresh* migrator for the tree at
    ``tree_root`` (fresh per call — the reference rebuilds, too, so lazy
    existence caches don't leak across runs).
    """

    def __init__(self, factory: Callable[[Path], Migrator]):
        self.factory = factory

    def run_scenario(
        self,
        root: Path,
        applied_names: Callable[[Migrator], list[str]],
        table_exists: Callable[[Migrator, str], bool],
    ) -> None:
        build_tree(root)

        # run 1: bootstrap + 01,02 (:70-137)
        m = self.factory(root)
        m.create_or_update_database()
        for t in ("foo", "bar", "baz"):
            assert table_exists(m, t), f"table {t} missing after bootstrap"
        assert applied_names(m) == ["01-first", "02-second"]

        # run 2: idempotent (:139-144)
        m2 = self.factory(root)
        assert m2.pending_migrations() == []
        m2.create_or_update_database()
        assert applied_names(m2) == ["01-first", "02-second"]

        # run 3: code migration via the migrator handle (:145-162)
        third = root / "migrations" / "03-third"
        third.mkdir()
        (third / "migrate.py").write_text(CODE_MIGRATION)
        m3 = self.factory(root)
        m3.create_or_update_database()
        assert table_exists(m3, "myperlsub")
        assert applied_names(m3) == ["01-first", "02-second", "03-third"]

        # run 4: failure path — stderr despite exit 0 ⇒ die, not recorded
        # (:164-188, 271-303)
        fourth = root / "migrations" / "04-fourth"
        fourth.mkdir()
        prog = fourth / "migrate.sh"
        prog.write_text(FAILING_PROGRAM)
        prog.chmod(prog.stat().st_mode | stat.S_IXUSR)
        m4 = self.factory(root)
        try:
            m4.create_or_update_database()
            raise AssertionError("failing migration did not raise")
        except MigrationError as e:
            assert "Use of uninitialized" in str(e)
        assert applied_names(m4) == ["01-first", "02-second", "03-third"]

        # inspect-pause before any caller-side teardown
        # (Test/Database/Migrator.pm:340-353)
        wait_before_cleanup()
