"""CLI surface mirroring the reference's MooseX::Getopt::Dashes options
(Core.pm:20-24, 121-139; README.md:115-125): dashed long flags, ``--user``
aliased to ``--username`` (BUILDARGS, Changes:30-32), quiet ⊕ verbose
(BUILD), plus verbs: ``migrate`` (create-or-update), ``plan``/``status``
(print the pending set — the engine's one real query).
"""

from __future__ import annotations

import argparse
import sys

from database_migrator_spark.session import get_session

from .core import Migrator


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="spark-migrate",
        description="Create or update a Spark database from a migration tree.",
    )
    p.add_argument("verb", choices=["migrate", "plan", "status"], help="action to run")
    p.add_argument("--database", help="Spark catalog database target")
    p.add_argument(
        "--jdbc-url",
        help="JDBC target (e.g. jdbc:derby:/path;create=true) — DDL passes "
        "through verbatim, ledger lives in the target database",
    )
    p.add_argument("--migrations-dir", required=True)
    p.add_argument("--schema-file")
    p.add_argument("--migration-table", default="applied_migration")
    p.add_argument(
        "--ledger-dir",
        help="directory for the atomic FileLedger backend (write-ahead + "
        "rename-commit) instead of the catalog/JDBC ledger table",
    )
    p.add_argument("--username")
    p.add_argument("--user", dest="username", help="alias for --username")
    p.add_argument("--password")
    p.add_argument("--host")
    p.add_argument("--port")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--legacy-sql-match", action="store_true",
                   help="match .sql anywhere in the filename (reference quirk)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.quiet and args.verbose:
        print("error: --quiet and --verbose are mutually exclusive", file=sys.stderr)
        return 2
    if bool(args.database) == bool(args.jdbc_url):
        print("error: exactly one of --database / --jdbc-url is required", file=sys.stderr)
        return 2
    common = dict(
        migrations_dir=args.migrations_dir,
        schema_file=args.schema_file,
        migration_table=args.migration_table,
        dry_run=args.dry_run,
        quiet=args.quiet,
        verbose=args.verbose,
        legacy_sql_match=args.legacy_sql_match,
    )
    if args.jdbc_url:
        from .jdbc import JdbcMigrator

        spark = get_session("spark-migrate")
        props = {}
        if args.username:
            props["user"] = args.username
        if args.password:
            props["password"] = args.password
        if args.ledger_dir:
            from .ledger import FileLedger

            common["ledger"] = FileLedger(spark, args.ledger_dir)
        m = JdbcMigrator(spark, jdbc_url=args.jdbc_url, jdbc_properties=props, **common)
    else:
        spark = get_session("spark-migrate", persistent_catalog=True)
        if args.ledger_dir:
            from .ledger import FileLedger

            common["ledger"] = FileLedger(spark, args.ledger_dir)
        m = Migrator(spark, database=args.database, **common)
    import os

    if not os.path.isdir(args.migrations_dir):
        print(f"error: migrations dir not found: {args.migrations_dir}", file=sys.stderr)
        return 1
    if args.schema_file and not os.path.isfile(args.schema_file):
        print(f"error: schema file not found: {args.schema_file}", file=sys.stderr)
        return 1
    try:
        if args.verb in ("plan", "status"):
            pending = m.pending_migrations()
            for mig in pending:
                print(mig.name)
            print(f"{len(pending)} pending migration(s)", file=sys.stderr)
            return 0
        m.create_or_update_database()
        return 0
    except Exception as e:  # surface a one-line error, not a JVM traceback
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
