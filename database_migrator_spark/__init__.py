"""database_migrator_spark — a PySpark-native engine with the capabilities of
maxmind/Database-Migrator, extended with a 100 TB-scale analytics/ETL surface.

Layout
------
- ``migrator/``   reference-parity engine: pending-set anti-join, ledger,
  DDL shim, ordered apply loop, CLI (SURVEY.md §2A).
- ``operators/``  the analytics extension surface (SURVEY.md §2B):
  relational (scan/agg/join/window/rollup), semi-structured (JSON/array),
  dedup (exact, MinHash-LSH, SimHash, Jaccard), similarity search,
  text analysis, multimodal binary columns.
- ``streaming/``  Structured Streaming operators with batch-equivalence.
- ``plans/``      the declared-query registry (name → Spark builder +
  DuckDB oracle SQL) driving correctness checks and the benchmark.
- ``sources/``    parquet table loader, JDBC source/sink.
- ``functions/``  reusable column-expression compositions (exact money
  arithmetic, vector math, text hashing) — all JVM-side built-ins.
"""

__version__ = "0.1.0"
