"""mssql2monetdb_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ``topicusonderwijs/mssql2monetdb``.

The reference (see ``/root/reference``, SURVEY.md) is a single-threaded JDBC
ETL tool: extract (arbitrary SQL on MSSQL/PostgreSQL) -> staged CSV -> bulk
load into MonetDB -> versioned-table + view-switch publish -> retention
cleanup, with a watermark-based change trigger and a polling scheduler.

This package re-expresses that surface Spark-first:

- ``engine``     — the 4-phase copy pipeline (extract/load/publish/cleanup),
                   versioned Parquet publish with atomic view switch,
                   watermark trigger state machine, polling scheduler.
- ``schema``     — JDBC->Spark type mapping, decimal narrowing, identifier
                   normalization (reference ``MonetDBUtil.java`` semantics).
- ``config``     — job-spec compilation/validation with env interpolation
                   (reference ``CopyToolConfig.java`` semantics).
- ``sources``    — parquet / JDBC / CSV readers & writers.
- ``functions``  — reusable column expressions (hashing, text, vectors).
- ``operators``  — large-scale extension operators: dedup (exact, MinHash-LSH,
                   SimHash, n-gram Jaccard, embedding), similarity search,
                   text analysis, multimodal plumbing.
- ``queries``    — the declared query corpus (SURVEY.md §2B/§2C) with DuckDB
                   oracle SQL for the correctness gate.
- ``streaming``  — Structured Streaming pipelines (windows, watermarks,
                   stateful dedup) mirroring the scheduler/trigger semantics.
"""

__version__ = "0.1.0"
