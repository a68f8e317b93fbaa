"""The t2 gate, locally: every registered query with an oracle must match
DuckDB exactly on the same parquet tables (row count + schema + values)."""

from __future__ import annotations

import pytest

from mssql2monetdb_spark.queries import REGISTRY

from .oracle_harness import compare_frames, duckdb_connection

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = REGISTRY[name]
    spark_pdf = q.build(spark, sf_dir).toPandas()
    oracle_pdf = duck.sql(q.oracle).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(name, spark, sf_dir):
    q = REGISTRY[name]
    df = q.build(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema) > 0


# Queries whose OUTPUT carries raw timestamps/dates — the ones a non-UTC
# driver session would corrupt if configure_runtime didn't force UTC.
TZ_SENSITIVE = [
    "events_sessionize",
    "stream_tumbling_hourly",
    "fn_datetime",
    "retention_cohorts",
]


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_query_matches_oracle_under_non_utc_session(name, spark, sf_dir, duck):
    """The external driver's session config is unknown; a non-UTC session
    timezone must not change any timestamp-bearing result (the query
    builders route through catalog/configure_runtime, which forces UTC)."""
    q = REGISTRY[name]
    original = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        spark_pdf = q.build(spark, sf_dir).toPandas()
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
    oracle_pdf = duck.sql(q.oracle).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name} under non-UTC session: " + "; ".join(problems)
