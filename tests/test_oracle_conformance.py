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
