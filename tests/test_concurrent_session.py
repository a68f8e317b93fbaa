"""Shared-session safety: concurrent query builds must not cross-contaminate.

A long-lived production SparkSession serves many callers at once. Query
builders that register FIXED-name temp views (``orders``) race: builder A
can bind builder B's table (registered from a different sf_dir) in the
window between A's registration and A's ``spark.sql`` analysis — silently
computing on the wrong data — and a library caller's own same-named view
is clobbered. ``helpers.sql_with_views`` closes both holes with per-call
unique ephemeral names dropped after eager analysis; these tests attack
the fix from both sides (local[*] shares one driver catalog across
threads, so the race is fully reproducible without a cluster).
"""

from __future__ import annotations

import threading

import pytest

from mssql2monetdb_spark.queries.registry import REGISTRY

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"

# every SQL-surface builder that registers temp views (now via
# sql_with_views); each is the regression guard for its own former
# fixed-name registration
SQL_VIEW_QUERIES = [
    "subquery_scalar",
    "subquery_correlated",
    "subquery_not_in_nulls",
    "subquery_correlated_min",
    "agg_grouping_sets",
    "agg_filter_clause",
    "cte_with_clause",
    "cte_recursive",
    "fn_udtf_shingles",
]


def _rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.mark.parametrize("name", SQL_VIEW_QUERIES)
def test_concurrent_two_sf_builds_do_not_cross_bind(spark, name):
    """Build the same query at TWO sf_dirs from racing threads, repeatedly.

    With fixed view names this flakily binds one thread's table into the
    other thread's plan (caught as a row-count/value mismatch vs the
    sequential build); with ephemeral names each plan can only see its own
    registrations.
    """
    q = REGISTRY[name]
    expected = {SF_A: _rows(q.build(spark, SF_A)), SF_B: _rows(q.build(spark, SF_B))}
    assert expected[SF_A] != expected[SF_B], (
        f"{name}: fixtures produce identical results at both SFs — "
        "the cross-bind check would be vacuous"
    )

    for _ in range(3):
        results: dict[str, list] = {}
        errors: list[BaseException] = []
        barrier = threading.Barrier(2)

        def build(sf_dir: str) -> None:
            try:
                barrier.wait(timeout=60)
                results[sf_dir] = _rows(q.build(spark, sf_dir))
            except BaseException as exc:  # noqa: BLE001 - surface in main thread
                errors.append(exc)

        threads = [threading.Thread(target=build, args=(sf,)) for sf in (SF_A, SF_B)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        assert results[SF_A] == expected[SF_A]
        assert results[SF_B] == expected[SF_B]


def test_builders_do_not_clobber_caller_views(spark):
    """A caller's own `orders`/`customer` temp views survive every builder."""
    sentinel = spark.range(3).toDF("sentinel_col")
    for name in ("orders", "customer", "supplier", "nation"):
        sentinel.createOrReplaceTempView(name)
    try:
        for qname in SQL_VIEW_QUERIES:
            REGISTRY[qname].build(spark, SF_A).collect()
            for vname in ("orders", "customer", "supplier", "nation"):
                assert spark.table(vname).columns == ["sentinel_col"], (
                    f"{qname} clobbered caller view {vname}"
                )
    finally:
        for name in ("orders", "customer", "supplier", "nation"):
            spark.catalog.dropTempView(name)


def test_ephemeral_views_are_dropped(spark):
    """Builders leave no ephemeral view behind in the session catalog."""
    for qname in SQL_VIEW_QUERIES:
        REGISTRY[qname].build(spark, SF_A)
    leftovers = [
        v.name for v in spark.catalog.listTables() if v.name.startswith("_q_")
    ]
    assert leftovers == []


def test_sql_with_views_passes_literal_braces_through(spark):
    """Templates may contain literal braces (JSON-path args, regex
    quantifiers, string literals) — only the passed {key} tokens are
    substituted (the round-5 ADVICE str.format finding)."""
    from mssql2monetdb_spark.queries.helpers import sql_with_views

    df = spark.range(1).selectExpr("'{\"a\": {\"b\": 7}}' AS j")
    out = sql_with_views(
        spark,
        "SELECT get_json_object(j, '$.a.b') AS v, '{literal}' AS s "
        "FROM {src} WHERE j RLIKE '\\\\{{1}.*'",
        src=df,
    ).collect()
    assert out[0]["v"] == "7"
    assert out[0]["s"] == "{literal}"
