"""JdbcWarehouse: the reference's MonetDB-side publish lifecycle (versioned
tables + transactional view switch + keep-2 retention) integration-tested
against embedded Derby — PHASES 2-4 of ``CopyTool.doCopy`` executed on a
real JDBC warehouse instead of the parquet catalog."""

from __future__ import annotations

from datetime import datetime

import pytest

from mssql2monetdb_spark.catalog import load_table
from mssql2monetdb_spark.config.spec import CopyJob, SourceSpec
from mssql2monetdb_spark.engine.export import CATALOG_SQL, JdbcWarehouse
from mssql2monetdb_spark.sources.jdbc import jdbc_reader

SF = "/root/testdata/sf0.001"
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture
def wh(spark, tmp_path):
    source = SourceSpec(
        name="derby_wh",
        format="jdbc",
        options={
            "url": f"jdbc:derby:{tmp_path}/whdb;create=true",
            "driver": DERBY_DRIVER,
        },
    )
    return JdbcWarehouse(spark, source)


def _view_count(spark, wh, name):
    df = jdbc_reader(
        spark, wh.source, CopyJob(job_id="rb", source="derby_wh", from_table=name)
    )
    return df.count()


def test_export_lifecycle_versions_view_and_retention(spark, wh):
    """Three exports: each lands a new physical version, the view follows
    the newest, and retention keeps exactly current + backup
    (CopyTool.java:554-602 keep-2)."""
    nation = load_table(spark, SF, "nation")

    p1 = wh.export(nation.limit(5), "nation", datetime(2024, 6, 1))
    assert wh.current_version("nation").lower() == p1.lower()
    assert _view_count(spark, wh, "nation") == 5

    p2 = wh.export(nation.limit(10), "nation", datetime(2024, 6, 2))
    assert wh.current_version("nation").lower() == p2.lower()
    assert _view_count(spark, wh, "nation") == 10
    assert len(wh.table_versions("nation")) == 2  # current + backup

    p3 = wh.export(nation, "nation", datetime(2024, 6, 3))
    versions = wh.table_versions("nation")
    assert len(versions) == 2  # oldest reaped
    assert versions[0].lower() == p3.lower()
    assert p1.upper() not in versions
    assert _view_count(spark, wh, "nation") == 25


def test_publish_replaces_stale_plain_table(spark, wh):
    """The public name may be occupied by a plain TABLE from a pre-views
    deployment; publish must drop it and create the view in its place
    (the reference's isTable branch, MonetDBUtil.java:462-498)."""
    nation = load_table(spark, SF, "nation")
    wh._execute('CREATE TABLE nation ("n_nationkey" BIGINT)')
    assert wh.is_table("nation")

    p = wh.load_version(nation.limit(3), "nation", datetime(2024, 6, 1))
    wh.publish("nation", p)
    assert wh.exists("nation") and not wh.is_table("nation")
    assert _view_count(spark, wh, "nation") == 3


def test_publish_missing_physical_fails_loudly(spark, wh):
    with pytest.raises(FileNotFoundError):
        wh.publish("nation", "nation_2024_06_01_00_00_00")


def test_cleanup_never_drops_published_version(spark, wh):
    """Even when the view points at an OLD version (rollback), retention
    must not reap it — same contract as the parquet catalog."""
    nation = load_table(spark, SF, "nation")
    p1 = wh.load_version(nation.limit(5), "nation", datetime(2024, 6, 1))
    p2 = wh.load_version(nation.limit(10), "nation", datetime(2024, 6, 2))
    p3 = wh.load_version(nation, "nation", datetime(2024, 6, 3))
    wh.publish("nation", p1)  # rolled back to the oldest

    dropped = wh.cleanup("nation", retain=1)
    assert p1.upper() not in [d.upper() for d in dropped]
    assert _view_count(spark, wh, "nation") == 5
    # newest is retained by count, p1 by the published guard; p2 reaped
    remaining = {v.upper() for v in wh.table_versions("nation")}
    assert p1.upper() in remaining and p3.upper() in remaining
    assert p2.upper() not in remaining


def test_export_insert_method(spark, wh):
    """method='insert' forces the distributed batched writer against a
    mapper-derived DDL — the reference's final fallback rung."""
    nation = load_table(spark, SF, "nation")
    wh.export(nation.limit(7), "nation_ins", datetime(2024, 6, 1), method="insert")
    assert _view_count(spark, wh, "nation_ins") == 7


def test_drop_table_removes_view_and_all_versions(spark, wh):
    nation = load_table(spark, SF, "nation")
    wh.export(nation.limit(5), "nation", datetime(2024, 6, 1))
    wh.export(nation.limit(10), "nation", datetime(2024, 6, 2))
    wh.drop_table("nation")
    assert not wh.exists("nation")
    assert wh.table_versions("nation") == []


def test_monetdb_catalog_statement_shapes():
    """Reference-parity pin for the untestable dialect: the MonetDB probes
    are the sys.tables queries the reference issues (MonetDBUtil.java:41-88
    existence/is-table via query IS NULL; CopyTool.java:562-565 version
    listing ordered DESC)."""
    m = CATALOG_SQL["monetdb"]
    assert m["exists"] == "SELECT name FROM sys.tables WHERE name = '{name}'"
    assert "query IS NULL" in m["is_table"]
    assert "LIKE '{prefix}20%'" in m["list_versions"]
    assert "query IS NULL" in m["list_versions"]
    assert m["list_versions"].endswith("ORDER BY name DESC")
    assert m["view_definition"] == "SELECT query FROM sys.tables WHERE name = '{name}'"
