"""Dialect statement pins for the reference's SOURCE databases
(``SourceDatabaseType.java``): MSSQL gets the same verbatim unit-pinning
bar the MonetDB staging serializer (commit ae1a52d) and catalog probes
(``test_monetdb_catalog_statement_shapes``) already have — no MSSQL server
exists in this sandbox, so the statement TEXT is the testable surface.
"""

from __future__ import annotations

import pytest

from mssql2monetdb_spark.config.properties import DIALECTS
from mssql2monetdb_spark.engine.watermark import trigger_probe_sql
from mssql2monetdb_spark.sources.jdbc import is_identifier_resolution_error


def test_mssql_trigger_statement_verbatim():
    """The T-SQL trigger probe, exactly as the reference emits it
    (``SourceDatabaseType.java:21-25``): TOP 1, bracket-quoted
    identifiers, descending order."""
    got = trigger_probe_sql(
        "jdbc:jtds:sqlserver://db1:1433/mart", "dim_customer", "load_ts"
    )
    assert got == (
        "SELECT TOP 1 [load_ts] FROM [dim_customer] ORDER BY [load_ts] DESC"
    )
    # Microsoft's own driver URL scheme reaches the same dialect
    assert trigger_probe_sql("jdbc:sqlserver://db1;db=x", "t", "c") == (
        "SELECT TOP 1 [c] FROM [t] ORDER BY [c] DESC"
    )


def test_postgresql_trigger_statement_verbatim():
    """``SourceDatabaseType.java:45-49``: bare identifiers, LIMIT 1."""
    got = trigger_probe_sql("jdbc:postgresql://db1:5432/mart", "t", "c")
    assert got == "SELECT c FROM t ORDER BY c DESC LIMIT 1"


def test_other_dialects_use_portable_max_probe():
    """Derby/MonetDB (and anything unrecognized) have no dialect-native
    trigger statement — the ANSI ``SELECT MAX`` pushdown is the probe."""
    assert trigger_probe_sql("jdbc:derby:/tmp/db", "t", "c") is None
    assert trigger_probe_sql("jdbc:monetdb://h:50000/db", "t", "c") is None


def test_mssql_url_synthesis_and_default_port():
    """URL template + default port + jTDS driver class
    (``SourceDatabaseType.java:16-18,28-30``; ``CopyToolConfig.java``
    loads the jTDS driver)."""
    d = DIALECTS["mssql"]
    assert d["port"] == 1433
    assert d["driver"] == "net.sourceforge.jtds.jdbc.Driver"
    assert d["url"].format(server="s", port=1433, database="db") == (
        "jdbc:jtds:sqlserver://s:1433/db"
    )


def test_postgresql_url_synthesis_and_default_port():
    """``SourceDatabaseType.java:40-43,52-54``."""
    d = DIALECTS["postgresql"]
    assert d["port"] == 5432
    assert d["url"].format(server="s", port=5432, database="db") == (
        "jdbc:postgresql://s:5432/db"
    )


def test_identifier_error_classifier():
    """The unquoted-casing retry must fire ONLY on identifier-resolution
    SQLStates — Derby 42X04/42X05, SQL-Server-class 42S22/42S02,
    PostgreSQL 42703/42P01 — never on transient failures."""
    assert is_identifier_resolution_error(
        Exception("ERROR 42X04: Column 'X' is either not in any table ...")
    )
    assert is_identifier_resolution_error(Exception("SQLState: 42S22 col not found"))
    assert is_identifier_resolution_error(Exception('ERROR: column "c" 42703'))
    assert not is_identifier_resolution_error(
        Exception("ERROR 40XL1: A lock could not be obtained within the time")
    )
    assert not is_identifier_resolution_error(Exception("connection reset"))


def test_transient_quoted_probe_failure_surfaces_not_retries(monkeypatch):
    """ADVICE r10 regression: a transient failure (lock timeout) of the
    quoted MAX probe must raise — NOT silently run the unquoted form,
    which the store case-normalizes and can resolve to a DIFFERENT
    same-named column where both casings exist."""
    from mssql2monetdb_spark.config.spec import SourceSpec
    from mssql2monetdb_spark.engine import watermark as wm

    calls: list[bool] = []

    class _Boom(Exception):
        pass

    def fake_frame(spark, source, table, column, *, quoted=True):
        calls.append(quoted)

        class _F:
            def collect(self):
                raise _Boom("ERROR 40XL1: lock timeout")

        return _F()

    monkeypatch.setattr(wm, "jdbc_max_probe_frame", fake_frame)
    src = SourceSpec(name="s", format="jdbc", options={"url": "jdbc:derby:/x"})
    with pytest.raises(_Boom):
        wm.probe_max_jdbc(None, src, "t", "c")
    assert calls == [True]  # no unquoted second attempt


def test_identifier_quoted_probe_failure_retries_unquoted(monkeypatch):
    """The healthy half of the gate: a 42X04-class failure still walks the
    ladder to the store-cased unquoted identifier."""
    from mssql2monetdb_spark.config.spec import SourceSpec
    from mssql2monetdb_spark.engine import watermark as wm

    calls: list[bool] = []

    def fake_frame(spark, source, table, column, *, quoted=True):
        calls.append(quoted)

        class _F:
            def collect(self):
                if quoted:
                    raise Exception("ERROR 42X04: Column 'C' is not in any table")
                return [(41,)]

        return _F()

    monkeypatch.setattr(wm, "jdbc_max_probe_frame", fake_frame)
    src = SourceSpec(name="s", format="jdbc", options={"url": "jdbc:derby:/x"})
    got = wm.probe_max_jdbc(None, src, "t", "c")
    assert (got.value, got.type_name) == (41, "bigint")
    assert calls == [True, False]
