"""JDBC warehouse sink: the reference's MonetDB-side publish lifecycle
against any JDBC target — versioned physical tables, a transactional view
switch, and keep-2 retention — executed over a real connection.

This is the direction the reference actually loads (`CopyTool` PHASES 2-4
against MonetDB): each load lands in a NEW physical table
``name_yyyy_MM_dd_HH_mm_ss``, the public name is a VIEW dropped and
recreated inside one transaction (``MonetDBUtil.dropAndRecreateViewForTable``,
``MonetDBUtil.java:442-529``), and versions beyond the newest 2 are dropped
(``CopyTool.dropOldTables``, ``CopyTool.java:554-602``). The engine's
parquet ``VersionedCatalog`` is the Spark-first translation of the same
protocol; this module keeps the protocol itself available against a real
warehouse so a user pointing the engine at MonetDB/Derby gets the
reference's zero-downtime semantics, not just a table dump.

Catalog probes are dialect-dispatched: Derby (integration-tested — ships
with Spark) reads ``SYS.SYSTABLES``/``SYS.SYSVIEWS``; MonetDB uses the
reference's own ``sys.tables`` queries verbatim (``MonetDBUtil.java:41-88``
existence/is-table, ``CopyTool.java:562-565`` version listing) — statement
shapes unit-pinned, no MonetDB server exists in this sandbox.

Scale note: every statement here is control-plane (catalog probes, DDL,
view switch) — O(versions), never O(rows). The data plane is
``jdbc_bulk_loader`` (distributed staging + server-side COPY, INSERT
fallback) or the distributed batched writer; the warehouse never sees a
driver-side row loop.
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from ..config.spec import SourceSpec
from ..sources.jdbc import jdbc_bulk_loader, jdbc_writer
from .publish import RETAIN_VERSIONS, VERSION_RE, physical_name

log = logging.getLogger(__name__)

#: dialect-specific catalog probe SQL; {name}/{prefix} are substituted with
#: store-cased identifiers (Derby upper-cases unquoted names, MonetDB
#: lower-cases them — SourceDatabaseType semantics).
CATALOG_SQL = {
    "derby": {
        "exists": (
            "SELECT TABLENAME FROM SYS.SYSTABLES "
            "WHERE TABLENAME = '{name}' AND TABLETYPE IN ('T', 'V')"
        ),
        "is_table": (
            "SELECT TABLENAME FROM SYS.SYSTABLES "
            "WHERE TABLENAME = '{name}' AND TABLETYPE = 'T'"
        ),
        "list_versions": (
            "SELECT TABLENAME FROM SYS.SYSTABLES "
            "WHERE TABLETYPE = 'T' AND TABLENAME LIKE '{prefix}20%' "
            "ORDER BY TABLENAME DESC"
        ),
        "view_definition": (
            "SELECT v.VIEWDEFINITION FROM SYS.SYSVIEWS v "
            "JOIN SYS.SYSTABLES t ON v.TABLEID = t.TABLEID "
            "WHERE t.TABLENAME = '{name}'"
        ),
    },
    # reference statements, near-verbatim (schema clause omitted: the
    # engine's SourceSpec URL already pins the database/schema):
    # exists/is_table = MonetDBUtil.java:41-88; list = CopyTool.java:562-565
    "monetdb": {
        "exists": "SELECT name FROM sys.tables WHERE name = '{name}'",
        "is_table": (
            "SELECT name FROM sys.tables WHERE name = '{name}' AND query IS NULL"
        ),
        "list_versions": (
            "SELECT name FROM sys.tables WHERE name LIKE '{prefix}20%' "
            "AND query IS NULL ORDER BY name DESC"
        ),
        "view_definition": "SELECT query FROM sys.tables WHERE name = '{name}'",
    },
    "postgresql": {
        "exists": (
            "SELECT table_name FROM information_schema.tables "
            "WHERE table_name = '{name}'"
        ),
        "is_table": (
            "SELECT table_name FROM information_schema.tables "
            "WHERE table_name = '{name}' AND table_type = 'BASE TABLE'"
        ),
        "list_versions": (
            "SELECT table_name FROM information_schema.tables "
            "WHERE table_name LIKE '{prefix}20%' AND table_type = 'BASE TABLE' "
            "ORDER BY table_name DESC"
        ),
        "view_definition": (
            "SELECT view_definition FROM information_schema.views "
            "WHERE table_name = '{name}'"
        ),
    },
}


def parse_view_target(text: str | None) -> str | None:
    """The physical relation a stored view definition selects FROM.

    Tolerates the stores' rendering differences: optional schema
    qualification (``"sys"."t_2024_..."``), quoting, trailing semicolon,
    and full create-statement text (MonetDB keeps the whole
    ``create view ... as select ...`` in ``sys.tables.query``)."""
    if not text:
        return None
    text = text.strip().rstrip(";").strip()
    m = re.search(
        r'FROM\s+(?:"?[A-Za-z0-9_]+"?\s*\.\s*)?"?([A-Za-z0-9_]+)"?\s*$',
        text,
        re.IGNORECASE,
    )
    return m.group(1) if m else None


@dataclass
class JdbcWarehouse:
    """Versioned publish lifecycle against a JDBC warehouse target."""

    spark: SparkSession
    source: SourceSpec

    # -- plumbing ---------------------------------------------------------
    @property
    def dialect(self) -> str:
        """Catalog-probe dialect — its own gate, distinct from bulk-import
        support: a warehouse needs CATALOG_SQL to be a sink at all (even
        in insert mode), while server-side COPY support is the bulk
        loader's concern."""
        url = self.source.options["url"]
        for prefix, name in (
            ("jdbc:derby:", "derby"),
            ("jdbc:monetdb:", "monetdb"),
            ("jdbc:postgresql:", "postgresql"),
        ):
            if url.startswith(prefix):
                return name
        raise ValueError(
            "jdbc sink requires a dialect with catalog probes "
            f"(derby/monetdb/postgresql), got {url.split(':', 2)[:2]}"
        )

    def _store_name(self, name: str) -> str:
        """Unquoted identifiers are case-normalized by the store: Derby
        upper-cases, MonetDB/PostgreSQL lower-case."""
        return name.upper() if self.dialect == "derby" else name.lower()

    def _connect(self):
        from ..sources.jdbc import driver_connection

        return driver_connection(self.spark, self.source.options)

    def _probe_on(self, st, kind: str, **subst: str) -> list[str]:
        """Run a catalog probe on an EXISTING statement — inside the view
        switch this sees the transaction's own uncommitted drops."""
        rs = st.executeQuery(CATALOG_SQL[self.dialect][kind].format(**subst))
        out = []
        while rs.next():
            out.append(rs.getString(1))
        return out

    def _probe(self, kind: str, **subst: str) -> list[str]:
        conn = self._connect()
        try:
            st = conn.createStatement()
            try:
                return self._probe_on(st, kind, **subst)
            finally:
                st.close()
        finally:
            conn.close()

    def _execute(self, *statements: str, transactional: bool = False) -> None:
        conn = self._connect()
        committed = False
        try:
            if transactional:
                conn.setAutoCommit(False)
            st = conn.createStatement()
            try:
                for sql in statements:
                    st.execute(sql)
            finally:
                st.close()
            if transactional:
                conn.commit()
                committed = True
        finally:
            # roll back an open transaction before close: embedded Derby
            # raises SQLState 25001 from close() on an active transaction,
            # which would mask the original failure and leak the connection
            if transactional and not committed:
                try:
                    conn.rollback()
                except Exception:  # noqa: BLE001 — closing anyway
                    log.warning("rollback before close failed", exc_info=True)
            conn.close()

    # -- catalog probes (ops #15-16, MonetDBUtil.java:41-88) --------------
    def exists(self, name: str) -> bool:
        return bool(self._probe("exists", name=self._store_name(name)))

    def is_table(self, name: str) -> bool:
        return bool(self._probe("is_table", name=self._store_name(name)))

    def table_versions(self, table: str) -> list[str]:
        """All physical versions, newest first (CopyTool.java:562-565 —
        client-side regex confirms the version suffix, same as the parquet
        catalog's listing filter)."""
        store = self._store_name(table)
        out = []
        for name in self._probe("list_versions", prefix=f"{store}_"):
            if VERSION_RE.search(name) and name[:-20] == store:
                out.append(name)
        return out

    def current_version(self, table: str) -> str | None:
        """The physical table the public view points at, parsed from the
        stored view definition (``... FROM <physical>``). The pattern
        tolerates the stores' rendering differences: optional schema
        qualification (``"sys"."t_2024_..."``), quoting, a trailing
        semicolon, and full create-statement text (MonetDB keeps the
        whole ``create view ... as select ...`` in sys.tables.query)."""
        rows = self._probe("view_definition", name=self._store_name(table))
        return parse_view_target(rows[0]) if rows else None

    # -- PHASE 2: load ----------------------------------------------------
    def load_version(
        self,
        df: DataFrame,
        table: str,
        load_date: datetime,
        *,
        method: str = "copy",
        table_ddl: str | None = None,
        staging_dir: str | None = None,
        expected_count: int | None = None,
    ) -> str:
        """Land the frame in a NEW versioned physical table; returns the
        physical name. ``method="copy"`` is the staged-CSV server-side
        import with its own INSERT degradation (``jdbc_bulk_loader``);
        ``method="insert"`` forces the distributed batched writer against
        a mapper-derived DDL.

        Crash-retry: a colliding physical name that is NOT the live view's
        target is an unpublished corpse from a crashed attempt — it is
        dropped and rebuilt (the same-name reclaim the parquet catalog does
        with ``mode("overwrite")``). A collision WITH the live target
        raises: rebuilding a table readers are on is never safe."""
        physical = physical_name(table, load_date)
        if self.exists(physical):
            current = self.current_version(table)
            if current and current.lower() == physical.lower():
                raise RuntimeError(
                    f"{physical} is the live published version; refusing to "
                    "rebuild it in place — pick a later load_date"
                )
            self._execute(f"DROP TABLE {physical}")
        if method == "copy":
            jdbc_bulk_loader(
                self.spark,
                df,
                self.source,
                physical,
                table_ddl=table_ddl,
                staging_dir=staging_dir,
                expected_count=expected_count,
            )
        elif method == "insert":
            from ..schema.mapper import spark_schema_to_derby_ddl

            ddl = table_ddl if table_ddl is not None else spark_schema_to_derby_ddl(df.schema)
            self._execute(f"CREATE TABLE {physical} ({ddl})")
            jdbc_writer(df, self.source, physical, mode="append")
        else:
            raise ValueError(f"method must be copy|insert, got {method!r}")
        return physical

    # -- PHASE 3: transactional view switch (MonetDBUtil.java:442-529) ----
    def publish(self, table: str, physical: str) -> None:
        """Drop the public name (view OR stale table) and recreate the view
        pointing at ``physical`` — one transaction, so readers see either
        the old version or the new one, never an absent name.

        The reference re-probes in a bounded loop to survive a MonetDB
        duplicate-view bug (``MonetDBUtil.java:462-498``); kept with the
        same bound of 10.
        """
        if not self.exists(physical):
            raise FileNotFoundError(f"physical table {physical} does not exist")
        store = self._store_name(table)
        conn = self._connect()
        committed = False
        try:
            conn.setAutoCommit(False)
            st = conn.createStatement()
            try:
                for i in range(10):
                    if not self._probe_on(st, "exists", name=store):
                        break
                    if i > 0:
                        log.warning("%s still exists despite previous DROP", table)
                    kind = (
                        "TABLE"
                        if self._probe_on(st, "is_table", name=store)
                        else "VIEW"
                    )
                    st.execute(f"DROP {kind} {table}")
                st.execute(f"CREATE VIEW {table} AS SELECT * FROM {physical}")
            finally:
                st.close()
            conn.commit()
            committed = True
        finally:
            # a failed switch must roll back before close (see _execute):
            # readers keep the OLD view, and the original exception — not
            # Derby's 25001 active-transaction close error — propagates
            if not committed:
                try:
                    conn.rollback()
                except Exception:  # noqa: BLE001 — closing anyway
                    log.warning("rollback before close failed", exc_info=True)
            conn.close()

    # -- PHASE 4: retention (CopyTool.java:554-602) ------------------------
    def cleanup(self, table: str, *, retain: int = RETAIN_VERSIONS) -> list[str]:
        """Drop versions beyond the newest ``retain`` (current + backup),
        never the one the live view references."""
        current = self.current_version(table)
        dropped = []
        for physical in self.table_versions(table)[retain:]:
            if current and physical.lower() == current.lower():
                continue
            self._execute(f"DROP TABLE {physical}")
            dropped.append(physical)
        return dropped

    def drop_table(self, table: str) -> None:
        """Drop the public name and ALL versions (op #15)."""
        if self.exists(table):
            self._execute(
                f"DROP {'TABLE' if self.is_table(table) else 'VIEW'} {table}"
            )
        for physical in self.table_versions(table):
            self._execute(f"DROP TABLE {physical}")

    # -- one-call export ---------------------------------------------------
    def export(
        self,
        df: DataFrame,
        table: str,
        load_date: datetime,
        *,
        method: str = "copy",
        table_ddl: str | None = None,
        staging_dir: str | None = None,
        expected_count: int | None = None,
    ) -> str:
        """PHASES 2-4 in one call: load a new version, switch the view,
        reap old versions. Returns the physical name published."""
        physical = self.load_version(
            df,
            table,
            load_date,
            method=method,
            table_ddl=table_ddl,
            staging_dir=staging_dir,
            expected_count=expected_count,
        )
        self.publish(table, physical)
        self.cleanup(table)
        return physical
