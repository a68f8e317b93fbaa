"""Watermark trigger: change detection that skips unchanged sources.

Ports the decision table of ``CopyTool.checkForNewData``
(``CopyTool.java:332-477``) exactly — the fail-open rules matter:

| condition                                   | verdict        | ref |
|---------------------------------------------|----------------|-----|
| no trigger configured                       | run            | 186-190 |
| probe returns no rows / NULL max            | run (fail-open)| 352 |
| probe raises                                | run (fail-open)| 375-381 |
| no persisted state                          | run            | 420-427 |
| state checksum != current spec checksum     | run            | 434-438 |
| state type != probe type                    | run            | 428-433 |
| probe value > state value (typed compare)   | run            | 444-473 |
| otherwise                                   | SKIP (exit 2)  | 95-98 |

State is persisted ONLY after a fully successful run
(``CopyTool.java:305-309``) — a failed run re-processes.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass
from datetime import date, datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

_TYPES = ("bigint", "date", "timestamp")


@dataclass(frozen=True)
class Watermark:
    value: int | date | datetime
    type_name: str  # one of _TYPES

    def to_json(self) -> dict:
        v = self.value
        if self.type_name == "date":
            v = v.isoformat()
        elif self.type_name == "timestamp":
            v = v.isoformat(sep=" ")
        return {"value": v, "type": self.type_name}

    @staticmethod
    def from_json(obj: dict) -> "Watermark":
        t, v = obj["type"], obj["value"]
        if t == "date":
            v = date.fromisoformat(v)
        elif t == "timestamp":
            v = datetime.fromisoformat(v)
        else:
            v = int(v)
        return Watermark(v, t)


def _typed_watermark(value, column: str) -> Watermark | None:
    if value is None:
        return None
    if isinstance(value, datetime):
        return Watermark(value, "timestamp")
    if isinstance(value, date):
        return Watermark(value, "date")
    if isinstance(value, int):
        return Watermark(int(value), "bigint")
    raise TypeError(
        f"trigger column {column!r} has unsupported type {type(value).__name__}; "
        f"supported: BIGINT/INTEGER, DATE, TIMESTAMP (CopyTool.java:356-370)"
    )


def probe_max(df: DataFrame, column: str) -> Watermark | None:
    """``SELECT MAX(col)`` typed probe (dialect TOP-1/LIMIT-1 queries in the
    reference, ``SourceDatabaseType.java:21-25,45-49`` — same value).

    The aggregate is partial/map-side over the scan (one scalar to the
    driver); on columnar file sources the scan prunes to the single probe
    column. JDBC sources should prefer :func:`jdbc_max_probe_frame` —
    Spark's V1 JDBC relation does NOT push aggregates, so this form would
    pull the whole trigger column across the wire at a 100 TB source."""
    row = df.agg(F.max(column).alias("m")).collect()[0]
    return _typed_watermark(row["m"], column)


def jdbc_max_probe_frame(
    spark, source, table: str, column: str, *, quoted: bool = True
) -> DataFrame:
    """One-row frame whose MAX executes ON the source server.

    Query-mode pushdown (``SELECT MAX("col") AS m FROM table`` shipped
    verbatim as the JDBC relation's query — the reference's dialect
    probe, ``SourceDatabaseType.java:21-25,45-49``): the source computes
    the aggregate and exactly ONE row crosses the wire, regardless of
    table size. Spark's V1 JDBC relation never pushes a Spark-side
    ``agg(max(...))`` down (pinned by ``tests/test_watermark.py``), so
    at a 100 TB source the Spark-side form is a full-column pull — this
    frame is the scale-correct probe shape. With ``quoted=True`` (default)
    the column is double-quoted (ANSI; matches the case-exact quoted
    identifiers Spark's JDBC writer creates); ``quoted=False`` ships the
    bare identifier so the STORE case-normalizes it (columns created
    unquoted are stored upper- or lower-cased and never match a quoted
    probe). The table name travels verbatim like every other ``dbtable``
    here.
    """
    opts = {
        k: v
        for k, v in source.options.items()
        if k
        not in (
            "dbtable",
            "query",
            "partitionColumn",
            "lowerBound",
            "upperBound",
            "numPartitions",
        )
    }
    ident = f'"{column}"' if quoted else column
    opts["query"] = f"SELECT MAX({ident}) AS m FROM {table}"
    return spark.read.format("jdbc").options(**opts).load()


def trigger_probe_sql(url: str, table: str, column: str) -> str | None:
    """The reference's dialect-NATIVE trigger statements, verbatim
    (``SourceDatabaseType.java:21-25,45-49``):

    - MSSQL: ``SELECT TOP 1 [col] FROM [table] ORDER BY [col] DESC``
      (bracket quoting, TOP-n — the T-SQL shape);
    - PostgreSQL: ``SELECT col FROM table ORDER BY col DESC LIMIT 1``
      (bare identifiers, exactly as the reference ships them).

    ``None`` for every other URL — the ANSI ``SELECT MAX`` pushdown is the
    engine's portable probe (same value, same one-row wire cost)."""
    if url.startswith(("jdbc:jtds:sqlserver:", "jdbc:sqlserver:")):
        return f"SELECT TOP 1 [{column}] FROM [{table}] ORDER BY [{column}] DESC"
    if url.startswith("jdbc:postgresql:"):
        return f"SELECT {column} FROM {table} ORDER BY {column} DESC LIMIT 1"
    return None


def probe_max_jdbc(spark, source, table: str, column: str) -> Watermark | None:
    """Typed watermark from the source-side MAX probe (see
    :func:`jdbc_max_probe_frame`).

    On MSSQL/PostgreSQL URLs the probe ships the reference's verbatim
    dialect statement (:func:`trigger_probe_sql` — TOP-1 / LIMIT-1, same
    value and wire cost as MAX); on any failure there it degrades to the
    portable ANSI ladder below.

    Identifier-case ladder: the quoted form is tried first (Spark-written
    case-exact columns), then the UNQUOTED form (store-case-normalized —
    a column created unquoted is stored upper-cased in Derby/MSSQL-style
    stores and the quoted engine-cased probe fails on EVERY run, which
    would otherwise silently trade the one-row pushdown for the caller's
    Spark-side full-column pull at a 100 TB source). The unquoted retry is
    GATED on identifier-resolution SQLStates (42X04/42S22-class): a
    transient failure of the quoted probe must surface as itself, not run
    an unquoted form the store could case-normalize onto a DIFFERENT
    same-named column (ADVICE r10). Only identifier failures of both
    forms reach the caller's degradation path."""
    from ..sources.jdbc import is_identifier_resolution_error

    native = trigger_probe_sql(source.options.get("url", ""), table, column)
    if native is not None:
        opts = {
            k: v for k, v in source.options.items() if k not in ("dbtable", "query")
        }
        opts["query"] = native
        try:
            rows = spark.read.format("jdbc").options(**opts).load().collect()
            return _typed_watermark(rows[0][0] if rows else None, column)
        except Exception:  # noqa: BLE001 — degrade to the portable ladder
            log.warning(
                "dialect-native trigger probe failed for %s.%s — degrading "
                "to the ANSI MAX ladder",
                table,
                column,
                exc_info=True,
            )
    try:
        value = jdbc_max_probe_frame(spark, source, table, column).collect()[0][0]
    except Exception as exc:
        if not is_identifier_resolution_error(exc):
            raise
        log.warning(
            "quoted MAX probe failed for %s.%s (identifier resolution) — "
            "retrying with the store-cased unquoted identifier",
            table,
            column,
            exc_info=True,
        )
        value = (
            jdbc_max_probe_frame(spark, source, table, column, quoted=False)
            .collect()[0][0]
        )
    return _typed_watermark(value, column)


class WatermarkStore:
    """State files ``job-<checksum>_lastrun.json`` under ``state_dir``
    (reference naming ``CopyTool.java:320-324``)."""

    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _path(self, checksum: str, job_id: str = "") -> str:
        suffix = f"-{job_id}" if job_id else ""
        return os.path.join(self.state_dir, f"job-{checksum}{suffix}_lastrun.json")

    def load(self, checksum: str, job_id: str = "") -> Watermark | None:
        path = self._path(checksum, job_id)
        if not os.path.exists(path):
            return None
        try:
            with open(path) as fh:
                obj = json.load(fh)
            if obj.get("checksum") != checksum:
                return None  # checksum mismatch invalidates state
            return Watermark.from_json(obj)
        except Exception:
            log.warning("unreadable trigger state %s — failing open", path, exc_info=True)
            return None

    def save(self, checksum: str, wm: Watermark, job_id: str = "") -> None:
        path = self._path(checksum, job_id)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({**wm.to_json(), "checksum": checksum}, fh)
        os.replace(tmp, path)

    # -- probe-degradation persistence (ADVICE r10) -----------------------
    # The escalation rule "same job, consecutive runs -> ERROR" must hold
    # in the normal run-per-invocation deployment (cron/scheduler reboots
    # the process every tick), so the counter lives HERE beside the
    # watermark, not in CopyEngine's process memory.

    def _degradation_path(self, checksum: str, job_id: str) -> str:
        return os.path.join(
            self.state_dir, f"job-{checksum}-{job_id}_probe_degradations.json"
        )

    def load_degradations(self, checksum: str, job_id: str) -> int:
        path = self._degradation_path(checksum, job_id)
        if not os.path.exists(path):
            return 0
        try:
            with open(path) as fh:
                return int(json.load(fh).get("n", 0))
        except Exception:
            log.warning("unreadable degradation state %s", path, exc_info=True)
            return 0

    def save_degradations(self, checksum: str, job_id: str, n: int) -> None:
        path = self._degradation_path(checksum, job_id)
        if n <= 0:
            if os.path.exists(path):
                os.remove(path)
            return
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"n": int(n)}, fh)
        os.replace(tmp, path)


def has_new_data(probe: Watermark | None, state: Watermark | None) -> bool:
    """The typed compare + fail-open rules (CopyTool.java:420-473)."""
    if probe is None:
        return True  # empty/NULL probe: fail open (CopyTool.java:352)
    if state is None:
        return True  # no/invalid/mismatched state (CopyTool.java:420-438)
    if state.type_name != probe.type_name:
        return True  # type changed under us: fail open (CopyTool.java:428-433)
    return probe.value > state.value  # strictly newer (CopyTool.java:444-473)
