"""Mid-switch crash drill for ``JdbcWarehouse`` (round-11 verdict item 5).

The r10 work proved the EXCEPTION path (failed switch rolls back, readers
keep the old view — ``test_publish_failure_rolls_back_and_keeps_old_view``).
This probe drills the path exceptions can't reach: a HARD DRIVER DEATH
(``os._exit`` — no ``finally``, no rollback call, no connection close) at
each of the two crash windows the reference's bounded re-probe loop guards
(``MonetDBUtil.java:462-498``):

- ``between_load_and_switch`` — the new physical table is fully bulk-loaded
  but the view still points at the old version (the window between PHASE 2
  and PHASE 3 of ``CopyTool.doCopy``);
- ``mid_switch`` — INSIDE the switch transaction, after ``DROP VIEW`` and
  before ``CREATE VIEW`` (the half-state a non-transactional switch would
  expose).

For each window the probe:

1. boots a CHILD driver process that publishes v1, then attempts v2 with
   the fault hook armed — the child dies with ``os._exit(42)`` at the
   window;
2. reopens the SAME Derby database from the parent (fresh JVM boot →
   Derby's recovery log discards the uncommitted switch transaction) and
   asserts the READER INVARIANT: the public view exists, points at v1, and
   serves exactly v1's rows — never an absent name, never v2's content;
3. reruns the v2 export WITHOUT the hook (same load_date — the crash-retry
   identity) and asserts CONVERGENCE: the view now serves v2's rows, the
   v2 physical was reclaimed-and-rebuilt (not duplicated), and retention
   sees a sane version list.

Usage: python scripts/warehouse_crash_probe.py
Prints one JSON line per window plus RESULT: OK/FAIL; exit 0 iff all pass.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CHILD_EXIT = 42
V1_ROWS = 5
V2_ROWS = 9


def _session(app: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[2]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _warehouse(spark, db_path: str):
    from mssql2monetdb_spark.config.spec import SourceSpec
    from mssql2monetdb_spark.engine.export import JdbcWarehouse

    return JdbcWarehouse(
        spark,
        SourceSpec(
            name="derby_wh",
            format="jdbc",
            options={
                "url": f"jdbc:derby:{db_path};create=true",
                "driver": "org.apache.derby.jdbc.EmbeddedDriver",
            },
        ),
    )


def _frame(spark, n: int):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def child(db_path: str, crash_point: str) -> None:
    """Publish v1 cleanly, then die hard at ``crash_point`` during v2."""
    from datetime import datetime

    spark = _session("crash-child")
    wh = _warehouse(spark, db_path)
    wh.export(_frame(spark, V1_ROWS).coalesce(1), "t", datetime(2024, 6, 1))

    def bomb(point: str) -> None:
        if point == crash_point:
            os._exit(CHILD_EXIT)  # no finally, no rollback — a real crash

    wh.fault_hook = bomb
    wh.export(_frame(spark, V2_ROWS).coalesce(1), "t", datetime(2024, 6, 2))
    os._exit(7)  # reaching here means the hook never fired


def drill(crash_point: str) -> dict:
    from datetime import datetime

    db_path = os.path.join(tempfile.mkdtemp(prefix=f"whcrash_{crash_point}_"), "db")
    env = dict(os.environ, _WH_CRASH_CHILD=f"{db_path}|{crash_point}")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env, timeout=600
    )
    report: dict = {"crash_point": crash_point, "child_exit": proc.returncode}
    if proc.returncode != CHILD_EXIT:
        report["ok"] = False
        report["why"] = "child did not crash at the injected window"
        return report

    # fresh JVM: Derby boot-time recovery discards the uncommitted switch.
    # The child's orphaned JVM may survive the python driver for a few
    # seconds and still hold the Derby file lock (XSDB6) — retry the boot
    # until the OS has reaped it; a persistent XSDB6 is a real failure.
    import time

    spark = _session(f"crash-verify-{crash_point}")
    wh = _warehouse(spark, db_path)
    deadline = time.monotonic() + 120
    while True:
        try:
            wh.exists("t")
            break
        except Exception as exc:  # noqa: BLE001 — XSDB6 retry window
            if "XSDB6" not in str(exc) or time.monotonic() > deadline:
                raise
            time.sleep(2)

    cur = wh.current_version("t")
    rows = None
    if cur is not None:
        rows = spark.read.format("jdbc").options(
            url=wh.source.options["url"],
            driver=wh.source.options["driver"],
            query="SELECT COUNT(*) AS n FROM t",
        ).load().first()[0]
    report["reader_invariant"] = {
        "view_exists": wh.exists("t"),
        "current_version": cur,
        "rows_served": int(rows) if rows is not None else None,
    }
    reader_ok = (
        wh.exists("t")
        and cur is not None
        and cur.endswith("2024_06_01_00_00_00")
        and rows == V1_ROWS
    )

    # crash-retry: rerun v2 with the SAME load_date, no hook
    wh.export(_frame(spark, V2_ROWS).coalesce(1), "t", datetime(2024, 6, 2))
    cur2 = wh.current_version("t")
    rows2 = spark.read.format("jdbc").options(
        url=wh.source.options["url"],
        driver=wh.source.options["driver"],
        query="SELECT COUNT(*) AS n FROM t",
    ).load().first()[0]
    versions = wh.table_versions("t")
    report["converged"] = {
        "current_version": cur2,
        "rows_served": int(rows2),
        "versions": versions,
    }
    conv_ok = (
        cur2 is not None
        and cur2.endswith("2024_06_02_00_00_00")
        and rows2 == V2_ROWS
        and len(versions) == 2  # v1 (backup) + v2 (live) — no corpses
    )
    report["ok"] = bool(reader_ok and conv_ok)
    spark.stop()
    return report


def main() -> int:
    marker = os.environ.get("_WH_CRASH_CHILD")
    if marker:
        db_path, crash_point = marker.split("|", 1)
        child(db_path, crash_point)
        return 7  # unreachable

    ok = True
    for point in ("between_load_and_switch", "mid_switch"):
        report = drill(point)
        print(json.dumps(report))
        ok = ok and report.get("ok", False)
    print("RESULT: OK" if ok else "RESULT: FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
