"""Executor-loss resilience: kill -9 an executor mid-query, result must hold.

At 1000 executors, losing one mid-job is routine — preemption, OOM
kills, hardware. Spark's answer is stage retry + shuffle refetch, but
that machinery only yields CORRECT results if the engine's operators
are deterministic re-executed (a task that produces different output on
retry silently corrupts the final result — exactly the bug class the
layout-invariance sweep chases from a different angle).

This probe runs a query on ``local-cluster[2,2,1024]``, SIGKILLs one
executor JVM partway through, lets the replacement executor finish the
job, and compares the result against the DuckDB oracle.  The worker
respawns a fresh executor automatically, so the job completes on
retried stages.

Usage: executor_loss_probe.py [--sf-dir DIR] [--query NAME]
                              [--kill-after SECONDS] [--repeat N]
"""
from __future__ import annotations

import os
import signal
import subprocess
import sys
import threading
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

from pyspark.sql import SparkSession

from oracle_harness import duckdb_connection, compare_frames


def _flag(name, default):
    if name in sys.argv:
        i = sys.argv.index(name)
        if i + 1 >= len(sys.argv):
            sys.exit(f"error: {name} requires a value")
        return sys.argv[i + 1]
    return default


SF_DIR = _flag("--sf-dir", "/root/testdata/sf0.1")
QUERY = _flag("--query", "dedup_minhash_lsh")
KILL_AFTER = float(_flag("--kill-after", "3.0"))
REPEAT = int(_flag("--repeat", "3"))

spark = (
    SparkSession.builder.appName("executor-loss-probe")
    .master("local-cluster[2,2,1024]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    # a killed executor must not fail the job before the retry works:
    # raise task retries above the default so FetchFailed reschedules
    .config("spark.task.maxFailures", "8")
    .config("spark.stage.maxConsecutiveAttempts", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as mod

qs = mod.queries()
osql = mod.oracle_sql()
if QUERY not in qs:
    sys.exit(f"error: unknown query {QUERY!r}")


def _driver_jvm_pid() -> int:
    """The py4j gateway JVM is a direct child of this Python process."""
    out = subprocess.run(
        ["pgrep", "-P", str(os.getpid()), "java"], capture_output=True, text=True
    ).stdout
    pids = [int(p) for p in out.split()]
    if not pids:
        sys.exit("error: cannot find driver JVM child process")
    return pids[0]


_DRIVER_JVM = None


def executor_pids() -> list[int]:
    """Executor JVMs spawned by THIS driver's in-process Workers only —
    a concurrent Spark run's executors must never be collateral."""
    global _DRIVER_JVM
    if _DRIVER_JVM is None:
        _DRIVER_JVM = _driver_jvm_pid()
    out = subprocess.run(
        ["pgrep", "-P", str(_DRIVER_JVM)], capture_output=True, text=True
    ).stdout
    kids = [int(p) for p in out.split()]
    execs = []
    for pid in kids:
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                if b"CoarseGrainedExecutorBackend" in f.read():
                    execs.append(pid)
        except OSError:
            continue
    return execs


# keep the connection referenced: the relation from .sql() executes
# lazily, and a GC'd temporary connection closes underneath .df()
_duck = duckdb_connection(SF_DIR)
oracle_pdf = _duck.sql(osql[QUERY]).df() if QUERY in osql else None

failures = 0
for attempt in range(1, REPEAT + 1):
    result = {}

    def run():
        result["pdf"] = qs[QUERY](spark, SF_DIR).toPandas()

    t = threading.Thread(target=run)
    t.start()
    time.sleep(KILL_AFTER)
    pids = executor_pids()
    killed = None
    if pids and t.is_alive():
        killed = pids[0]
        os.kill(killed, signal.SIGKILL)
    t.join()
    pdf = result.get("pdf")
    if pdf is None:
        status = "JOB FAILED"
    elif killed is None:
        status = f"vacuous (query finished before kill at {KILL_AFTER}s — lower --kill-after)"
    elif oracle_pdf is not None:
        probs = compare_frames(pdf, oracle_pdf)
        status = (
            f"killed executor pid {killed} mid-query -> MATCH"
            if not probs
            else f"killed pid {killed} -> MISMATCH: " + "; ".join(probs)
        )
    else:
        status = f"killed pid {killed} -> completed, {len(pdf)} rows (no oracle)"
    print(f"  attempt {attempt}: {status}", flush=True)
    if "MISMATCH" in status or "FAILED" in status:
        failures += 1
    # let the worker respawn a replacement before the next round
    time.sleep(3)

print("RESULT:", "SURVIVES EXECUTOR LOSS" if failures == 0 else f"{failures} failures")
sys.exit(1 if failures else 0)
