"""True multi-executor conformance sweep via ``local-cluster`` mode.

``local[*]`` runs every task in the driver JVM: broadcasts are never
serialized, Python workers share one process tree, and closure/codec
bugs hide.  Spark's ``local-cluster[N,cores,mem]`` master launches N
REAL executor JVMs with the full RPC/serialization/broadcast/shuffle
stack — the closest a single machine gets to a 1000-executor cluster's
execution semantics.

This probe re-runs every registry query on ``local-cluster[2,2,2048]``
and compares against the same DuckDB oracle the driver gate uses.  A
query that passes here has survived: TorrentBroadcast serialization,
cross-process shuffle fetch, per-executor Python worker spawn (pandas
UDFs / applyInPandas / UDTFs), and task-closure pickling.

With ``--master local-cluster[2,2,1024]`` (or any other shape) the same
sweep doubles as a small-executor probe (1 GB executors must still
complete and match at sf0.1).  ``--force-spill`` goes further: it drops
Spark's internal spill thresholds to toy sizes so EVERY sort, window
buffer, sort-merge-join buffer, and hash aggregate actually takes the
spill / sort-fallback path regardless of data size — local fixtures fit
in memory, so without this the spill code never runs.  At 100 TB a
partition that outgrows execution memory is routine; matching the
oracle while force-spilling proves the operators' results don't depend
on staying memory-resident.

(A ``--speculation`` mode was tried and removed: even with quantile 0,
multiplier 0.1, minTaskRuntime 0 and 20 ms checks, zero speculative
attempts fired on local-cluster shapes — fixture tasks finish before
the speculation scheduler can launch a copy, so the sweep would have
been vacuous evidence.  Task re-execution determinism is covered
non-vacuously by ``executor_loss_probe.py``, whose SIGKILLs force real
task re-runs.)

Usage: cluster_mode_probe.py [--sf-dir DIR] [--only q1,q2,...]
                             [--master local-cluster[2,2,2048]]
                             [--force-spill]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

# Executor-side Python workers must resolve to THIS interpreter, not a
# bare `python3` from PATH inside the launched executor JVMs.
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


SF_DIR = _flag("--sf-dir", "/root/testdata/sf0.001")
MASTER = _flag("--master", "local-cluster[2,2,2048]")
ONLY = _flag("--only", None)
ONLY = set(ONLY.split(",")) if ONLY else None

FORCE_SPILL = "--force-spill" in sys.argv


def _auto_spill_rows(sf_dir: str) -> str:
    """Derive the forced-spill threshold from the fixture size.

    Rows an operator buffers before spilling. The threshold must scale
    with the data: too high and small fixtures never spill (vacuous
    probe); too low and the probe hits a RESOURCE limit instead of a
    correctness one — each spill run costs a ~1 MB reader buffer at merge
    time, so a whole-table window partition shredded into 64-row runs
    OOMs the executor on merge-reader buffers alone (measured: the three
    largest-window-partition queries die at 64 — SCALE.md). The worst
    case is an unpartitioned window frame: ALL rows of the largest table
    in ONE partition. Capping spill runs at 64 per partition keeps the
    merge fan-in ~64 MB while still forcing dozens of real spills
    everywhere. Reproduces the hand-tuned values: 1024 at sf0.001 (floor)
    and ~9.4k at sf0.1 (vs 8192 tuned by hand in round 5).
    """
    import pyarrow.parquet as pq

    max_rows = 0
    for fname in os.listdir(sf_dir):
        if fname.endswith(".parquet"):
            path = os.path.join(sf_dir, fname)
            max_rows = max(max_rows, pq.ParquetFile(path).metadata.num_rows)
    return str(max(1024, -(-max_rows // 64)))


SPILL_ROWS = _flag("--spill-threshold", None) or (
    _auto_spill_rows(SF_DIR) if FORCE_SPILL else "1024"
)
if FORCE_SPILL:
    print(f"force-spill threshold: {SPILL_ROWS} rows", flush=True)

builder = (
    SparkSession.builder.appName("cluster-mode-probe")
    .master(MASTER)
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
)
if FORCE_SPILL:
    # Internal thresholds (see SQLConf / package.scala in the Spark
    # source): rows an operator buffers in memory before spilling to
    # disk.  Forced-low values exercise the spill / fallback path even
    # though local fixtures would comfortably fit in memory.
    for key, val in {
        # UnsafeExternalSorter: spill every N records (sorts, shuffles)
        "spark.shuffle.spill.numElementsForceSpillThreshold": SPILL_ROWS,
        # window frames buffer each partition's rows
        "spark.sql.windowExec.buffer.in.memory.threshold": SPILL_ROWS,
        "spark.sql.windowExec.buffer.spill.threshold": SPILL_ROWS,
        # sort-merge-join buffers the matching right-side rows per key
        "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold": SPILL_ROWS,
        "spark.sql.sortMergeJoinExec.buffer.spill.threshold": SPILL_ROWS,
        # cartesian products (broadcast-scalar crossJoins in the corpus)
        "spark.sql.cartesianProductExec.buffer.in.memory.threshold": SPILL_ROWS,
        "spark.sql.cartesianProductExec.buffer.spill.threshold": SPILL_ROWS,
        # ObjectHashAggregate (collect_list/collect_set paths): fall back
        # to sort-based aggregation after N in-memory rows
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": "16",
    }.items():
        builder = builder.config(key, val)

spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as mod

qs = mod.queries()
osql = mod.oracle_sql()
if ONLY is not None:
    unknown = sorted(ONLY - set(qs))
    if unknown:
        sys.exit(f"error: --only names not in queries(): {unknown}")
    qs = {k: v for k, v in qs.items() if k in ONLY}

# Round 8 removed the former jdbc_roundtrip_lineitem skip: the WRITE still
# lands in a driver-JVM embedded Derby, but the partitioned READ-BACK now
# goes through a read-only ``jar:``-subprotocol snapshot
# (sources/jdbc.py:derby_snapshot_jar) that every executor JVM boots
# concurrently — the partitioned JDBC scan finally executes on real
# executor JVMs in this sweep.

duck = duckdb_connection(SF_DIR)
bad = []
for name, fn in sorted(qs.items()):
    try:
        spdf = fn(spark, SF_DIR).toPandas()
    except Exception as e:  # noqa: BLE001 — a crash IS the finding here
        print(f"  {name}: ERROR {type(e).__name__}: {str(e).splitlines()[0][:200]}", flush=True)
        bad.append(name)
        continue
    if name in osql:
        opdf = duck.sql(osql[name]).df()
        probs = compare_frames(spdf, opdf)
        status = "MATCH" if not probs else "MISMATCH: " + "; ".join(probs)
    else:
        status = f"rows-only ({len(spdf)} rows)"
    if "MISMATCH" in status:
        bad.append(name)
    print(f"  {name}: {status}", flush=True)

print("RESULT:", "ALL MATCH" if not bad else f"FAILURES: {bad}")
sys.exit(1 if bad else 0)
