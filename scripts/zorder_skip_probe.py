"""Measure parquet data skipping from Z-order clustering (engine/zorder.py).

Writes sf0.1 lineitem in three physical layouts — random (round-robin
repartition), single-column sort, and Z-order on (l_partkey, l_suppkey)
— then runs the same selective two-column box filter against each and
reads the scan's ACTUAL bytes/rows from the Spark REST API.  Parquet
min/max pruning is the mechanism; the layout decides whether the stats
are selective.  At 100 TB the unread bytes are the whole game: a scan
that touches 1/20 of the files is a 20x cheaper query with zero plan
changes.

Usage: zorder_skip_probe.py [--sf-dir /root/testdata/sf0.1]
Prints a table; exits 0 (measurement, not a gate).
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import urllib.request
from pathlib import Path

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

from mssql2monetdb_spark.engine.zorder import ZCol, cluster_by_zorder


def _flag(name, default):
    if name in sys.argv:
        i = sys.argv.index(name)
        return sys.argv[i + 1]
    return default


SF_DIR = _flag("--sf-dir", "/root/testdata/sf0.1")
UI_PORT = int(_flag("--ui-port", "4097"))
# Pruning resolution is set by file count: N files give each of d
# interleaved dimensions ~log2(N)/d bits of skip granularity, so a
# 1/64-wide slab can only prune to ~N^(-1/d) of the data. 16 files =
# 2 bits/dim (quadrants); 256 = 4 bits/dim. Production tables have
# thousands of files per partition — far finer than either.
N_FILES = int(_flag("--files", "16"))

spark = (
    SparkSession.builder.appName("zorder-skip-probe")
    .master("local[8]")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", str(UI_PORT))
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.shuffle.partitions", "16")
    # one file = one split so file-level pruning is visible in inputBytes
    .config("spark.sql.files.maxPartitionBytes", str(1 << 30))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
bounds = li.agg(
    F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
).first()
pk_lo, pk_hi, sk_lo, sk_hi = bounds
specs = [ZCol("l_partkey", pk_lo, pk_hi), ZCol("l_suppkey", sk_lo, sk_hi)]

base = Path(tempfile.mkdtemp(prefix="zorder_probe_"))
layouts = {
    "random": li.repartition(N_FILES),
    "sort_l_partkey": li.repartitionByRange(N_FILES, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ),
    "zorder(pk,sk)": cluster_by_zorder(li, specs, num_files=N_FILES),
}
for name, df in layouts.items():
    df.write.mode("overwrite").parquet(str(base / name.replace("(", "_").replace(")", "").replace(",", "_")))

# selective ranges anchored mid-domain (~1/64 of each dimension); the
# three predicates tell the whole story: a leading-column filter favors
# the plain sort, a SECOND-column filter defeats it entirely, and only
# Z-order prunes on both
pk_span = (pk_hi - pk_lo) // 64 or 1
sk_span = (sk_hi - sk_lo) // 64 or 1
pk_mid = pk_lo + (pk_hi - pk_lo) // 2
sk_mid = sk_lo + (sk_hi - sk_lo) // 2
preds = {
    "pk only": F.col("l_partkey").between(pk_mid, pk_mid + pk_span),
    "sk only": F.col("l_suppkey").between(sk_mid, sk_mid + sk_span),
    "pk AND sk box": (
        F.col("l_partkey").between(pk_mid, pk_mid + pk_span)
        & F.col("l_suppkey").between(sk_mid, sk_mid + sk_span)
    ),
}


def stage_input(app_id: str, before_ids: set[int]) -> tuple[int, int]:
    stages = json.load(
        urllib.request.urlopen(
            f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    new = [s for s in stages if s["stageId"] not in before_ids]
    return sum(s["inputBytes"] for s in new), sum(s["inputRecords"] for s in new)


app_id = json.load(
    urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1/applications")
)[0]["id"]


def seen_stage_ids() -> set[int]:
    stages = json.load(
        urllib.request.urlopen(
            f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages"
        )
    )
    return {s["stageId"] for s in stages}


for pred_name, pred in preds.items():
    print(f"\npredicate: {pred_name}")
    print(f"{'layout':>16} | {'result rows':>11} | {'bytes read':>11} | {'rows read':>10}")
    results = {}
    for name in layouts:
        path = str(base / name.replace("(", "_").replace(")", "").replace(",", "_"))
        before = seen_stage_ids()
        n = spark.read.parquet(path).filter(pred).count()
        bytes_read, rows_read = stage_input(app_id, before)
        results[name] = (n, bytes_read, rows_read)
        print(f"{name:>16} | {n:>11} | {bytes_read:>11} | {rows_read:>10}")
    counts = {v[0] for v in results.values()}
    assert len(counts) == 1, f"layouts disagree on result rows: {results}"
    rand_bytes = results["random"][1]
    for name, (_, b, _) in results.items():
        if name != "random" and rand_bytes:
            print(f"  {name}: {rand_bytes / max(b, 1):.1f}x fewer bytes than random")

shutil.rmtree(base, ignore_errors=True)
