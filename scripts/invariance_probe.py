"""Cluster-layout invariance sweep: results must not depend on partitioning.

On a 1000-executor cluster the engine controls NONE of: the shuffle
partition count (ops teams tune it per job), the input split boundaries
(HDFS/S3 block layout), or the physical row order inside input files
(upstream writers compact and reorder freely).  A query whose RESULT
changes under any of those is nondeterministic at scale even though the
single-layout local test and the DuckDB oracle both pass — the classic
failure modes are ``first()`` over a non-total order, tie-broken ranks,
and float partial-sum re-association drifting past the hash's 1e-6
rounding.

This probe runs every registry query under three perturbations and
compares value-hashed results (same canonicalization as the oracle gate):

  shuffle   spark.sql.shuffle.partitions 32 (baseline) vs 3 vs 57
  splits    spark.sql.files.maxPartitionBytes default vs 64 KB (forces
            many input splits per parquet file)
  permuted  a /tmp copy of the scale dir with every table's rows
            shuffled (orderBy(rand(seed))) and rewritten as 4 files —
            input row order AND file count/order both change
  aqe       adaptive execution OFF vs the engine's default ON (runtime
            partition coalescing and skew-splits must not change
            results; needs a _BUILD_CONF override because
            configure_runtime re-enables AQE per query)

Usage: invariance_probe.py [--sf-dir DIR]
                           [--mode shuffle,splits,permuted,aqe]
                           [--only q1,q2,...]

Exit 1 if any query diverges; prints one line per divergence.
"""
from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import SparkSession, functions as F

from oracle_harness import compare_frames
from mssql2monetdb_spark.catalog import TABLE_NAMES


def _flag(name, default):
    if name in sys.argv:
        i = sys.argv.index(name)
        if i + 1 >= len(sys.argv):
            sys.exit(f"error: {name} requires a value")
        return sys.argv[i + 1]
    return default


SF_DIR = _flag("--sf-dir", "/root/testdata/sf0.001")
MODES = _flag("--mode", "shuffle,splits,permuted,aqe").split(",")
ONLY = _flag("--only", None)
ONLY = set(ONLY.split(",")) if ONLY else None

spark = (
    SparkSession.builder.appName("invariance-probe")
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as mod

qs = mod.queries()
if ONLY is not None:
    unknown = sorted(ONLY - set(qs))
    if unknown:
        sys.exit(f"error: --only names not in queries(): {unknown}")
    qs = {k: v for k, v in qs.items() if k in ONLY}


def run(fn, sf_dir):
    return fn(spark, sf_dir).toPandas()


def build_permuted_copy(src: str) -> str:
    """Row-shuffled, re-filed copy of every table under /tmp."""
    dst = Path(tempfile.mkdtemp(prefix="invariance_sf_"))
    for name in TABLE_NAMES:
        df = spark.read.parquet(f"{src}/{name}.parquet")
        (
            df.orderBy(F.rand(seed=42))
            .repartition(4)
            .write.mode("overwrite")
            .parquet(str(dst / f"{name}.parquet"))
        )
    return str(dst)


def sweep(label, variant_setup, variant_teardown, variant_sf=None):
    """Run every query baseline-vs-variant; return list of divergences."""
    bad = []
    for name, fn in sorted(qs.items()):
        base = run(fn, SF_DIR)
        variant_setup()
        try:
            var = run(fn, variant_sf or SF_DIR)
        finally:
            variant_teardown()
        probs = compare_frames(base, var)
        status = "OK" if not probs else "DIVERGED: " + "; ".join(probs)
        print(f"  [{label}] {name}: {status}", flush=True)
        if probs:
            bad.append((label, name, probs))
    return bad


failures = []

if "shuffle" in MODES:
    for n in (3, 57):
        failures += sweep(
            f"shuffle={n}",
            lambda n=n: spark.conf.set("spark.sql.shuffle.partitions", str(n)),
            lambda: spark.conf.set("spark.sql.shuffle.partitions", "32"),
        )

if "splits" in MODES:
    def small_splits():
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
        spark.conf.set("spark.sql.files.openCostInBytes", "0")

    def restore_splits():
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
        spark.conf.unset("spark.sql.files.openCostInBytes")

    failures += sweep("splits=64KB", small_splits, restore_splits)

if "aqe" in MODES:
    from mssql2monetdb_spark import session as _session

    def aqe_off():
        # configure_runtime re-applies _BUILD_CONF on every Tables()
        # construction, so a bare spark.conf.set would be overwritten —
        # override the source of truth for the variant run.
        _session._BUILD_CONF["spark.sql.adaptive.enabled"] = "false"
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    def aqe_on():
        _session._BUILD_CONF["spark.sql.adaptive.enabled"] = "true"
        spark.conf.set("spark.sql.adaptive.enabled", "true")

    failures += sweep("aqe=off", aqe_off, aqe_on)

if "permuted" in MODES:
    permuted = build_permuted_copy(SF_DIR)
    try:
        failures += sweep("permuted", lambda: None, lambda: None, variant_sf=permuted)
    finally:
        shutil.rmtree(permuted, ignore_errors=True)

print(
    "RESULT:",
    "ALL INVARIANT"
    if not failures
    else f"{len(failures)} divergences: {sorted({(l, n) for l, n, _ in failures})}",
)
sys.exit(1 if failures else 0)
