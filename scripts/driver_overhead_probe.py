"""Micro-measure the driver-side components that dominate query BUILD time.

Times, each over N reps:
  - spark.read.parquet(path)                 (schema inference per table)
  - spark.read.schema(s).parquet(path)       (inference skipped)
  - df.rdd.getNumPartitions() on a fresh scan (the parallelized() probe)
  - spark.conf.set of one key                (configure_runtime round-trips)
  - Tables(spark, sf).lineitem               (full current load path)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mssql2monetdb_spark.session import get_spark  # noqa: E402
from mssql2monetdb_spark.catalog import Tables  # noqa: E402

N = 20
SF = "/root/testdata/sf0.1"


def timeit(label, fn, n=N):
    # warm once
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(f"{label:55s} {dt * 1000:8.1f} ms")
    return dt


def main() -> int:
    spark = get_spark("driver-overhead-probe")
    path = f"{SF}/lineitem.parquet"
    dpath = f"{SF}/documents.parquet"

    timeit("read.parquet(lineitem) [schema inference]", lambda: spark.read.parquet(path))
    schema = spark.read.parquet(path).schema
    timeit("read.schema(s).parquet(lineitem)", lambda: spark.read.schema(schema).parquet(path))
    timeit("read.parquet(documents)", lambda: spark.read.parquet(dpath))

    df = spark.read.parquet(dpath)
    timeit("fresh_scan.rdd.getNumPartitions()", lambda: spark.read.parquet(dpath).rdd.getNumPartitions(), n=10)
    timeit("same_df.rdd.getNumPartitions()", lambda: df.rdd.getNumPartitions(), n=10)
    proj = df.selectExpr("doc_id", "length(text) as L")
    timeit("projected.rdd.getNumPartitions()", lambda: proj.rdd.getNumPartitions(), n=10)

    timeit("conf.set(one key)", lambda: spark.conf.set("spark.sql.session.timeZone", "UTC"))
    timeit("Tables().lineitem (current load path)", lambda: Tables(spark, SF).lineitem)
    timeit("Tables() construction only", lambda: Tables(spark, SF))

    # a representative narrow DF op chain (analysis cost per call)
    t = Tables(spark, SF)
    li = t.lineitem
    timeit("li.filter+select (2 ops)", lambda: li.filter("l_quantity > 0").select("l_orderkey"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
