"""Split each bench query's wall time into BUILD (Python plan construction)
vs EXEC (noop write), and count Spark jobs/stages per query.

The bench.py timed region is ``force(q.build(spark, sf_dir))`` — if build()
itself costs hundreds of ms (driver-side .rdd partition probes, py4j conf
round-trips, deep plan construction), that is invisible in plan dumps but
fully billed to the query. Jobs/stages counts expose per-query action and
shuffle-boundary overhead (each AQE stage materialization is a job).

Usage: build_exec_probe.py [-n N] [name1 name2 ...]   (default: all bench)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mssql2monetdb_spark.queries.registry import REGISTRY, bench_queries  # noqa: E402
from mssql2monetdb_spark.session import get_spark  # noqa: E402
import mssql2monetdb_spark.queries  # noqa: E402,F401


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    args = sys.argv[1:]
    n = 3
    if "-n" in args:
        i = args.index("-n")
        n = int(args[i + 1])
        del args[i : i + 2]
    names = args or sorted(bench_queries())
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("build-exec-probe")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    from mssql2monetdb_spark.engine import caches

    def isolate() -> None:
        caches.release()
        spark.catalog.clearCache()

    warm = "/root/testdata/sf0.001"
    for name in names:
        force(REGISTRY[name].build(spark, warm))
    isolate()

    out: dict[str, dict] = {}
    for name in names:
        builds, execs, jobs = [], [], 0
        for rep in range(n):
            j0 = tracker.getJobIdsForGroup(None)
            t0 = time.perf_counter()
            df = REGISTRY[name].build(spark, sf_dir)
            t1 = time.perf_counter()
            force(df)
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            isolate()
        # count jobs for the last rep only (cheap proxy; use the global
        # job-id high-water mark instead of group filtering)
        out[name] = {
            "build_min": round(min(builds), 3),
            "exec_min": round(min(execs), 3),
            "build_runs": [round(x, 3) for x in builds],
            "exec_runs": [round(x, 3) for x in execs],
        }
        print(name, json.dumps(out[name]), flush=True)
    total_build = round(sum(v["build_min"] for v in out.values()), 3)
    total_exec = round(sum(v["exec_min"] for v in out.values()), 3)
    print(json.dumps({"total_build_min": total_build, "total_exec_min": total_exec}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
