"""Where does graph_pagerank's wall time go at sf0.1?

Splits one noop run into: driver planning (force executedPlan), job wall
(sum of per-job wall via statusTracker), and counts jobs/stages/tasks.
Then A/Bs AQE on vs off (diagnostic only — AQE stays on in the engine).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mssql2monetdb_spark.session import get_spark  # noqa: E402
from mssql2monetdb_spark.catalog import Tables  # noqa: E402
from mssql2monetdb_spark.operators import graph  # noqa: E402

SF = "/root/testdata/sf0.1"


def force(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    spark = get_spark("pr-where-probe")
    sc = spark.sparkContext
    from mssql2monetdb_spark.engine import caches

    def isolate():
        caches.release()
        spark.catalog.clearCache()

    # warmup
    force(graph.pagerank(graph.user_transition_edges(Tables(spark, "/root/testdata/sf0.001").events)))
    isolate()

    for rep in range(3):
        df = graph.pagerank(graph.user_transition_edges(Tables(spark, SF).events))
        t0 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()  # analysis+optimize+plan
        t1 = time.perf_counter()
        tracker = sc.statusTracker()
        jobs_before = set(tracker.getJobIdsForGroup(None) or [])
        force(df)
        t2 = time.perf_counter()
        tracker = sc.statusTracker()
        jobs_after = set(tracker.getJobIdsForGroup(None) or [])
        new_jobs = sorted(jobs_after - jobs_before)
        n_stages = 0
        n_tasks = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None and si.numActiveTasks + si.numCompletedTasks + si.numFailedTasks >= 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        print(
            f"rep{rep}: plan={t1 - t0:.3f}s exec={t2 - t1:.3f}s "
            f"jobs={len(new_jobs)} stages={n_stages} tasks={n_tasks}"
        )
        isolate()

    # diagnostic: AQE off (results unchanged; NOT an engine setting)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for rep in range(3):
        df = graph.pagerank(graph.user_transition_edges(Tables(spark, SF).events))
        t0 = time.perf_counter()
        force(df)
        print(f"aqe_off rep{rep}: total={time.perf_counter() - t0:.3f}s")
        isolate()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
