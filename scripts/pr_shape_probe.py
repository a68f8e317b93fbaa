"""Interleaved A/B: pagerank iterating on the rank frame (new) vs
re-deriving nodes+nstats per iteration (old, round-11 shape).

Asserts row-for-row bit-identical ranks, then times both shapes
interleaved min-of-N under bench conditions (noop sink, cache isolation).
Also prints static-plan sizes (operator text line counts) — the point of
the rewrite is the Catalyst/AQE planning cost of the per-iteration nodes
subtree, which scales with plan size.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mssql2monetdb_spark.session import get_spark  # noqa: E402
from mssql2monetdb_spark.catalog import Tables  # noqa: E402
from mssql2monetdb_spark.operators import graph  # noqa: E402

SF = "/root/testdata/sf0.1"
N = 5


def old_pagerank(edges, *, iterations=graph.PR_ITERATIONS, damping=graph.PR_DAMPING,
                 fold_buckets=graph.PR_FOLD_BUCKETS):
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    nstats = nodes.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    outdeg = edges.groupBy("src").agg(F.sum("weight").alias("outdeg"))
    e = edges.join(outdeg, "src").select(
        "src", "dst",
        (F.col("weight").cast("double") / F.col("outdeg").cast("double")).alias("share"),
        F.pmod(
            F.conv(F.substring(F.md5(F.col("src").cast("string")), 1, 8), 16, 10).cast("bigint"),
            F.lit(fold_buckets),
        ).alias("bkt"),
    )
    ranks = nodes.crossJoin(F.broadcast(nstats)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for _ in range(iterations):
        contribs = e.join(ranks, e["src"] == ranks["node"]).select(
            "dst", "src", "bkt", (F.col("rank") * F.col("share")).alias("contrib")
        )
        level1 = contribs.groupBy("dst", "bkt").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("src", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("bsum")
        )
        summed = level1.groupBy("dst").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("bkt", "bsum"))),
                F.lit(0.0),
                lambda acc, x: acc + x["bsum"],
            ).alias("in_sum")
        )
        ranks = (
            nodes.join(summed, nodes["node"] == summed["dst"], "left")
            .crossJoin(F.broadcast(nstats))
            .select(
                "node",
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("n_nodes")
                    + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.orderBy("node")


def force(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    spark = get_spark("pr-shape-probe")
    t = Tables(spark, SF)
    edges = graph.user_transition_edges(t.events)

    new_df = graph.pagerank(edges)
    old_df = old_pagerank(edges)

    # bit-identical check
    a = new_df.collect()
    b = old_df.collect()
    assert len(a) == len(b), (len(a), len(b))
    for ra, rb in zip(a, b):
        assert ra["node"] == rb["node"] and ra["rank"] == rb["rank"], (ra, rb)
    print(f"IDENTICAL: {len(a)} rows, bit-equal ranks")

    plan_new = new_df._jdf.queryExecution().executedPlan().toString()
    plan_old = old_df._jdf.queryExecution().executedPlan().toString()
    print(f"static plan lines: old={len(plan_old.splitlines())} new={len(plan_new.splitlines())}")

    from mssql2monetdb_spark.engine import caches

    def isolate():
        caches.release()
        spark.catalog.clearCache()

    # warmup both
    force(graph.pagerank(graph.user_transition_edges(Tables(spark, "/root/testdata/sf0.001").events)))
    isolate()

    times = {"old": [], "new": []}
    for _ in range(N):
        for label, fn in (("old", old_pagerank), ("new", graph.pagerank)):
            edges_i = graph.user_transition_edges(Tables(spark, SF).events)
            t0 = time.perf_counter()
            force(fn(edges_i))
            times[label].append(time.perf_counter() - t0)
            isolate()
    for label, v in times.items():
        print(label, "min", round(min(v), 3), "runs", [round(x, 3) for x in v])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
