"""A/B probe: pagerank's |V| as a separate count() action (current) vs an
in-plan broadcast one-row aggregate (the oracle's nstats CTE shape).

The count() action pays the full edge-derivation (events window + groupBy +
distinct) once BEFORE the main action recomputes it — in-plan nstats folds
|V| into the single action where ReusedExchange dedups the derivation.
Arithmetic is bit-identical: (1-d)/n and 1/n are single IEEE ops either way.

Usage: pagerank_scalar_probe.py [-n N] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from mssql2monetdb_spark.catalog import Tables  # noqa: E402
from mssql2monetdb_spark.operators import graph as graph_ops  # noqa: E402
from mssql2monetdb_spark.session import get_spark  # noqa: E402
from mssql2monetdb_spark.engine import caches  # noqa: E402

PR_DAMPING = graph_ops.PR_DAMPING
PR_ITERATIONS = graph_ops.PR_ITERATIONS
PR_FOLD_BUCKETS = graph_ops.PR_FOLD_BUCKETS


def pagerank_scalar_n(edges: DataFrame) -> DataFrame:
    """pagerank() with |V| as an in-plan broadcast scalar (no count action)."""
    damping, fold_buckets = PR_DAMPING, PR_FOLD_BUCKETS
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    nstats = nodes.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    outdeg = edges.groupBy("src").agg(F.sum("weight").alias("outdeg"))
    e = edges.join(outdeg, "src").select(
        "src",
        "dst",
        (F.col("weight").cast("double") / F.col("outdeg").cast("double")).alias(
            "share"
        ),
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("src").cast("string")), 1, 8), 16, 10
            ).cast("bigint"),
            F.lit(fold_buckets),
        ).alias("bkt"),
    )
    ranks = nodes.crossJoin(F.broadcast(nstats)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for _ in range(PR_ITERATIONS):
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


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    args = sys.argv[1:]
    n = 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "-n" in args:
        i = args.index("-n")
        n = int(args[i + 1])
    spark = get_spark("pagerank-scalar-probe")

    def build_current():
        t = Tables(spark, sf_dir)
        return graph_ops.pagerank(graph_ops.user_transition_edges(t.events))

    def build_variant():
        t = Tables(spark, sf_dir)
        return pagerank_scalar_n(graph_ops.user_transition_edges(t.events))

    # result identity first (the whole point is bit-identical output)
    cur = build_current().collect()
    var = build_variant().collect()
    assert len(cur) == len(var), (len(cur), len(var))
    for a, b in zip(cur, var):
        assert a["node"] == b["node"] and a["rank"] == b["rank"], (a, b)
    print(f"IDENTICAL: {len(cur)} rows bit-equal")

    def isolate():
        caches.release()
        spark.catalog.clearCache()

    # warmup both
    force(build_current())
    force(build_variant())
    isolate()
    times: dict[str, list[float]] = {"current": [], "scalar_n": []}
    for _ in range(n):
        for label, builder in (("current", build_current), ("scalar_n", build_variant)):
            t0 = time.perf_counter()
            force(builder())
            times[label].append(time.perf_counter() - t0)
            isolate()
    for label, ts in times.items():
        print(
            f"{label}: min={min(ts):.3f} med={sorted(ts)[len(ts)//2]:.3f} "
            f"max={max(ts):.3f} (n={n})"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
