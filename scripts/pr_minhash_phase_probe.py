"""PageRank + MinHash phase probe (optimization round 11, session 2).

Questions, answered with interleaved min-of-N at $SPARK_GRAFT_SF_DIR:

1. graph_pagerank: how much of the query is edge derivation vs the 4
   power-iteration rounds (marginal cost per round)?  Does caching the
   per-iteration-reused edge relation ``e`` (share + fold bucket — the
   md5 bucket key is recomputed map-side every round after the reused
   exchange) beat recompute, or is it another triangle-count-style wash?
2. minhash_lsh_pairs: is the tracked cache on ``per_doc`` (used by the
   band explode + both verify joins) still a win vs plain recompute with
   ReusedExchange dedup?

Variant outputs are asserted identical at sf0.01 before timing.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mssql2monetdb_spark.catalog import Tables
from mssql2monetdb_spark.engine import caches
from mssql2monetdb_spark.functions import hashing
from mssql2monetdb_spark.operators import dedup
from mssql2monetdb_spark.operators import graph as graph_ops
from mssql2monetdb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("PROBE_N", "3"))


def force(df: DataFrame) -> None:
    df.write.mode("overwrite").format("noop").save()


def pagerank_cached_e(edges: DataFrame, *, iterations: int = 4) -> DataFrame:
    """pagerank() with the per-iteration edge relation cached (variant)."""
    damping = graph_ops.PR_DAMPING
    fold_buckets = graph_ops.PR_FOLD_BUCKETS
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    nstats = nodes.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    outdeg = edges.groupBy("src").agg(F.sum("weight").alias("outdeg"))
    e = caches.tracked(
        edges.join(outdeg, "src").select(
            "src",
            "dst",
            (F.col("weight").cast("double") / F.col("outdeg").cast("double")).alias("share"),
            F.pmod(
                F.conv(F.substring(F.md5(F.col("src").cast("string")), 1, 8), 16, 10).cast("bigint"),
                F.lit(fold_buckets),
            ).alias("bkt"),
        )
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


def minhash_pairs_uncached(docs: DataFrame, *, shingle_n: int = 3, threshold: float = 0.8) -> DataFrame:
    """minhash_lsh_pairs() without the tracked per_doc cache (variant)."""
    rows = dedup.shingle_rows(docs, "text", "doc_id", shingle_n, distinct=False)
    per_doc = (
        rows.groupBy("id")
        .agg(*dedup._sig_agg_cols(), F.sort_array(F.collect_set("h64")).alias("hs"))
        .withColumn("sz", F.size("hs"))
    )
    bands = dedup.lsh_bands(per_doc.select("id", *[f"mh{i}" for i in range(hashing.MINHASH_K)]))
    left = bands.select(F.col("id").alias("doc_a"), "band", "bkey")
    right = bands.select(F.col("id").alias("doc_b"), "band", "bkey")
    candidates = (
        left.join(right, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = per_doc.select(F.col("id").alias("doc_a"), F.col("hs").alias("hs_a"), F.col("sz").alias("sz_a"))
    sb = per_doc.select(F.col("id").alias("doc_b"), F.col("hs").alias("hs_b"), F.col("sz").alias("sz_b"))
    inter = F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / (F.col("sz_a") + F.col("sz_b") - inter)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def main() -> int:
    spark = get_spark("pr-minhash-probe")

    def isolate() -> None:
        caches.release()
        spark.catalog.clearCache()

    # -- correctness: variants identical at sf0.01 ---------------------------
    small = "/root/testdata/sf0.01"
    ed_small = graph_ops.user_transition_edges(Tables(spark, small).events)
    ref_pr = graph_ops.pagerank(ed_small).collect()
    isolate()
    got_pr = pagerank_cached_e(graph_ops.user_transition_edges(Tables(spark, small).events)).collect()
    assert got_pr == ref_pr, "pagerank_cached_e DIVERGED"
    isolate()
    ref_mh = sorted(
        dedup.minhash_lsh_pairs(Tables(spark, small).documents, shingle_n=3, threshold=0.8).collect()
    )
    isolate()
    got_mh = sorted(minhash_pairs_uncached(Tables(spark, small).documents).collect())
    assert got_mh == ref_mh, "minhash_pairs_uncached DIVERGED"
    isolate()
    print(f"variants agree at sf0.01 (pr {len(ref_pr)} rows, mh {len(ref_mh)} rows)", flush=True)

    # -- warmup --------------------------------------------------------------
    warm = "/root/testdata/sf0.001"
    force(graph_ops.pagerank(graph_ops.user_transition_edges(Tables(spark, warm).events)))
    force(dedup.minhash_lsh_pairs(Tables(spark, warm).documents, shingle_n=3, threshold=0.8))
    isolate()

    def edges_of(sf: str) -> DataFrame:
        return graph_ops.user_transition_edges(Tables(spark, sf).events)

    variants = {
        "pr_edges_only": lambda sf: edges_of(sf),
        "pr_iter1": lambda sf: graph_ops.pagerank(edges_of(sf), iterations=1),
        "pr_iter4": lambda sf: graph_ops.pagerank(edges_of(sf)),
        "pr_iter4_cached_e": lambda sf: pagerank_cached_e(edges_of(sf)),
        "mh_cached": lambda sf: dedup.minhash_lsh_pairs(
            Tables(spark, sf).documents, shingle_n=3, threshold=0.8
        ),
        "mh_uncached": lambda sf: minhash_pairs_uncached(Tables(spark, sf).documents),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(N):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.perf_counter()
            force(fn(SF_DIR))
            times[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            isolate()
    for name, v in times.items():
        print(f"{name:18s} min={min(v):.3f} runs={[round(x, 3) for x in v]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
