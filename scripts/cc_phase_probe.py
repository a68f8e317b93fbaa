"""Connected-components loop probe: phase timings + loop-variant A/B.

Optimization round 11 (session 2). Measures, at $SPARK_GRAFT_SF_DIR
(default sf0.1), under bench.py's regime (noop sink, cache isolation):

- phase `pairs`:  the MinHash-LSH pair generation feeding CC
- variant A: the shipped ``dedup.connected_components`` loop
- variant B: fused convergence flag — the per-round "changed" count is
  derived IN the round's join output (``nbr_label < label``) instead of a
  third join of new-vs-old labels (guide section 2.4: remove shuffles
  outright; the new/old join re-shuffled two |V| relations every round
  purely for the fixpoint test)
- variant C: B + the edge relation cached pre-partitioned on ``dst`` so
  the per-round join re-uses the cached partitioning instead of paying an
  |E|-sized exchange every round (guide section 2.4 co-partitioning)

All variants must return IDENTICAL (doc_id, component_id) rows — asserted
before any number is printed. Interleaved min-of-N like scripts/ab_bench.py.
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
from mssql2monetdb_spark.operators import dedup
from mssql2monetdb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("CC_PROBE_N", "3"))


def force(df: DataFrame) -> None:
    df.write.mode("overwrite").format("noop").save()


def cc_fused(pairs: DataFrame, *, max_iter: int = 20, prepart_edges: bool = False) -> DataFrame:
    """Variants B/C of the CC loop (see module docstring)."""
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).unionAll(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).distinct()
    if prepart_edges:
        edges = edges.repartition("dst")
    edges = caches.tracked(edges)
    labels = caches.tracked(
        edges.groupBy("src")
        .agg(F.min("dst").alias("min_dst"))
        .select(F.col("src").alias("id"), F.least(F.col("src"), F.col("min_dst")).alias("label"))
    )
    changed = 0
    for i in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = caches.tracked(
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("chg"),
            )
        )
        changed = new_labels.filter("chg").count()
        labels.unpersist()
        if (i + 1) % dedup.CC_CHECKPOINT_EVERY == 0:
            ckpt = new_labels.localCheckpoint()
            new_labels.unpersist()
            new_labels = ckpt
        labels = new_labels
        if changed == 0:
            break
    else:
        if changed != 0:
            raise RuntimeError("no convergence")
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("component_id"))


def main() -> int:
    spark = get_spark("cc-phase-probe")

    def isolate() -> None:
        caches.release()
        spark.catalog.clearCache()

    def build_pairs(sf: str) -> DataFrame:
        return dedup.minhash_lsh_pairs(Tables(spark, sf).documents, shingle_n=3, threshold=0.8)

    # -- correctness gate: all variants identical at sf0.01 ------------------
    small = "/root/testdata/sf0.01"
    ref = sorted(dedup.connected_components(build_pairs(small)).collect())
    isolate()
    for name, fn in (
        ("B", lambda p: cc_fused(p)),
        ("C", lambda p: cc_fused(p, prepart_edges=True)),
    ):
        got = sorted(fn(build_pairs(small)).collect())
        assert got == ref, f"variant {name} DIVERGED"
        isolate()
    print(f"variants agree at sf0.01 ({len(ref)} rows)", flush=True)

    # -- warmup at sf0.001 ---------------------------------------------------
    warm = "/root/testdata/sf0.001"
    force(dedup.connected_components(build_pairs(warm)).orderBy("doc_id"))
    isolate()

    variants = {
        "pairs": lambda sf: build_pairs(sf),
        "A_current": lambda sf: dedup.connected_components(build_pairs(sf)).orderBy("doc_id"),
        "B_fused": lambda sf: cc_fused(build_pairs(sf)).orderBy("doc_id"),
        "C_prepart": lambda sf: cc_fused(build_pairs(sf), prepart_edges=True).orderBy("doc_id"),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(N):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"cc-probe:{name}")
            t0 = time.perf_counter()
            force(fn(SF_DIR))
            times[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            isolate()
    for name, v in times.items():
        print(f"{name:12s} min={min(v):.3f} runs={[round(x, 3) for x in v]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
