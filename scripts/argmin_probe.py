"""A/B the IVF argmin-assign shape: row_number window vs min(struct).

The window form ships corpus x K rows (each carrying the full embedding)
through the Exchange on id; the min(struct(dist2, cid, emb)) form partial-
aggregates map-side to ~1 row per vector before the exchange (guide
section 2.3 "aggregate before you shuffle") — a K-fold shuffle reduction
((dist2, cid) is tie-free within an id, so the argmin is identical).

Asserts identical results for the three consumer shapes at sf0.01, then
interleaved min-of-N timings at $SPARK_GRAFT_SF_DIR.
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
from mssql2monetdb_spark.operators import similarity
from mssql2monetdb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("PROBE_N", "3"))

ANN_QUERY_IDS = [0, 3, 7, 11]


def force(df: DataFrame) -> None:
    df.write.mode("overwrite").format("noop").save()


def argmin_minstruct(emb_df, centroids, id_col, emb_col):
    from mssql2monetdb_spark.functions import vectors

    dist2 = vectors.l2sq(F.col(emb_col), F.col("cvec"))
    scored = emb_df.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col), F.col(emb_col), F.col("cid"), dist2.alias("dist2")
    )
    return (
        scored.groupBy(id_col)
        .agg(F.min(F.struct("dist2", "cid", F.col(emb_col))).alias("_b"))
        .select(
            F.col(id_col),
            F.col(f"_b.{emb_col}").alias(emb_col),
            F.col("_b.cid").alias("cell"),
        )
    )


def main() -> int:
    spark = get_spark("argmin-probe")
    orig = similarity._argmin_assign

    def isolate() -> None:
        caches.release()
        spark.catalog.clearCache()

    def builders(sf: str):
        t = Tables(spark, sf)
        return {
            "ivfadc": lambda: similarity.topk_ivf_adc(t.embeddings, ANN_QUERY_IDS),
            "ivf": lambda: similarity.topk_ivf(t.embeddings, ANN_QUERY_IDS, k=5),
            "semcells": lambda: similarity.semantic_dedup_cells(t.embeddings, threshold=0.4),
        }

    # -- correctness at sf0.01 ----------------------------------------------
    small = builders("/root/testdata/sf0.01")
    for name, fn in small.items():
        similarity._argmin_assign = orig
        ref = sorted(map(tuple, fn().collect()))
        isolate()
        similarity._argmin_assign = argmin_minstruct
        got = sorted(map(tuple, fn().collect()))
        isolate()
        assert got == ref, f"{name} DIVERGED under min(struct) argmin"
        print(f"{name}: identical at sf0.01 ({len(ref)} rows)", flush=True)

    # -- warmup -------------------------------------------------------------
    similarity._argmin_assign = orig
    for fn in builders("/root/testdata/sf0.001").values():
        force(fn())
    isolate()

    big = builders(SF_DIR)
    times: dict[str, list[float]] = {}
    for _ in range(N):
        for name, fn in big.items():
            for variant, impl in (("window", orig), ("minstruct", argmin_minstruct)):
                similarity._argmin_assign = impl
                key = f"{name}:{variant}"
                spark.sparkContext.setJobDescription(key)
                t0 = time.perf_counter()
                force(fn())
                times.setdefault(key, []).append(time.perf_counter() - t0)
                spark.sparkContext.setJobDescription(None)
                isolate()
    similarity._argmin_assign = orig
    for name, v in times.items():
        print(f"{name:20s} min={min(v):.3f} runs={[round(x, 3) for x in v]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
