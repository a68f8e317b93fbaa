"""A/B two remaining rank-1 windows vs min(struct) partial aggregates.

Sites (both consumers already hold round-11 gate-window slots):
- dedup.record_linkage_blocked: best match per a_key by (edit_dist, b_key)
- similarity.cross_split_contamination: nearest test vector per train_id
  by (cos_sim desc, test_id) — expressed as min(struct(-cos_sim, test_id))

Same rationale as the IVF argmin change (guide section 2.3): partial
aggregation collapses each key's candidates map-side, where the window
ships every candidate row through the exchange and sorts it.
Outputs asserted identical at sf0.01; interleaved min-of-N at sf0.1.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mssql2monetdb_spark.engine import caches
from mssql2monetdb_spark.queries.registry import REGISTRY
from mssql2monetdb_spark.session import get_spark
import mssql2monetdb_spark.queries  # noqa: F401

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("PROBE_N", "4"))
NAMES = ["er_record_linkage", "decontaminate_semantic"]


def force(df: DataFrame) -> None:
    df.write.mode("overwrite").format("noop").save()


def patched(on: bool):
    """Toggle the min(struct) variants via monkeypatch."""
    from mssql2monetdb_spark.operators import dedup as d
    from mssql2monetdb_spark.operators import similarity as s
    from pyspark.sql.window import Window

    if not on:
        d.record_linkage_blocked = ORIG_LINK
        s.cross_split_contamination = ORIG_XSPLIT
        return

    def link_agg(customers, *, max_edit=d.ER_MAX_EDIT):
        from mssql2monetdb_spark.functions import hashing

        variant = F.pmod(
            hashing.md5_int32(
                F.concat(F.col("c_custkey").cast("string"), F.lit("|" + d.ER_SALT))
            ),
            F.lit(3),
        )
        b_name = (
            F.when(variant == 0, F.regexp_replace(F.col("c_name"), "#", "-"))
            .when(variant == 1, F.concat(F.col("c_name"), F.lit("x")))
            .otherwise(F.col("c_name"))
        )
        b = customers.select(
            F.col("c_custkey").alias("b_key"), b_name.alias("b_name"),
            "c_nationkey", "c_mktsegment",
        )
        a = d.parallelized(customers).select(
            F.col("c_custkey").alias("a_key"), F.col("c_name").alias("a_name"),
            "c_nationkey", "c_mktsegment",
        )
        scored = (
            a.join(b, ["c_nationkey", "c_mktsegment"])
            .withColumn("edit_dist", F.levenshtein("a_name", "b_name").cast("int"))
            .filter(F.col("edit_dist") <= max_edit)
        )
        return (
            scored.groupBy("a_key")
            .agg(F.min(F.struct("edit_dist", "b_key")).alias("_b"))
            .select(
                "a_key",
                F.col("_b.b_key").alias("b_key"),
                F.col("_b.edit_dist").alias("edit_dist"),
                (F.col("a_key") == F.col("_b.b_key")).alias("matched_same_entity"),
            )
        )

    def xsplit_agg(emb_df, *, id_col="vec_id", emb_col="embedding", threshold=0.4, k=s.IVF_K):
        from mssql2monetdb_spark.functions import vectors
        from mssql2monetdb_spark.operators import corpus_prep

        seed = s._seed_centroids(emb_df, id_col, emb_col, k)
        assigned = corpus_prep.assign_split(
            s._argmin_assign(emb_df, seed, id_col, emb_col), id_col
        )
        train = assigned.filter(F.col("split") == "train").select(
            "cell", F.col(id_col).alias("train_id"), F.col(emb_col).alias("emb_t")
        )
        test = assigned.filter(F.col("split") == "test").select(
            "cell", F.col(id_col).alias("test_id"), F.col(emb_col).alias("emb_q")
        )
        scored = (
            train.join(test, "cell")
            .select(
                "train_id",
                "test_id",
                vectors.cosine(F.col("emb_t"), F.col("emb_q")).alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= threshold)
        )
        return (
            scored.groupBy("train_id")
            .agg(F.min(F.struct((-F.col("cos_sim")).alias("_neg"), F.col("test_id"), F.col("cos_sim"))).alias("_b"))
            .select("train_id", F.col("_b.test_id").alias("test_id"), F.col("_b.cos_sim").alias("cos_sim"))
            .orderBy("train_id")
        )

    d.record_linkage_blocked = link_agg
    s.cross_split_contamination = xsplit_agg


def main() -> int:
    spark = get_spark("rank1-agg-probe")

    def isolate() -> None:
        caches.release()
        spark.catalog.clearCache()

    small = "/root/testdata/sf0.01"
    for name in NAMES:
        patched(False)
        ref = sorted(map(tuple, REGISTRY[name].build(spark, small).collect()))
        isolate()
        patched(True)
        got = sorted(map(tuple, REGISTRY[name].build(spark, small).collect()))
        isolate()
        assert got == ref, f"{name} DIVERGED ({len(got)} vs {len(ref)} rows)"
        print(f"{name}: identical at sf0.01 ({len(ref)} rows)", flush=True)

    patched(False)
    for name in NAMES:
        force(REGISTRY[name].build(spark, "/root/testdata/sf0.001"))
    isolate()

    times: dict[str, list[float]] = {}
    for _ in range(N):
        for name in NAMES:
            for tag, on in (("window", False), ("minstruct", True)):
                patched(on)
                key = f"{name}:{tag}"
                spark.sparkContext.setJobDescription(key)
                t0 = time.perf_counter()
                force(REGISTRY[name].build(spark, SF_DIR))
                times.setdefault(key, []).append(time.perf_counter() - t0)
                spark.sparkContext.setJobDescription(None)
                isolate()
    patched(False)
    for name, v in times.items():
        print(f"{name:34s} min={min(v):.3f} runs={[round(x, 3) for x in v]}", flush=True)
    return 0


from mssql2monetdb_spark.operators import dedup as _d  # noqa: E402
from mssql2monetdb_spark.operators import similarity as _s  # noqa: E402

ORIG_LINK = _d.record_linkage_blocked
ORIG_XSPLIT = _s.cross_split_contamination


if __name__ == "__main__":
    sys.exit(main())
