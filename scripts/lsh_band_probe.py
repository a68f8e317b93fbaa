"""A/B the two ``with_lsh_bands`` shapes at production band counts.

The round-5 flatten (452d23c) replaced the per-band union (LSH_BANDS
source scans per consumer) with a single projection that explodes
(band, bkey) structs.  At the fixture's 2 bands the plans tie — that
was measured when the change landed — but the docstring originally
claimed the union form "multiplies at production band counts of 8-32"
without a measurement.  This probe supplied it (results now in the
docstring + SCALE.md: wall ties, SCAN COUNT multiplies — the refuted
wall-time claim was rewritten): both forms, same synthetic
hyperplanes, same downstream consumer shape (cosine_neardup_pairs'
narrow-pair candidate distinct + embedding join-back), at --bands
2/8/16, on a cloned sf0.1 embeddings corpus, interleaved min-of-N.

Reports per (bands, form): wall seconds, parquet-scan count in the
physical plan, and the candidate-pair count (must be EQUAL between
forms at the same band count — the two shapes are semantically
identical by construction).

Usage: SPARK_GRAFT_DRIVER_MEM=20g python scripts/lsh_band_probe.py
       [--factor 50] [--bands 2,8,16] [--reps 3] [--bits 12]

Keep --bits high (default 12 = 4096 buckets/band): low bit counts make
buckets quadratically heavy and the candidate join swamps the banding
cost being measured (at --bits 4 the self-join OOMs a 20g heap).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from mssql2monetdb_spark.catalog import parallelized
from mssql2monetdb_spark.functions import vectors
from mssql2monetdb_spark.operators.similarity import EMBED_DIM, _lcg_floats, plane_bit

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORPUS = "/tmp/lsh_band_probe_embeddings.parquet"


def build_corpus(spark, factor: int) -> None:
    if os.path.exists(CORPUS):
        return
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    n = emb.agg(F.max("vec_id")).first()[0] + 1
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
            # Perturb clones per (vector, component, replica) — a CONSTANT
            # shift would dominate every plane dot product at high i and
            # collapse whole replicas into one LSH bucket (measured: the
            # first draft OOMed the self-join on an 80k-row mega-bucket).
            F.transform(
                F.col("embedding"),
                lambda x, j: x
                + F.sin(F.col("vec_id") * F.lit(2.1) + j * F.lit(0.7) + F.lit(i * 1.3))
                * F.lit(0.05),
            ).alias("embedding"),
        )
        for i in range(factor)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(32).write.mode("overwrite").parquet(CORPUS)


def banded_explode(emb_df: DataFrame, planes, bands: int, bits: int) -> DataFrame:
    """The post-452d23c shape: one projection, explode (band, bkey)."""
    emb = F.col("embedding")
    emb_df = parallelized(emb_df)
    entries = []
    for band in range(bands):
        key = F.lit(0)
        for j in range(bits):
            key = key * 2 + plane_bit(emb, planes[band * bits + j])
        entries.append(F.struct(F.lit(band).alias("band"), key.cast("int").alias("bkey")))
    return (
        emb_df.withColumn("_bb", F.explode(F.array(*entries)))
        .withColumn("band", F.col("_bb.band"))
        .withColumn("bkey", F.col("_bb.bkey"))
        .drop("_bb")
    )


def banded_union(emb_df: DataFrame, planes, bands: int, bits: int) -> DataFrame:
    """The pre-452d23c shape: one withColumn branch per band, unionAll."""
    emb = F.col("embedding")
    emb_df = parallelized(emb_df)
    pieces = []
    for band in range(bands):
        key = F.lit(0)
        for j in range(bits):
            key = key * 2 + plane_bit(emb, planes[band * bits + j])
        pieces.append(
            emb_df.withColumn("band", F.lit(band)).withColumn("bkey", key.cast("int"))
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionAll(p)
    return out


def consumer(banded: DataFrame, emb_df: DataFrame) -> DataFrame:
    """cosine_neardup_pairs' candidate pipeline, verbatim shape."""
    left = banded.select(F.col("vec_id").alias("id_a"), "band", "bkey")
    right = banded.select(F.col("vec_id").alias("id_b"), "band", "bkey")
    cand_ids = (
        left.join(right, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = emb_df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"))
    vb = emb_df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"))
    cand = cand_ids.join(va, "id_a").join(vb, "id_b")
    return cand.select(
        "id_a", "id_b", vectors.cosine(F.col("emb_a"), F.col("emb_b")).alias("cos_sim")
    ).filter(F.col("cos_sim") >= 0.4)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=50)
    ap.add_argument("--bands", default="2,8,16")
    ap.add_argument("--bits", type=int, default=12)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from mssql2monetdb_spark.session import get_spark

    spark = get_spark("lsh-band-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_corpus(spark, args.factor)
    emb_df = spark.read.parquet(CORPUS)
    n_rows = emb_df.count()

    results = []
    for bands in [int(b) for b in args.bands.split(",")]:
        planes = [_lcg_floats(1000 + i, EMBED_DIM) for i in range(bands * args.bits)]
        arms = {
            "explode": lambda: consumer(
                banded_explode(emb_df, planes, bands, args.bits), emb_df
            ),
            "union": lambda: consumer(
                banded_union(emb_df, planes, bands, args.bits), emb_df
            ),
        }
        timings = {name: [] for name in arms}
        counts = {}
        scans = {}
        jvm = spark.sparkContext._jvm
        for name, build in arms.items():
            plan = jvm.PythonSQLUtils.explainString(
                build()._jdf.queryExecution(), "formatted"
            )
            scans[name] = plan.count("Scan parquet")
        for _ in range(args.reps):
            for name, build in arms.items():  # interleaved A/B
                t0 = time.monotonic()
                counts[name] = build().count()
                timings[name].append(time.monotonic() - t0)
        if counts["explode"] != counts["union"]:
            print(
                f"MISMATCH at bands={bands}: explode={counts['explode']} "
                f"union={counts['union']}",
                file=sys.stderr,
            )
            return 1
        row = {
            "bands": bands,
            "rows": n_rows,
            "pairs": counts["explode"],
            "explode_s": round(min(timings["explode"]), 2),
            "union_s": round(min(timings["union"]), 2),
            "explode_scans": scans["explode"],
            "union_scans": scans["union"],
            "union_over_explode": round(
                min(timings["union"]) / min(timings["explode"]), 2
            ),
        }
        results.append(row)
        print(json.dumps(row))
    print(json.dumps({"probe": "lsh_band_scaling", "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
