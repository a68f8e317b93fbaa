"""A/B the HOF cosine (zip_with + reduce) vs an unrolled element_at sum.

vectors.dot/cosine use higher-order functions, which Spark evaluates as
INTERPRETED expressions (HigherOrderFunction has no codegen) — every
ANN / near-dup hot path pays that. The unrolled form writes the SAME
left-to-right double fold as ``lit(0.0) + a[1]*b[1] + a[2]*b[2] + ...``
(bit-identical result by IEEE associativity-free construction: the
fold order is preserved term for term), which whole-stage codegen can
compile. This probe measures both on the brute-force ANN shape —
n_queries broadcast against a cloned corpus, count survivors at three
cosine thresholds (counts must MATCH exactly between arms).

Reuses the lsh_band_probe corpus if present (100k = 50x sf0.1 clones).

Usage: python scripts/dot_codegen_probe.py [--queries 40] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame, functions as F

from mssql2monetdb_spark.functions import vectors
from mssql2monetdb_spark.operators.similarity import EMBED_DIM

CORPUS = "/tmp/lsh_band_probe_embeddings.parquet"
THRESHOLDS = [0.2, 0.5, 0.8]


def cosine_unrolled(a: Column, b: Column, dim: int) -> Column:
    def fold(term):
        acc = F.lit(0.0)
        for i in range(1, dim + 1):
            acc = acc + term(i)
        return acc

    da = lambda i: F.element_at(a, i).cast("double")  # noqa: E731
    db = lambda i: F.element_at(b, i).cast("double")  # noqa: E731
    dot = fold(lambda i: da(i) * db(i))
    na = F.sqrt(fold(lambda i: da(i) * da(i)))
    nb = F.sqrt(fold(lambda i: db(i) * db(i)))
    return dot / (na * nb)


def consumer(emb_df: DataFrame, q_df: DataFrame, cos_fn) -> DataFrame:
    qs = F.broadcast(
        q_df.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    )
    pairs = emb_df.crossJoin(qs).filter(F.col("vec_id") != F.col("query_id"))
    cos = cos_fn(F.col("q_emb"), F.col("embedding")).alias("cos_sim")
    agg = [
        F.sum(F.when(F.col("cos_sim") >= t, 1).otherwise(0)).alias(f"ge_{int(t*100)}")
        for t in THRESHOLDS
    ]
    return pairs.select("query_id", "vec_id", cos).agg(*agg)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from mssql2monetdb_spark.session import get_spark

    spark = get_spark("dot-codegen-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(CORPUS):
        print("corpus missing — run scripts/lsh_band_probe.py first", file=sys.stderr)
        return 1
    emb_df = spark.read.parquet(CORPUS)
    n_rows = emb_df.count()
    q_df = emb_df.filter(F.col("vec_id") < args.queries)

    arms = {
        "hof": lambda a, b: vectors.cosine(a, b),
        "unrolled": lambda a, b: cosine_unrolled(a, b, EMBED_DIM),
    }
    jvm = spark.sparkContext._jvm
    codegen = {}
    for name, fn in arms.items():
        plan = jvm.PythonSQLUtils.explainString(
            consumer(emb_df, q_df, fn)._jdf.queryExecution(), "formatted"
        )
        codegen[name] = plan.count("WholeStageCodegen")

    timings = {name: [] for name in arms}
    counts = {}
    for _ in range(args.reps):
        for name, fn in arms.items():  # interleaved A/B
            t0 = time.monotonic()
            counts[name] = consumer(emb_df, q_df, fn).first().asDict()
            timings[name].append(time.monotonic() - t0)
    if counts["hof"] != counts["unrolled"]:
        print(f"MISMATCH: {counts}", file=sys.stderr)
        return 1
    out = {
        "probe": "dot_codegen",
        "rows": n_rows,
        "queries": args.queries,
        "pairs": n_rows * args.queries,
        "counts": counts["hof"],
        "hof_s": round(min(timings["hof"]), 2),
        "unrolled_s": round(min(timings["unrolled"]), 2),
        "hof_over_unrolled": round(min(timings["hof"]) / min(timings["unrolled"]), 2),
        "codegen_spans": codegen,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
