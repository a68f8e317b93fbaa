"""sf0.1 -> sf1 capacity check for the dedup/ANN headliners (one-off, not
part of the per-round gate).

Measures wall time and shuffle volume for dedup_minhash_lsh,
dedup_ngram_jaccard, ann_ivf_topk and dedup_chunk_substring at sf0.1 and at
a derived 10x corpus, then reports the scaling exponent
``log(t_sf1 / t_sf01) / log(10)`` — the cheapest way to catch a
super-linear candidate blowup (e.g. the verification joins in
operators/dedup.py shipping per-candidate shingle arrays) before claiming
100 TB readiness.

The 10x corpus derives from the driver-generated sf0.1 fixtures (never
synthesized from scratch): each replica character-rotates the text
(ROT-i over the letter alphabet) so replicas are NOT near-duplicates of
each other — organic within-replica dup density is preserved and simply
scaled 10x, which is the workload shape a 10x-bigger real corpus has.
Embeddings get a per-replica deterministic offset for the same reason.

Usage:  python scripts/capacity_check.py [--rebuild]
Writes: /tmp/capacity_sf1/ (derived parquet), prints a JSON report line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from mssql2monetdb_spark.session import get_spark  # noqa: E402
from mssql2monetdb_spark.queries import REGISTRY  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/capacity_sf1"
REPLICAS = 10
QUERIES = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_ivf_topk",
    "dedup_chunk_substring",
]

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def build_sf1(spark) -> None:
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for i in range(REPLICAS):
        rot = ALPHA[i:] + ALPHA[:i]
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
                F.translate(F.col("text"), ALPHA, rot).alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            )
        )
    big_docs = parts[0]
    for p in parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_docs.repartition(32).write.mode("overwrite").parquet(f"{SF1}/documents.parquet")

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    id_col = "emb_id" if "emb_id" in emb.columns else emb.columns[0]
    vec_col = "embedding" if "embedding" in emb.columns else emb.columns[-1]
    n_emb = emb.agg(F.max(id_col)).first()[0] + 1
    eparts = []
    for i in range(REPLICAS):
        eparts.append(
            emb.select(
                (F.col(id_col) + F.lit(i * n_emb)).alias(id_col),
                *[c for c in emb.columns if c not in (id_col, vec_col)],
                F.transform(
                    F.col(vec_col), lambda x: x + F.lit(float(i) * 0.037)
                ).alias(vec_col),
            )
        )
    big_emb = eparts[0]
    for p in eparts[1:]:
        big_emb = big_emb.unionByName(p)
    big_emb.repartition(32).write.mode("overwrite").parquet(f"{SF1}/embeddings.parquet")

    # the four queries only read documents/embeddings; link the relational
    # tables through so Tables() loading doesn't fail if a query touches one
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events"):
        src = f"{SF01}/{t}.parquet"
        dst = f"{SF1}/{t}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def shuffle_bytes(spark) -> int | None:
    """Total shuffle-write bytes across completed stages (AppStatusStore);
    None if the internal API moved."""
    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        it = store.stageList(None).iterator()
        total = 0
        while it.hasNext():
            total += it.next().shuffleWriteBytes()
        return int(total)
    except Exception:
        return None


def run_one(spark, name: str, sf_dir: str) -> dict:
    q = REGISTRY[name]
    before = shuffle_bytes(spark)
    start = time.perf_counter()
    q.build(spark, sf_dir).write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - start
    after = shuffle_bytes(spark)
    delta = (after - before) if (before is not None and after is not None) else None
    return {"wall_sec": round(wall, 3), "shuffle_bytes": delta}


def main() -> int:
    spark = get_spark("capacity-check")
    if "--rebuild" in sys.argv or not os.path.isdir(SF1):
        build_sf1(spark)

    # warmup at the smallest SF so codegen isn't billed to the first run
    for name in QUERIES:
        REGISTRY[name].build(spark, "/root/testdata/sf0.01").write.mode(
            "overwrite"
        ).format("noop").save()

    report = {}
    for name in QUERIES:
        small = run_one(spark, name, SF01)
        big = run_one(spark, name, SF1)
        exponent = math.log(big["wall_sec"] / small["wall_sec"]) / math.log(REPLICAS)
        report[name] = {
            "sf0.1": small,
            "sf1": big,
            "scaling_exponent": round(exponent, 3),
        }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
