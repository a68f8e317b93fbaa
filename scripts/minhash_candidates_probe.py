"""A/B the MinHash-LSH candidate-generation stage (optimization r11, session 3).

Closes the round's last "Not yet optimized" dedup item with a measurement.
The band-bucket SELF-JOIN cannot be Bloom-pre-filtered (guide §3.2 needs an
asymmetric join — in a self-join every key trivially exists on both sides),
so the candidate lever is the other classic LSH shape: GROUP the band rows
by bucket and emit the pairs from each bucket's sorted id list.

variant A (current, dedup.minhash_lsh_pairs):
    bands ⋈ bands ON (band, bkey), doc_a < doc_b, DISTINCT
    — two scans of the (cached) band projection, join + distinct exchanges.
variant B (bucket-aggregate):
    bands.groupBy(band, bkey).agg(sort_array(collect_list(id)))
         .filter(size >= 2) -> posexplode/slice pair expansion, DISTINCT
    — ONE exchange of the band rows (map-side partial collect), pairs are
    generated array-side; buckets of size 1 (the vast majority at real
    band widths) never produce a row.

Both variants are asserted PAIR-IDENTICAL at sf0.01 before timing; timing
is the FULL minhash_lsh_pairs query (candidates feed the verify joins) at
$SPARK_GRAFT_SF_DIR, interleaved min-of-N under bench.py's regime.

Usage: python scripts/minhash_candidates_probe.py [-n 3]
"""

from __future__ import annotations

import json
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
from mssql2monetdb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(sys.argv[sys.argv.index("-n") + 1]) if "-n" in sys.argv else 3


def force(df: DataFrame) -> None:
    df.write.mode("overwrite").format("noop").save()


def _per_doc(docs: DataFrame, shingle_n: int) -> DataFrame:
    rows = dedup.shingle_rows(docs, "text", "doc_id", shingle_n, distinct=False)
    return caches.tracked(
        rows.groupBy("id")
        .agg(*dedup._sig_agg_cols(), F.sort_array(F.collect_set("h64")).alias("hs"))
        .withColumn("sz", F.size("hs"))
    )


def candidates_join(bands: DataFrame) -> DataFrame:
    left = bands.select(F.col("id").alias("doc_a"), "band", "bkey")
    right = bands.select(F.col("id").alias("doc_b"), "band", "bkey")
    return (
        left.join(right, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def candidates_agg(bands: DataFrame) -> DataFrame:
    buckets = (
        bands.groupBy("band", "bkey")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    ex = buckets.select(F.posexplode("ids").alias("i", "doc_a"), F.col("ids"))
    return (
        ex.select(
            "doc_a",
            F.explode(F.slice("ids", F.col("i") + F.lit(2), F.size("ids"))).alias("doc_b"),
        )
        .distinct()
    )


def pairs_with(docs: DataFrame, cand_fn, *, shingle_n: int = 3, threshold: float = 0.8) -> DataFrame:
    per_doc = _per_doc(docs, shingle_n)
    bands = dedup.lsh_bands(per_doc.select("id", *[f"mh{i}" for i in range(hashing.MINHASH_K)]))
    candidates = cand_fn(bands)
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


def main() -> None:
    spark = get_spark("minhash-candidates-probe")

    def isolate() -> None:
        caches.release()
        spark.catalog.clearCache()

    # equivalence gate at sf0.01: candidate SETS identical both ways
    docs001 = Tables(spark, "/root/testdata/sf0.01").documents
    a = sorted(map(tuple, pairs_with(docs001, candidates_join).collect()))
    isolate()
    b = sorted(map(tuple, pairs_with(docs001, candidates_agg).collect()))
    isolate()
    assert a == b, f"variant outputs differ: {len(a)} vs {len(b)} rows"
    print(f"equivalence OK at sf0.01 ({len(a)} pairs)")

    docs = Tables(spark, SF_DIR).documents
    # warmup both shapes
    force(pairs_with(docs001, candidates_join)); isolate()
    force(pairs_with(docs001, candidates_agg)); isolate()

    res: dict[str, list[float]] = {"join": [], "agg": []}
    for _ in range(N):
        for name, fn in (("join", candidates_join), ("agg", candidates_agg)):
            spark.sparkContext.setJobDescription(f"minhash-cand:{name}")
            t0 = time.perf_counter()
            force(pairs_with(docs, fn))
            res[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            isolate()
    print(json.dumps({k: {"min": round(min(v), 3), "runs": [round(x, 3) for x in v]} for k, v in res.items()}, indent=2))


if __name__ == "__main__":
    main()
