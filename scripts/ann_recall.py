"""ANN recall characterization (SCALE.md "ANN recall" section).

Measures recall@5 vs exact cosine brute-force for the ANN ladder on two
corpora:

- the ORGANIC sf0.1 embeddings (structureless random vectors — the
  adversarial floor for every ANN family), and
- a CLUSTERED variant (each vector shifted by a strong label-dependent
  offset — the shape real embedding corpora have; same construction as
  the round-4 counter-measurement).

Round-5 addition: the PQ rows compare the SEEDED codebook (refine_iters=0,
the oracle-pinned path) against the TRAINED quality preset
(`topk_pq_adc_trained`: Lloyd refine_iters=4) at the same ks, so the
preset's lift is a pinned number rather than a claim.

Usage: python scripts/ann_recall.py [--ks 64] [--queries 10]
Prints one JSON line.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mssql2monetdb_spark.operators import similarity as sim
from mssql2monetdb_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def _lcg_offset(label_col, dim):
    """Deterministic per-label offset vector, component c in [-1.5, 1.5):
    LCG-mixed from (label, c) — strong relative to unit-ish fixture
    components, so labels become real clusters."""
    comps = [
        (
            (
                (label_col.cast("bigint") * 1103515245 + 12345 + c * 2654435761)
                % 1000003
            ).cast("double")
            / 1000003.0
            * 3.0
            - 1.5
        )
        for c in range(dim)
    ]
    return F.array(*comps)


def clustered(emb):
    off = _lcg_offset(F.col("label"), sim.EMBED_DIM)
    return emb.select(
        "vec_id",
        F.zip_with(F.col("embedding"), off, lambda e, o: (e + o).cast("float")).alias(
            "embedding"
        ),
        "label",
    )


def recall_at_k(spark, emb, maker, query_ids, k=5):
    truth = {
        (r["query_id"], r["vec_id"])
        for r in sim.topk_bruteforce(emb, query_ids, k=k).collect()
    }
    got = {
        (r["query_id"], r["vec_id"]) for r in maker(emb, query_ids).collect()
    }
    return round(len(truth & got) / len(truth), 3)


def main():
    ks = 64
    if "--ks" in sys.argv:
        ks = int(sys.argv[sys.argv.index("--ks") + 1])
    n_q = 10
    if "--queries" in sys.argv:
        n_q = int(sys.argv[sys.argv.index("--queries") + 1])
    query_ids = list(range(n_q))

    spark = get_spark("ann-recall")
    organic = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    clus = clustered(organic).cache()

    def pq_seeded(emb, qids):
        return sim.topk_pq_adc(emb, qids, ks=ks, refine_iters=0)

    def pq_trained(emb, qids):
        return sim.topk_pq_adc_trained(emb, qids, ks=ks)

    report = {"ks": ks, "n_queries": n_q, "sf_dir": SF}
    for corpus_name, emb in (("organic", organic), ("clustered", clus)):
        report[corpus_name] = {
            "pq_adc_seeded": recall_at_k(spark, emb, pq_seeded, query_ids),
            "pq_adc_trained": recall_at_k(spark, emb, pq_trained, query_ids),
            "ivf_nprobe1": recall_at_k(
                spark, emb, lambda e, q: sim.topk_ivf(e, q), query_ids
            ),
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
