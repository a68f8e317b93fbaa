"""sf0.1 -> sf1 capacity check for the dedup/ANN headliners (one-off, not
part of the per-round gate).

Measures wall time and shuffle volume for dedup_minhash_lsh,
dedup_ngram_jaccard, ann_ivf_topk and dedup_chunk_substring at sf0.1 and at
a derived 10x corpus, then reports the scaling exponent
``log(t_sf1 / t_sf01) / log(10)`` — the cheapest way to catch a
super-linear candidate blowup (e.g. the verification joins in
operators/dedup.py shipping per-candidate shingle arrays) before claiming
100 TB readiness.

The scaled corpus derives from the driver-generated sf0.1 fixtures (never
synthesized from scratch): each replica passes the text through a distinct
affine letter permutation (312 available — supports --factor up to 312)
so replicas are NOT near-duplicates of each other — organic within-replica
dup density is preserved and simply scaled Nx, which is the workload shape
an Nx-bigger real corpus has. Embeddings get a per-replica deterministic
offset for the same reason.

``--clones`` additionally builds a WORST-CASE corpus: 10 byte-identical
replicas (no salting), so every document sits in a 10-clone near-dup
cluster — 45 candidate pairs per group, the densest candidate load the
banded join can produce. This is the direct stress test for the
verification joins that ship per-candidate shingle-hash arrays
(operators/dedup.py minhash/ngram verify), flagged as the first thing to
profile at 100 TB.

Usage:  python scripts/capacity_check.py [--rebuild] [--clones] [--factor N]
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

from mssql2monetdb_spark.queries import REGISTRY  # noqa: E402
from mssql2monetdb_spark.session import _BUILD_CONF, default_parallelism  # noqa: E402

UI_PORT = 4049

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/capacity_sf1"
REPLICAS = 10

#: multipliers coprime to 26 — with 26 shifts they give 312 distinct affine
#: letter permutations, so --factor up to 312 still yields pairwise-distinct
#: (non-near-dup) replicas
_COPRIMES = (1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)


def _affine_perm(i: int) -> str:
    """Replica-i substitution alphabet: letter j -> (a*j + b) mod 26."""
    a = _COPRIMES[(i // 26) % len(_COPRIMES)]
    b = i % 26
    return "".join(ALPHA[(a * j + b) % 26] for j in range(26))
QUERIES = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_ivf_topk",
    "dedup_chunk_substring",
    # round-4 additions: the affine salting gives each replica a DISJOINT
    # vocabulary, so factor-N grows the tfidf broadcast df relation ~N x —
    # the worst case for its broadcast decision (real corpora grow vocab
    # sub-linearly). chunk_overlap is the map-only control.
    "text_tfidf_topk",
    "prep_chunk_overlap",
    # exact prefix-filter join: candidates only within a replica (salted
    # shingle spaces are disjoint), so factor-N scales organic density Nx
    "dedup_setsim_exact",
    # round-11 continuation additions: classifier/DSIR are the map-only
    # controls (exponent ~= data growth); winnowing's posting join gets
    # disjoint per-replica fingerprint spaces from the affine salting, so
    # factor-N is its organic-density worst case
    "quality_classifier_linear",
    "sample_importance_dsir",
    "dedup_winnow_fingerprints",
]

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def build_sf1(spark, *, out_dir: str = SF1, salt: bool = True, factor: int = REPLICAS) -> None:
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for i in range(factor):
        perm = _affine_perm(i) if salt else ALPHA
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
                F.translate(F.col("text"), ALPHA, perm).alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            )
        )
    big_docs = parts[0]
    for p in parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_docs.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    if not salt:
        # clones mode only needs documents; link the rest through
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"):
            src, dst = f"{SF01}/{t}.parquet", f"{out_dir}/{t}.parquet"
            if os.path.exists(src) and not os.path.exists(dst):
                os.symlink(src, dst)
        return

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    id_col = "emb_id" if "emb_id" in emb.columns else emb.columns[0]
    vec_col = "embedding" if "embedding" in emb.columns else emb.columns[-1]
    n_emb = emb.agg(F.max(id_col)).first()[0] + 1
    eparts = []
    for i in range(factor):
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
    big_emb.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    # the four queries only read documents/embeddings; link the relational
    # tables through so Tables() loading doesn't fail if a query touches one
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events"):
        src = f"{SF01}/{t}.parquet"
        dst = f"{out_dir}/{t}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def _bench_session():
    """get_spark's exact conf, plus the monitoring REST API (public,
    stable) for per-stage shuffle metrics — the internal AppStatusStore
    signature changed across Spark versions, the REST route has not."""
    from pyspark.sql import SparkSession

    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName("capacity-check")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.showConsoleProgress", "false")
    )
    for key, value in _BUILD_CONF.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def shuffle_bytes(spark) -> int | None:
    """Total shuffle-write bytes across completed stages via the
    monitoring REST API; None if the UI endpoint is unavailable."""
    import urllib.request

    try:
        base = f"http://localhost:{UI_PORT}/api/v1"
        apps = json.load(urllib.request.urlopen(f"{base}/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/applications/{app_id}/stages", timeout=10)
        )
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
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


SF1_CLONES = "/tmp/capacity_sf1_clones"

EVENTS_QUERIES = [
    "events_sessionize",
    "events_sessionize_bounded",
    "events_transition_matrix",
    "events_anomaly_mad",
    "funnel_stages",
    "retention_cohorts",
]


def build_events(
    spark, *, out_dir: str, factor: int, hot_user: bool = False, hot_replicas: int = 1
) -> None:
    """Nx events corpus: replicas shift user_id/event_id into fresh ranges,
    so per-user history length stays organic while user count scales Nx —
    the workload shape of an Nx-bigger event log (the window-heavy events
    family partitions by user_id, so MORE users is the relevant axis).

    ``hot_user=True`` collapses replica 0's users onto a single user id —
    1/N of ALL events land on one key. Per-user windows cannot split a key
    (AQE skew-join splitting doesn't apply to window sorts), so this probes
    the family's true worst case: one task sorting the hot user's history.
    ``hot_replicas`` collapses that many replicas (hot_replicas/factor of
    ALL events on one key) — the past-the-cliff concentration the bounded
    sessionizer exists for.
    """
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    n_ev = ev.agg(F.max("event_id")).first()[0] + 1
    n_u = ev.agg(F.max("user_id")).first()[0] + 1
    parts = [
        ev.select(
            (F.col("event_id") + F.lit(i * n_ev)).alias("event_id"),
            "ts",
            (
                F.lit(0)
                if (hot_user and i < hot_replicas)
                else (F.col("user_id") + F.lit(i * n_u))
            ).cast("bigint").alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for i in range(factor)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        src, dst = f"{SF01}/{t}.parquet", f"{out_dir}/{t}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def main() -> int:
    spark = _bench_session()
    clones = "--clones" in sys.argv
    if clones:
        if "--rebuild" in sys.argv or not os.path.isdir(SF1_CLONES):
            build_sf1(spark, out_dir=SF1_CLONES, salt=False)
        targets = ["dedup_minhash_lsh", "dedup_ngram_jaccard"]
        for name in targets:
            REGISTRY[name].build(spark, "/root/testdata/sf0.01").write.mode(
                "overwrite"
            ).format("noop").save()
        report = {}
        for name in targets:
            small = run_one(spark, name, SF01)
            big = run_one(spark, name, SF1_CLONES)
            report[name] = {
                "sf0.1_organic": small,
                "sf1_worstcase_clones": big,
                "wall_ratio_10x": round(big["wall_sec"] / small["wall_sec"], 2),
                "shuffle_ratio_10x": (
                    round(big["shuffle_bytes"] / small["shuffle_bytes"], 2)
                    if small.get("shuffle_bytes") and big.get("shuffle_bytes")
                    else None
                ),
            }
        print(json.dumps(report))
        return 0

    factor = REPLICAS
    if "--factor" in sys.argv:
        factor = int(sys.argv[sys.argv.index("--factor") + 1])
    if "--skew" in sys.argv:
        # same-size corpora, organic vs one hot user owning 1/factor of all
        # events — isolates key-skew cost in the per-user window family
        even_dir = f"/tmp/capacity_events_x{factor}"
        hot_dir = f"/tmp/capacity_events_hot_x{factor}"
        if "--rebuild" in sys.argv or not os.path.isdir(even_dir):
            build_events(spark, out_dir=even_dir, factor=factor)
        if "--rebuild" in sys.argv or not os.path.isdir(hot_dir):
            build_events(spark, out_dir=hot_dir, factor=factor, hot_user=True)
        targets = ["events_sessionize", "events_anomaly_mad"]
        for name in targets:
            REGISTRY[name].build(spark, "/root/testdata/sf0.01").write.mode(
                "overwrite"
            ).format("noop").save()
        report = {"factor": factor, "mode": "skew"}
        for name in targets:
            even = run_one(spark, name, even_dir)
            hot = run_one(spark, name, hot_dir)
            report[name] = {
                "organic": even,
                "hot_user": hot,
                "skew_penalty": round(hot["wall_sec"] / even["wall_sec"], 2),
            }
        print(json.dumps(report))
        return 0

    if "--skew-bounded" in sys.argv:
        # past-the-cliff concentration: HALF of all events on ONE user —
        # plain sessionize must sort that key in a single task; the
        # bounded variant splits it across (user, day-bucket) groups.
        even_dir = f"/tmp/capacity_events_x{factor}"
        hot_dir = f"/tmp/capacity_events_hot50_x{factor}"
        if "--rebuild" in sys.argv or not os.path.isdir(even_dir):
            build_events(spark, out_dir=even_dir, factor=factor)
        if "--rebuild" in sys.argv or not os.path.isdir(hot_dir):
            build_events(
                spark,
                out_dir=hot_dir,
                factor=factor,
                hot_user=True,
                hot_replicas=max(1, factor // 2),
            )
        targets = ["events_sessionize", "events_sessionize_bounded"]
        for name in targets:
            REGISTRY[name].build(spark, "/root/testdata/sf0.01").write.mode(
                "overwrite"
            ).format("noop").save()
        report = {"factor": factor, "mode": "skew-bounded",
                  "hot_share": round(max(1, factor // 2) / factor, 2)}
        for name in targets:
            even = run_one(spark, name, even_dir)
            hot = run_one(spark, name, hot_dir)
            report[name] = {
                "organic": even,
                "hot_user": hot,
                "skew_penalty": round(hot["wall_sec"] / even["wall_sec"], 2),
            }
        report["bounded_vs_plain_on_hot"] = round(
            report["events_sessionize_bounded"]["hot_user"]["wall_sec"]
            / report["events_sessionize"]["hot_user"]["wall_sec"],
            2,
        )
        print(json.dumps(report))
        return 0

    if "--bloom" in sys.argv:
        # A/B for the runtime bloom-filter join (join_runtime_bloom_pruned's
        # scale claim): identical shuffle join of lineitem against the
        # selective urgent-orders dimension at sf0.1, bloom OFF vs ON,
        # measured by per-arm shuffle-write delta and wall clock. The ON
        # arm should shuffle ~priority-selectivity of the fact side (~1/5)
        # plus the filter's own one-row exchange.
        t_li = spark.read.parquet(f"{SF01}/lineitem.parquet")
        t_or = spark.read.parquet(f"{SF01}/orders.parquet")

        def bloom_join():
            dim = t_or.filter(F.col("o_orderpriority") == "1-URGENT").select(
                "o_orderkey"
            )
            return (
                t_li.join(dim, t_li["l_orderkey"] == dim["o_orderkey"])
                .groupBy("l_returnflag")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            )

        confs = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        }
        for k, v in confs.items():
            spark.conf.set(k, v)
        report = {"mode": "bloom", "sf": 0.1}
        bloom_join().write.mode("overwrite").format("noop").save()  # warmup
        for label, enabled in (("bloom_off", "false"), ("bloom_on", "true")):
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter.enabled", enabled
            )
            before = shuffle_bytes(spark) or 0
            start = time.perf_counter()
            bloom_join().write.mode("overwrite").format("noop").save()
            report[label] = {
                "wall_sec": round(time.perf_counter() - start, 3),
                "shuffle_bytes": (shuffle_bytes(spark) or 0) - before,
            }
        off, on = report["bloom_off"], report["bloom_on"]
        if off["shuffle_bytes"] and on["shuffle_bytes"]:
            report["shuffle_reduction"] = round(
                1 - on["shuffle_bytes"] / off["shuffle_bytes"], 3
            )
        print(json.dumps(report))
        return 0

    if "--tri-hub" in sys.argv:
        # Hub-skew axis for triangle counting: the degree-ordered
        # orientation's whole reason to exist. A star hub of degree D
        # generates D^2 wedges under the NAIVE shared-endpoint join (both
        # directions through the hub) but ZERO oriented wedges (every hub
        # edge points INTO the max-degree hub, so its oriented out-degree
        # is 0) — the quadratic vs O(m^1.5) gap. The naive arm is priced
        # only at small D (its cost IS the point: 20k spokes -> 4x10^8
        # wedges); the oriented arm runs to D=10^6 flat.
        from mssql2monetdb_spark.operators import graph

        def hub_graph(d: int):
            spokes = spark.range(d).select(
                (F.col("id") + 3).alias("src"),
                F.lit(0).cast("bigint").alias("dst"),
                F.lit(1).cast("bigint").alias("weight"),
            )
            tri = spark.createDataFrame(
                [(0, 1, 1), (0, 2, 1), (1, 2, 1)],
                "src bigint, dst bigint, weight bigint",
            )
            return spokes.unionAll(tri)

        def naive_triangles(edges):
            und = (
                edges.select(
                    F.least("src", "dst").alias("a"),
                    F.greatest("src", "dst").alias("b"),
                )
                .filter(F.col("a") != F.col("b"))
                .distinct()
            )
            sym = und.unionAll(
                und.select(F.col("b").alias("a"), F.col("a").alias("b"))
            )
            e1 = sym.select(F.col("a").alias("x"), F.col("b").alias("y"))
            e2 = sym.select(F.col("a").alias("y"), F.col("b").alias("z"))
            wedges = e1.join(e2, "y").filter(F.col("x") < F.col("z"))
            closing = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
            tris = wedges.join(closing, ["x", "z"])
            # every triangle found once per mid-vertex = 3x; normalize
            return tris.groupBy().agg((F.count(F.lit(1)) / 3).alias("n"))

        report = {"mode": "tri-hub"}
        for d in (5_000, 20_000):
            edges = hub_graph(d)
            start = time.perf_counter()
            naive_triangles(edges).write.mode("overwrite").format("noop").save()
            t_naive = round(time.perf_counter() - start, 3)
            start = time.perf_counter()
            graph.triangle_counts(edges).write.mode("overwrite").format(
                "noop"
            ).save()
            t_oriented = round(time.perf_counter() - start, 3)
            report[f"D_{d}"] = {
                "naive_wedge_join": t_naive,
                "oriented": t_oriented,
                "speedup": round(t_naive / max(t_oriented, 1e-9), 2),
            }
        for d in (100_000, 1_000_000):
            edges = hub_graph(d)
            start = time.perf_counter()
            graph.triangle_counts(edges).write.mode("overwrite").format(
                "noop"
            ).save()
            report[f"D_{d}"] = {
                "oriented": round(time.perf_counter() - start, 3),
                "naive_wedge_join": "skipped (D^2 wedges)",
            }
        print(json.dumps(report))
        return 0

    if "--hub" in sys.argv:
        # Hub-skew axis for the PageRank fold (round-11 verdict item 1):
        # the replica-based 10x/312x probes multiply NODE COUNT while
        # holding max in-degree constant, so they structurally cannot see
        # the cost of one node absorbing a power-law in-neighborhood.
        # Build a synthetic hub — ONE dst with `indeg` in-edges plus a
        # small back-ring so every node has out-degree — and price one
        # power-iteration round for three arms:
        #   B=1      — degenerates to the old single-level fold: the hub's
        #              ENTIRE in-neighborhood is ONE collect_list array in
        #              one row (the r10 `weak`);
        #   B=1024   — the shipped two-level fold: largest array indeg/B;
        #   prod     — exact_hashes=False (plain partial-aggregatable SUM,
        #              no arrays): the determinism-tax baseline.
        from mssql2monetdb_spark.operators import graph

        report = {"mode": "hub", "iterations": 1}
        for indeg in (100_000, 1_000_000):
            spokes = spark.range(indeg).select(
                (F.col("id") + 10).alias("src"),
                F.lit(0).cast("bigint").alias("dst"),
                F.lit(1).cast("bigint").alias("weight"),
            )
            ring = spark.range(9).select(
                F.lit(0).cast("bigint").alias("src"),
                (F.col("id") + 1).alias("dst"),
                F.lit(1).cast("bigint").alias("weight"),
            )
            edges = spokes.unionAll(ring)
            # warmup: JIT + codegen caches, so arm order doesn't bias
            graph.pagerank(edges.limit(1000), iterations=1).write.mode(
                "overwrite"
            ).format("noop").save()
            arms = {}
            for label, kwargs in (
                ("single_level_B1", {"fold_buckets": 1}),
                ("two_level_B1024", {"fold_buckets": 1024}),
                ("production_sum", {"exact_hashes": False}),
            ):
                start = time.perf_counter()
                graph.pagerank(edges, iterations=1, **kwargs).write.mode(
                    "overwrite"
                ).format("noop").save()
                arms[label] = round(time.perf_counter() - start, 3)
            arms["two_level_speedup_vs_B1"] = round(
                arms["single_level_B1"] / arms["two_level_B1024"], 2
            )
            report[f"indeg_{indeg}"] = arms
        print(json.dumps(report))
        return 0

    if "--join-skew" in sys.argv:
        # Big-big equi-join with HALF the fact rows on ONE key — the join
        # analogue of --skew-bounded. Three arms, identical output
        # (checksummed): (1) plain join under the repo's default session
        # (AQE skew-split ON — the posture SCALE.md claims handles
        # moderate join skew), (2) plain join with skew-split DISABLED
        # (what the hot key costs with no mitigation), (3) explicit
        # joins.salted_join with skew-split disabled (what the manual
        # fallback buys when AQE can't help, priced with its n_salts-fold
        # dimension replication). Corpus is deterministic (id-derived
        # keys, no rand()): fact rows alternate key 0 / xxhash-spread,
        # dim is wide enough (~4M rows of hash strings) to defeat the
        # 64 MB auto-broadcast so the join genuinely shuffles.
        from mssql2monetdb_spark.operators.joins import salted_join

        jdir = f"/tmp/capacity_joinskew_x{factor}"
        n_fact = 200_000 * factor
        n_dim = 4_000_000
        if "--rebuild" in sys.argv or not os.path.isdir(jdir):
            fact = spark.range(n_fact).select(
                F.when(F.col("id") % 2 == 0, F.lit(0).cast("bigint"))
                .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_dim)))
                .alias("k"),
                F.pmod(F.col("id") * 17, F.lit(1000)).alias("v"),
                # incompressible payload so the fact side also exceeds the
                # 64 MB broadcast ceiling — otherwise Spark (correctly)
                # broadcasts the small fact and no shuffle join exists to
                # measure skew on
                F.md5(F.col("id").cast("string")).alias("p"),
            )
            fact.repartition(32).write.mode("overwrite").parquet(f"{jdir}/fact.parquet")
            dim = spark.range(n_dim).select(
                F.col("id").alias("k"),
                F.md5(F.col("id").cast("string")).alias("a1"),
                F.sha1(F.col("id").cast("string")).alias("a2"),
            )
            dim.repartition(32).write.mode("overwrite").parquet(f"{jdir}/dim.parquet")
        fact = spark.read.parquet(f"{jdir}/fact.parquet")
        dim = spark.read.parquet(f"{jdir}/dim.parquet")

        def _measure_join(df) -> dict:
            before = shuffle_bytes(spark)
            start = time.perf_counter()
            chk = df.agg(
                # pmod keeps the sum far from bigint overflow at any factor;
                # the checksum reads BOTH payload columns so column pruning
                # can't shrink either scan back under the broadcast ceiling
                F.sum(F.pmod(F.xxhash64("k", "v", "p", "a1"), F.lit(1_000_000_007))).alias("chk"),
                F.count(F.lit(1)).alias("rows"),
            ).first()
            wall = time.perf_counter() - start
            after = shuffle_bytes(spark)
            return {
                "wall_sec": round(wall, 3),
                "shuffle_bytes": (after - before)
                if (before is not None and after is not None)
                else None,
                "chk": int(chk["chk"]),
                "rows": int(chk["rows"]),
            }

        arms = {}

        def _arm_plain():
            return _measure_join(fact.join(dim, "k", "inner"))

        def _arm_no_split():
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            try:
                return _measure_join(fact.join(dim, "k", "inner"))
            finally:
                spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

        def _arm_salted():
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            try:
                return _measure_join(salted_join(fact, dim, on="k", n_salts=8))
            finally:
                spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

        runs = {"plain_aqe_skew_split": _arm_plain,
                "plain_no_mitigation": _arm_no_split,
                "salted_8": _arm_salted}
        for _ in range(2):  # interleaved rounds, not sequential arms
            for arm, fn in runs.items():
                arms.setdefault(arm, []).append(fn())
        chks = {r["chk"] for rs in arms.values() for r in rs}
        report = {
            "factor": factor,
            "mode": "join-skew",
            "hot_share": 0.5,
            "n_fact": n_fact,
            "n_dim": n_dim,
            "all_arms_equal": len(chks) == 1,
            **arms,
        }
        print(json.dumps(report))
        return 0

    if "--events" in sys.argv:
        ev_dir = f"/tmp/capacity_events_x{factor}"
        if "--rebuild" in sys.argv or not os.path.isdir(ev_dir):
            build_events(spark, out_dir=ev_dir, factor=factor)
        for name in EVENTS_QUERIES:
            REGISTRY[name].build(spark, "/root/testdata/sf0.01").write.mode(
                "overwrite"
            ).format("noop").save()
        report = {"factor": factor, "mode": "events"}
        for name in EVENTS_QUERIES:
            small = run_one(spark, name, SF01)
            big = run_one(spark, name, ev_dir)
            report[name] = {
                "sf0.1": small,
                f"x{factor}": big,
                "wall_exponent": round(
                    math.log(big["wall_sec"] / small["wall_sec"]) / math.log(factor), 3
                ),
                "shuffle_exponent": (
                    round(
                        math.log(big["shuffle_bytes"] / small["shuffle_bytes"])
                        / math.log(factor),
                        3,
                    )
                    if small.get("shuffle_bytes") and big.get("shuffle_bytes")
                    else None
                ),
            }
        print(json.dumps(report))
        return 0
    big_dir = SF1 if factor == REPLICAS else f"/tmp/capacity_x{factor}"
    if "--rebuild" in sys.argv or not os.path.isdir(big_dir):
        build_sf1(spark, out_dir=big_dir, factor=factor)

    queries = QUERIES
    if "--only" in sys.argv:  # comma-separated subset, e.g. re-measuring one
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        queries = [n for n in QUERIES if n in only]

    # warmup at the smallest SF so codegen isn't billed to the first run
    for name in queries:
        REGISTRY[name].build(spark, "/root/testdata/sf0.01").write.mode(
            "overwrite"
        ).format("noop").save()

    report = {"factor": factor}
    for name in queries:
        small = run_one(spark, name, SF01)
        big = run_one(spark, name, big_dir)
        exponent = math.log(big["wall_sec"] / small["wall_sec"]) / math.log(factor)
        shuffle_exp = (
            round(
                math.log(big["shuffle_bytes"] / small["shuffle_bytes"])
                / math.log(factor),
                3,
            )
            if small.get("shuffle_bytes") and big.get("shuffle_bytes")
            else None
        )
        report[name] = {
            "sf0.1": small,
            f"x{factor}": big,
            "wall_exponent": round(exponent, 3),
            "shuffle_exponent": shuffle_exp,
        }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
