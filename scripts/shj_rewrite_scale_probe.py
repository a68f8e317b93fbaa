"""Quantify the AQE SMJ->SHJ rewrite at REAL join volume (guide §3.1).

Round-11 session 1 adopted
``spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m`` on
mechanism evidence (plans/r11/aqe_shj_mechanism_probe.txt proved the
rewrite fires on a plain fact-fact SMJ) but claimed no local bench win —
every registered query's equi-join broadcasts at sf0.1. This probe
manufactures the condition the conf exists for: a large-large equi-join
neither side of which AQE can broadcast, built by replicating lineitem
and orders in-flight. One process per threshold (0 = rewrite off,
Spark's default; 64m = the engine's session conf); the caller interleaves
processes; within a process: warmup, then -n timed runs.

The autoBroadcastJoinThreshold is forced to -1 ONLY inside this probe so
the join actually shuffles at probe scale — the point is to measure the
SMJ-vs-SHJ delta on the post-shuffle side, which at 100 TB is what a
fact-fact join pays after broadcast is off the table anyway.

Usage: shj_rewrite_scale_probe.py <thr: 0|64m> [-n 3] [--rep 24]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    args = sys.argv[1:]
    thr = args.pop(0)
    n = 3
    rep = 24
    if "-n" in args:
        i = args.index("-n")
        n = int(args[i + 1])
        del args[i : i + 2]
    if "--rep" in args:
        i = args.index("--rep")
        rep = int(args[i + 1])
        del args[i : i + 2]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName(f"shj-scale-{thr}")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", thr)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def joined(rep_n: int):
        # key both sides on (orderkey, replica) so the join multiplies
        # rows 1:lines-per-order, not rep x rep
        li = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(rep_n - 1))))
            .select("l_orderkey", "r", "l_quantity", "l_extendedprice", "l_shipdate")
        )
        orders = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(rep_n - 1))))
            .select("o_orderkey", "r", "o_orderdate", "o_totalprice")
        )
        return li.join(
            orders,
            (li["l_orderkey"] == orders["o_orderkey"]) & (li["r"] == orders["r"]),
        ).select("l_orderkey", "l_extendedprice", "o_totalprice")

    def force(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    force(joined(2))  # warmup

    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        force(joined(rep))
        runs.append(round(time.perf_counter() - t0, 3))

    print(json.dumps({"thr": thr, "rep": rep, "min": min(runs), "runs": runs}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
