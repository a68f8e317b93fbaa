"""Scaled A/B of spark.io.compression.codec where shuffle bytes are REAL.

The round-11 registry-query probe (`shuffle_codec_probe.py`) could not
discriminate lz4 vs zstd because sf0.1 shuffles a few MB — order effects
swamped the codec. This probe manufactures the production condition the
guide (§2.3) actually talks about: a multi-GB payload exchange, built by
replicating lineitem in-flight (explode over a sequence — no disk blowup)
and forcing the full rows through one keyed repartition into a noop sink.

One process per (codec, rep) because the codec is a SparkContext-build
conf; the caller interleaves (lz4, zstd, lz4, ...) to decorrelate host
drift. Within a process: warmup pass, then -n timed runs; reports min and
the exchange's shuffle bytes written (from the stage metrics REST-less
AppStatusStore, same approach as capacity_check.py).

Usage: shuffle_codec_scale_probe.py <codec> [-n 3] [--rep 64]
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
    codec = args.pop(0)
    n = 3
    rep = 64
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
    ui_port = 4049
    spark = (
        SparkSession.builder.appName(f"codec-scale-{codec}")
        .master(f"local[{cpus}]")
        .config("spark.io.compression.codec", codec)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")  # REST metrics for shuffle bytes
        .config("spark.ui.port", str(ui_port))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def payload(rep_n: int):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        return (
            li.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(rep_n - 1))))
            .withColumn(
                "k",
                F.pmod(F.xxhash64("l_orderkey", "l_linenumber", "r"), F.lit(1_000_000)),
            )
            .repartition(int(cpus) * 4, "k")
        )

    def force(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    force(payload(2))  # warmup: codegen + codec init

    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        force(payload(rep))
        runs.append(round(time.perf_counter() - t0, 3))

    # total shuffle bytes written across the app (monitoring REST API,
    # same approach as capacity_check.py)
    import urllib.request

    swritten = None
    try:
        base = f"http://localhost:{ui_port}/api/v1"
        apps = json.load(urllib.request.urlopen(f"{base}/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/applications/{app_id}/stages", timeout=10)
        )
        swritten = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        pass
    print(json.dumps({"codec": codec, "rep": rep, "min": min(runs), "runs": runs,
                      "shuffle_write_bytes_total": swritten}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
