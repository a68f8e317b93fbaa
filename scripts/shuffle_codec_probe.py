"""A/B spark.io.compression.codec (lz4 default vs zstd) — guide §2.3.

Usage: shuffle_codec_probe.py <codec> [-n N] name1 [name2 ...]

The codec is a SparkContext-build-time conf, so each codec needs its own
process; interleave processes (lz4, zstd, lz4, ...) externally to
decorrelate host drift. Within the process: bench.py's regime (noop sink,
warmup at sf0.001, cache isolation, min-of-N).
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
    if "-n" in args:
        i = args.index("-n")
        n = int(args[i + 1])
        del args[i : i + 2]
    names = args
    os.environ["SPARK_GRAFT_CODEC"] = codec  # record only

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(f"codec-probe-{codec}")
        .master(f"local[{cpus}]")
        .config("spark.io.compression.codec", codec)
        .config("spark.sql.shuffle.partitions", cpus)
    )
    from mssql2monetdb_spark.session import _BUILD_CONF

    for k, v in _BUILD_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    from mssql2monetdb_spark.queries.registry import REGISTRY
    import mssql2monetdb_spark.queries  # noqa: F401
    from mssql2monetdb_spark.engine import caches

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    for name in names:
        force(REGISTRY[name].build(spark, "/root/testdata/sf0.001"))
    caches.release()
    spark.catalog.clearCache()

    results = {name: [] for name in names}
    for _ in range(n):
        for name in names:
            t0 = time.perf_counter()
            force(REGISTRY[name].build(spark, sf_dir))
            results[name].append(round(time.perf_counter() - t0, 3))
            caches.release()
            spark.catalog.clearCache()
    print(json.dumps({"codec": codec, "min": {k: min(v) for k, v in results.items()}, "runs": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
