"""Min-of-N per-query timing for noisy hosts (optimization-round A/B tool).

Usage: ab_bench.py [-n N] [--sf DIR] name1 [name2 ...]

Runs each named registry query N times (default 5) under bench.py's exact
regime — noop sink, cache isolation between runs, warmup pass first — and
prints per-query min/median/max. The MIN is the decision number: this
sandbox shows CPU-steal bursts that inflate single runs 2-3x (see
OPTIMIZATION_r11.md), and the minimum over interleaved repetitions is the
steal-free estimate. bench.py itself is untouched (driver contract).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mssql2monetdb_spark.queries.registry import REGISTRY  # noqa: E402
from mssql2monetdb_spark.session import get_spark  # noqa: E402
import mssql2monetdb_spark.queries  # noqa: E402,F401


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    args = sys.argv[1:]
    n = 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "-n" in args:
        i = args.index("-n")
        n = int(args[i + 1])
        del args[i : i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args
    if not names:
        sys.exit(__doc__)
    spark = get_spark("ab-bench")
    from mssql2monetdb_spark.engine import caches

    def isolate() -> None:
        caches.release()
        spark.catalog.clearCache()

    # warmup at the smallest SF (JVM/codegen startup, like bench.py)
    warm = "/root/testdata/sf0.001"
    for name in names:
        force(REGISTRY[name].build(spark, warm))
    isolate()

    results: dict[str, list[float]] = {name: [] for name in names}
    # interleave repetitions so a steal burst cannot bias one query's set
    for _ in range(n):
        for name in names:
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.perf_counter()
            force(REGISTRY[name].build(spark, sf_dir))
            results[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            isolate()
    out = {
        name: {
            "min": round(min(v), 3),
            "median": round(statistics.median(v), 3),
            "max": round(max(v), 3),
            "runs": [round(x, 3) for x in v],
        }
        for name, v in results.items()
    }
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
