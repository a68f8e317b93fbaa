"""Measure the COST of the adaptive df-broadcast guards' fallback path.

tfidf_top_terms and setsim_prefix_pairs broadcast their vocabulary-sized
(term/shingle, df) relation only while an ``approx_count_distinct`` probe
stays under the ceiling; past it they degrade to a keyed shuffle join.
SCALE.md documents the fallback — this probe prices it: run both
operators on the cached 100x capacity corpus (scripts/capacity_check.py
--factor 100 builds /tmp/capacity_x100) with the guard in its natural
state and with the fallback FORCED (ceiling 0 + autoBroadcastJoinThreshold
-1, the state a genuinely overflowing vocabulary would reach), reporting
wall time and shuffle-write bytes for each arm.

Interleaved A/B/A/B per operator (n alternating runs, median) per the
repo's measurement discipline — sequential same-session arms overstate
the second arm (SCALE.md "measured rejection" lesson).

Usage: python scripts/guard_fallback_probe.py [--dir /tmp/capacity_x100] [--n 3]
Prints one JSON line per operator arm pair.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from capacity_check import _bench_session, shuffle_bytes  # noqa: E402

from mssql2monetdb_spark.operators import dedup, ranking  # noqa: E402


def _run(spark, df) -> dict:
    before = shuffle_bytes(spark)
    start = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - start
    after = shuffle_bytes(spark)
    delta = (after - before) if (before is not None and after is not None) else None
    return {"wall_sec": round(wall, 3), "shuffle_bytes": delta}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/capacity_x100")
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    spark = _bench_session()
    docs = spark.read.parquet(f"{args.dir}/documents.parquet")

    builders = {
        "text_tfidf_topk": {
            "broadcast": lambda: ranking.tfidf_top_terms(docs),
            "fallback": lambda: ranking.tfidf_top_terms(docs, broadcast_df_max_terms=0),
        },
        "dedup_setsim_exact": {
            "broadcast": lambda: dedup.setsim_prefix_pairs(docs),
            "fallback": lambda: dedup.setsim_prefix_pairs(docs, broadcast_df_max_shingles=0),
        },
    }

    for name, arms in builders.items():
        results: dict[str, list[dict]] = {"broadcast": [], "fallback": []}
        for _ in range(args.n):
            for arm in ("broadcast", "fallback"):  # interleaved A/B
                if arm == "fallback":
                    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
                    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
                try:
                    results[arm].append(_run(spark, arms[arm]()))
                finally:
                    if arm == "fallback":
                        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
                spark.catalog.clearCache()
        report = {"operator": name, "dir": args.dir, "n": args.n}
        for arm, rs in results.items():
            shuffles = [r["shuffle_bytes"] for r in rs if r["shuffle_bytes"] is not None]
            report[arm] = {
                "wall_median": round(statistics.median(r["wall_sec"] for r in rs), 3),
                "wall_all": [r["wall_sec"] for r in rs],
                # None when the UI REST endpoint was unavailable — don't
                # throw away the wall-time arms over a missing metric
                "shuffle_bytes_median": statistics.median(shuffles) if shuffles else None,
            }
        report["wall_ratio_fallback_over_broadcast"] = round(
            report["fallback"]["wall_median"] / report["broadcast"]["wall_median"], 3
        )
        print(json.dumps(report))

    spark.stop()


if __name__ == "__main__":
    main()
