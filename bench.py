"""Benchmark runner — the driver's per-round performance probe.

Runs the headline queries (registry entries flagged ``bench=True``) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "total_bench_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": ...}

Each query is forced with a noop-sink write (full distributed execution, no
driver collect) and timed wall-clock. A tiny warmup query first so JVM/codegen
startup isn't billed to the first headline query.

Per-query isolation (round-9 verdict item): every timed query starts from an
EMPTY Spark cache — ``caches.release()`` (this package's tracked
intermediates) plus ``spark.catalog.clearCache()`` run after the warmup pass
and after each timed query, so no query's number is flattered by a cached
relation another query built (SCALE.md's starred 0.51 finding). Each query
still pays for — and benefits from — only its OWN caches, which is what its
number means; the headline ``value`` definition is unchanged.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mssql2monetdb_spark.queries.registry import bench_queries  # noqa: E402
from mssql2monetdb_spark.session import get_spark  # noqa: E402
import mssql2monetdb_spark.queries  # noqa: E402,F401  (populate registry)

#: The 15 queries benched since round 1 — BASELINE.md's recorded totals are
#: sums over exactly this set, so the headline ``value`` stays a
#: like-for-like series even as the bench set widens (round 8 added the
#: three lifecycle pipelines + the heaviest dedup/ANN operators; their
#: timings appear in ``queries`` and in ``value_extended``).
BASELINE_SET = frozenset(
    {
        "agg_tpch_q1",
        "ann_bruteforce_topk",
        "asof_join_events",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "join_broadcast_dims",
        "join_inner",
        "rollup_time_buckets",
        "stream_tumbling_hourly",
        "text_stats",
        "tpch_q18_large_orders",
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier",
        "window_row_number",
    }
)

#: Fixed bar for the FULL bench set (round-9 verdict item 6): the recorded
#: round-9 ``value_extended`` — 22 queries, sf0.1, same host, per-query
#: cache isolation active (the honest-numbers regime). Regressions in the
#: lifecycle/§2C operators are judged against this pinned number instead of
#: only round-over-round; queries added to the bench set after r9 are
#: EXCLUDED from the comparable sum (``value_extended_r9set``) so the
#: series stays like-for-like, the same discipline as BASELINE_SET.
EXTENDED_BASELINE_SEC = 35.571  # BENCH_r09.json value_extended
EXTENDED_BASELINE_SET = frozenset(
    {
        "agg_tpch_q1",
        "ann_bruteforce_topk",
        "ann_ivfadc_topk",
        "asof_join_events",
        "dedup_connected_components",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "dedup_setsim_exact",
        "join_broadcast_dims",
        "join_inner",
        "rollup_time_buckets",
        "stream_lifecycle_partitioned",
        "stream_lifecycle_publish",
        "stream_tumbling_hourly",
        "jdbc_roundtrip_lineitem",
        "text_stats",
        "tpch_q18_large_orders",
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier",
        "window_row_number",
        "copy_incremental_watermark",
    }
)


#: Fixed bar for the FULL round-10 bench set (round-10 verdict item 3):
#: the driver-recorded BENCH_r10 ``value_extended`` — 24 queries, sf0.1,
#: per-query cache isolation. This pins the four round-10 bench additions
#: (events_gap_fill, graph_pagerank, ann_ivfadc_topk already in r9set,
#: etc.) the r9 bar couldn't see; bench queries added after r10
#: (copy_partitioned_publish onward) are excluded from the comparable sum
#: so the series stays like-for-like.
EXTENDED_R10_BASELINE_SEC = 41.757  # BENCH_r10.json value_extended
EXTENDED_R10_SET = frozenset(
    {
        "agg_tpch_q1",
        "ann_bruteforce_topk",
        "ann_ivfadc_topk",
        "asof_join_events",
        "copy_incremental_watermark",
        "dedup_connected_components",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "dedup_setsim_exact",
        "events_gap_fill",
        "graph_pagerank",
        "jdbc_roundtrip_lineitem",
        "join_broadcast_dims",
        "join_inner",
        "rollup_time_buckets",
        "stream_lifecycle_partitioned",
        "stream_lifecycle_publish",
        "stream_tumbling_hourly",
        "text_stats",
        "tpch_q18_large_orders",
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier",
        "window_row_number",
    }
)


def force(df) -> None:
    """Execute the full plan distributed; no rows cross to the driver."""
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("mssql2monetdb-bench")

    # warmup: run every headline query once at the smallest SF so JVM/codegen
    # compilation isn't billed to whichever query runs first — the timed pass
    # measures steady-state execution, which is what a long-lived cluster sees
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name, q in sorted(bench_queries().items()):
            force(q.build(spark, warm_dir))
    else:
        force(spark.read.parquet(os.path.join(sf_dir, "region.parquet")))

    from mssql2monetdb_spark.engine import caches

    def isolate() -> None:
        """Drop every Spark-level cached relation (tracked + untracked) so
        the next query's timing is order-insensitive."""
        caches.release()
        spark.catalog.clearCache()

    isolate()
    # $SPARK_GRAFT_BENCH_ORDER=reverse runs the set backwards — the
    # order-insensitivity probe (per-query numbers must not depend on what
    # ran before them; SCALE.md round-9 section records the A/B).
    ordered = sorted(bench_queries().items())
    if os.environ.get("SPARK_GRAFT_BENCH_ORDER") == "reverse":
        ordered.reverse()
    timings: dict[str, float] = {}
    for name, q in ordered:
        start = time.perf_counter()
        force(q.build(spark, sf_dir))
        timings[name] = round(time.perf_counter() - start, 3)
        isolate()

    total = round(sum(v for q, v in timings.items() if q in BASELINE_SET), 3)
    ext_r9set = round(
        sum(v for q, v in timings.items() if q in EXTENDED_BASELINE_SET), 3
    )
    ext_r10set = round(
        sum(v for q, v in timings.items() if q in EXTENDED_R10_SET), 3
    )
    print(
        json.dumps(
            {
                "metric": "total_bench_sec",
                "value": total,  # r01-baseline 15-query set (like-for-like)
                "value_extended": round(sum(timings.values()), 3),
                # like-for-like against the pinned r9 extended bar (22
                # queries; later bench additions excluded from this sum)
                "value_extended_r9set": ext_r9set,
                "extended_vs_r9_baseline": round(
                    ext_r9set / EXTENDED_BASELINE_SEC, 3
                ),
                # like-for-like against the pinned r10 FULL extended bar
                # (24 queries; post-r10 bench additions excluded)
                "value_extended_r10set": ext_r10set,
                "extended_vs_r10_baseline": round(
                    ext_r10set / EXTENDED_R10_BASELINE_SEC, 3
                ),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
