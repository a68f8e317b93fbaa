"""Streaming SCD-1 sync capacity probe (one-off, not part of the per-round
gate): how does a full ``upsert_stream_available_now`` drain scale with
corpus size and with micro-batch count?

The control-plane cost model to verify: each micro-batch merges the batch
against the PUBLISHED table (operators/upsert.py broadcasts the batch-side
keys; the table side scans without shuffling) and rewrites a full new
version — so a drain of B batches over a corpus of N rows is O(B * N) write
volume plus O(1) publish/manifest work per batch. Expected measurements:

- corpus sweep at fixed B: wall time ~linear in N (exponent ~1 per decade);
- batch sweep at fixed N: wall time ~linear in B, slope = per-batch rewrite
  cost; the intercept-ish per-batch floor is the scheduler/publish overhead.

At 100 TB the O(B*N) rewrite is the knob that matters: batch frequency and
table size trade off directly, which is why the operator pairs with
retention (bounded version count) and compaction, and why a true
hypertable-scale deployment would partition the published table so each
merge rewrites only touched partitions.

Usage: python scripts/stream_capacity_probe.py
Prints one JSON line per measurement and a summary line.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from mssql2monetdb_spark.catalog import load_table  # noqa: E402
from mssql2monetdb_spark.engine.publish import VersionedCatalog  # noqa: E402
from mssql2monetdb_spark.session import get_spark  # noqa: E402
from mssql2monetdb_spark.streaming.pipelines import (  # noqa: E402
    events_stream,
    upsert_stream_available_now,
)

from pyspark.sql import functions as F  # noqa: E402


def _unique_bytes(wh_dir: str) -> int:
    """Actual write volume of a warehouse dir: hard-linked files (the
    incremental writer's carried partitions) share an inode and count once."""
    seen: set[int] = set()
    total = 0
    for root, _dirs, files in os.walk(wh_dir):
        for f in files:
            st = os.stat(os.path.join(root, f))
            if st.st_ino in seen:
                continue
            seen.add(st.st_ino)
            total += st.st_size
    return total


def drain(
    spark, sf_dir: str, n_batches: int, *, buckets: int | None = None
) -> tuple[float, int, int]:
    base = tempfile.mkdtemp(prefix="stream_cap_")
    try:
        src = os.path.join(base, "in")
        ev = load_table(spark, sf_dir, "events")
        n_rows = ev.count()
        for shard in range(n_batches):
            ev.filter(F.col("user_id") % n_batches == shard).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        catalog = VersionedCatalog(os.path.join(base, "wh"))
        t0 = time.monotonic()
        upsert_stream_available_now(
            events_stream(spark, src, max_files_per_trigger=1),
            catalog,
            "main",
            "user_state",
            os.path.join(base, "ckpt"),
            partition_buckets=buckets,
        )
        wall = time.monotonic() - t0
        return wall, n_rows, _unique_bytes(os.path.join(base, "wh"))
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> int:
    spark = get_spark("stream-capacity-probe")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    # corpus sweep at fixed batch count
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        wall, n_rows, _ = drain(spark, f"/root/testdata/{sf}", n_batches=4)
        results[sf] = (wall, n_rows)
        print(json.dumps({"probe": "corpus", "sf": sf, "rows": n_rows, "batches": 4, "wall_sec": round(wall, 2)}))

    # batch-count sweep at fixed corpus
    batch_walls = {}
    for b in (4, 16):
        wall, n_rows, _ = drain(spark, "/root/testdata/sf0.01", n_batches=b)
        batch_walls[b] = wall
        print(json.dumps({"probe": "batches", "sf": "sf0.01", "rows": n_rows, "batches": b, "wall_sec": round(wall, 2)}))

    # partitioned (bucket-pruned incremental rewrite) vs full rewrite: the
    # O(B x N) -> O(B x touched) write-volume claim, measured on the shape
    # it exists for — a LARGE keyed table receiving SMALL deltas (the
    # events fixture's 150-user state table is overhead-dominated and
    # would measure parquet footers, not the model). Unique bytes count
    # hard-linked carried partitions once (they ARE the savings).
    from pyspark.sql import functions as F  # noqa: F811

    def synth(lo_key: int, n: int):
        return spark.range(lo_key, lo_key + n).select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("id") % 86400).alias("ts"),
            F.col("id").alias("user_id"),
            F.lit("view").alias("event_type"),
            (F.col("id") % 97).cast("double").alias("value"),
            F.lit("{}").alias("props"),
        )

    # regime note: bucketing pays a parquet per-file floor (~16 KB) per
    # bucket, so the win needs table_bytes/buckets >> that floor — true by
    # construction at warehouse scale, arranged here with a 2M-row (~35 MB)
    # table and 16 buckets (~2 MB/bucket), deltas touching <= 3 buckets.
    for buckets in (None, 16):
        base = tempfile.mkdtemp(prefix="stream_cap_part_")
        try:
            src = os.path.join(base, "in")
            synth(0, 2_000_000).coalesce(1).write.mode("append").parquet(src)  # seed
            for d in range(4):  # four 3-key deltas
                synth(d * 1000, 3).coalesce(1).write.mode("append").parquet(src)
            catalog = VersionedCatalog(os.path.join(base, "wh"))
            t0 = time.monotonic()
            upsert_stream_available_now(
                events_stream(spark, src, max_files_per_trigger=1),
                catalog,
                "main",
                "user_state",
                os.path.join(base, "ckpt"),
                partition_buckets=buckets,
            )
            # retention as a real deployment runs it, then measure live bytes
            catalog.cleanup("main", "user_state")
            wall = time.monotonic() - t0
            wrote = _unique_bytes(os.path.join(base, "wh"))
            print(json.dumps({
                "probe": "partitioned_rewrite",
                "table_keys": 2_000_000,
                "delta_batches": 4,
                "delta_keys_per_batch": 3,
                "buckets": buckets,
                "wall_sec": round(wall, 2),
                "live_unique_bytes": wrote,
            }))
        finally:
            shutil.rmtree(base, ignore_errors=True)

    (w1, n1), (w2, n2), (w3, n3) = results["sf0.001"], results["sf0.01"], results["sf0.1"]
    exp12 = math.log(w2 / w1) / math.log(n2 / n1)
    exp23 = math.log(w3 / w2) / math.log(n3 / n2)
    per_batch = (batch_walls[16] - batch_walls[4]) / 12
    print(json.dumps({
        "summary": "stream_scd1_capacity",
        "corpus_exponent_sf001_to_sf01": round(exp12, 3),
        "corpus_exponent_sf01_to_sf1": round(exp23, 3),
        "per_batch_marginal_sec_sf0.01": round(per_batch, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
