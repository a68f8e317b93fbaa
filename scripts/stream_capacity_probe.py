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


def drain(spark, sf_dir: str, n_batches: int) -> tuple[float, int]:
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
        )
        wall = time.monotonic() - t0
        return wall, n_rows
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> int:
    spark = get_spark("stream-capacity-probe")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    # corpus sweep at fixed batch count
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        wall, n_rows = drain(spark, f"/root/testdata/{sf}", n_batches=4)
        results[sf] = (wall, n_rows)
        print(json.dumps({"probe": "corpus", "sf": sf, "rows": n_rows, "batches": 4, "wall_sec": round(wall, 2)}))

    # batch-count sweep at fixed corpus
    batch_walls = {}
    for b in (4, 16):
        wall, n_rows = drain(spark, "/root/testdata/sf0.01", n_batches=b)
        batch_walls[b] = wall
        print(json.dumps({"probe": "batches", "sf": "sf0.01", "rows": n_rows, "batches": b, "wall_sec": round(wall, 2)}))

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
