"""Carry-mode cost probe (one-off, not part of the per-round gate): for the
partition-pruned streaming sync, measure what each ``carry_mode`` actually
costs per delta batch — bytes physically written (new inodes), bytes of
carry I/O (duplicated untouched-partition bytes), and the live on-disk
footprint after keep-2 retention.

Expected shape (the reason the ladder exists):

- ``link``:     carry I/O 0 (new inodes only in touched buckets); footprint
                deduplicated across versions by the shared inodes.
- ``copy``:     carry I/O = untouched bytes per batch (every version owns a
                full copy) — the portable-but-expensive mode.
- ``manifest``: carry I/O 0 AND no per-version directory fan-out; footprint
                = one table + touched-bucket deltas; works on stores with
                no link primitive (the object-store mode).

Usage: python scripts/carry_mode_probe.py
Prints one JSON line per (mode, batch) and a summary per mode.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mssql2monetdb_spark.engine.publish import VersionedCatalog  # noqa: E402
from mssql2monetdb_spark.session import get_spark  # noqa: E402
from mssql2monetdb_spark.streaming.pipelines import (  # noqa: E402
    events_stream,
    upsert_stream_available_now,
)

N_KEYS = 200_000
BUCKETS = 16
DELTAS = 3


def synth(spark, n, *, key_offset=0, ts_base=1704067200):
    return spark.range(n).select(
        (F.col("id") + ts_base).alias("event_id"),
        F.timestamp_seconds(F.lit(ts_base) + F.col("id") % 86400).alias("ts"),
        ((F.col("id") + key_offset) % N_KEYS).alias("user_id"),
        F.lit("view").alias("event_type"),
        (F.col("id") % 97).cast("double").alias("value"),
        F.lit("{}").alias("props"),
    )


def walk_files(root):
    for r, _dirs, files in os.walk(root):
        for f in files:
            if not f.startswith(("_", ".")):
                yield os.path.join(r, f)


def disk_stats(wh_dir, seen_inodes):
    """(unique_bytes_on_disk, new_bytes_since_last_call)."""
    unique = {}
    new = 0
    for p in walk_files(wh_dir):
        st = os.stat(p)
        unique[st.st_ino] = st.st_size
        if st.st_ino not in seen_inodes:
            new += st.st_size
            seen_inodes.add(st.st_ino)
    return sum(unique.values()), new


def run_mode(spark, mode):
    base = tempfile.mkdtemp(prefix=f"carry_{mode}_")
    try:
        src = os.path.join(base, "in")
        wh = os.path.join(base, "wh")
        catalog = VersionedCatalog(wh)
        seen: set[int] = set()

        def drain():
            upsert_stream_available_now(
                events_stream(spark, src, max_files_per_trigger=1),
                catalog,
                "main",
                "state",
                os.path.join(base, "ckpt"),
                partition_buckets=BUCKETS,
                carry_mode=mode,
            )

        synth(spark, N_KEYS).coalesce(4).write.mode("append").parquet(src)
        drain()
        catalog.cleanup("main", "state")
        table_bytes, _ = disk_stats(wh, seen)
        out = {"mode": mode, "table_bytes": table_bytes, "batches": []}

        for i in range(DELTAS):
            synth(spark, 3, key_offset=i * 7919).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            drain()
            catalog.cleanup("main", "state")
            unique, new = disk_stats(wh, seen)
            rec = {
                "mode": mode,
                "delta": i,
                "bytes_written": new,
                "unique_bytes_on_disk": unique,
            }
            out["batches"].append(rec)
            print(json.dumps(rec), flush=True)

        n = catalog.table_at(spark, "main", "state").count()
        assert n == N_KEYS, (mode, n)
        print(json.dumps({"mode": mode, "summary": True, **{
            "table_bytes": out["table_bytes"],
            "avg_delta_bytes_written": round(
                sum(b["bytes_written"] for b in out["batches"]) / DELTAS
            ),
            "final_unique_bytes": out["batches"][-1]["unique_bytes_on_disk"],
        }}), flush=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> int:
    spark = get_spark("carry-mode-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for mode in ("link", "copy", "manifest"):
        run_mode(spark, mode)
    print("RESULT: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
