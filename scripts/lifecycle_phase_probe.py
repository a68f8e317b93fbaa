"""Phase-level timing for the lifecycle bench queries (guide §1: find where
the time actually goes before touching anything).

Times each internal phase of stream_lifecycle_publish and
copy_incremental_watermark separately, min-of-N, so the optimization
targets the real cost center (staging writes vs stream drain vs engine
ticks vs final read) instead of the aggregate number.

Usage: lifecycle_phase_probe.py [-n N] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from mssql2monetdb_spark.catalog import Tables  # noqa: E402
from mssql2monetdb_spark.engine import caches  # noqa: E402
from mssql2monetdb_spark.engine.publish import VersionedCatalog  # noqa: E402
from mssql2monetdb_spark.session import get_spark  # noqa: E402
from mssql2monetdb_spark.streaming.pipelines import (  # noqa: E402
    events_stream,
    upsert_stream_available_now,
)


def main() -> int:
    args = sys.argv[1:]
    n = 3
    if "-n" in args:
        n = int(args[args.index("-n") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lifecycle-phase-probe")

    phases: dict[str, list[float]] = {}

    def clock(label: str, fn):
        t0 = time.perf_counter()
        out = fn()
        phases.setdefault(label, []).append(time.perf_counter() - t0)
        return out

    for _ in range(n):
        t = Tables(spark, sf_dir)
        base = tempfile.mkdtemp(prefix="phase_probe_")
        src = os.path.join(base, "in")

        def stage():
            for shard in range(3):
                t.events.filter(F.col("user_id") % 3 == shard).coalesce(1).write.mode(
                    "append"
                ).parquet(src)

        clock("stream: stage 3 shards", stage)
        catalog = VersionedCatalog(os.path.join(base, "wh"))

        def drain():
            upsert_stream_available_now(
                events_stream(spark, src, max_files_per_trigger=1),
                catalog,
                "main",
                "user_state",
                os.path.join(base, "ckpt"),
            )

        clock("stream: drain 3 batches", drain)
        clock("stream: cleanup", lambda: catalog.cleanup("main", "user_state"))

        def read_back():
            published = catalog.table_at(spark, "main", "user_state")
            published.select(
                "event_id", "ts", "user_id", "event_type", "value", "props"
            ).orderBy("user_id").write.mode("overwrite").format("noop").save()

        clock("stream: final read+sort", read_back)
        caches.release()
        spark.catalog.clearCache()

    for label, ts in phases.items():
        print(f"{label}: min={min(ts):.3f} med={sorted(ts)[len(ts)//2]:.3f} max={max(ts):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
