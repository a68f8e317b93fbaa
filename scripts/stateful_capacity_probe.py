"""applyInPandasWithState capacity probe (one-off, not part of the per-round
gate): how does a ``user_activity_tracker`` drain scale with the ACTIVE key
set and with micro-batch count, and does idle-state eviction actually bound
the store?

The state-store cost model to verify (streaming/stateful.py): per-batch cost
is (Arrow transfer of the batch's rows) + (state read/update for each key
PRESENT in the batch) + (store maintenance proportional to the TOTAL key
count held). Expected measurements:

- key sweep at fixed batches/rows: wall grows sub-linearly in the number of
  distinct keys until state dominates (each key is one tiny pandas group —
  the per-group Python dispatch is the fixture-regime cost);
- batch sweep at fixed keys: ~linear in B with a per-batch floor (micro-batch
  scheduling + store commit), the same ~0.6 s/batch floor the SCD-1 probe
  isolated;
- eviction: with ProcessingTimeTimeout, keys idle past the timeout are
  REMOVED — state size tracks the active set, not the all-time set. The
  probe verifies removal semantics directly through the store metrics
  (loaded state rows after a drain with eviction <= without).

At 100 TB the per-key state is the knob: the tracker's state is O(1) per
key (3 scalars), so the store holds |active keys| x O(1) regardless of
stream length — the probe's eviction check is what makes "active" true.

Usage: python scripts/stateful_capacity_probe.py
Prints one JSON line per measurement and a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from mssql2monetdb_spark.session import get_spark  # noqa: E402
from mssql2monetdb_spark.streaming.pipelines import events_stream  # noqa: E402
from mssql2monetdb_spark.streaming.stateful import user_activity_tracker  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def synth_events(spark, n_rows: int, n_keys: int):
    return (
        spark.range(n_rows)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("id") % 86400).alias("ts"),
            (F.col("id") % n_keys).alias("user_id"),
            F.lit("view").alias("event_type"),
            (F.col("id") % 97).cast("double").alias("value"),
            F.lit("{}").alias("props"),
        )
    )


def drain(spark, n_rows: int, n_keys: int, n_batches: int) -> float:
    base = tempfile.mkdtemp(prefix="stateful_cap_")
    try:
        src = os.path.join(base, "in")
        ev = synth_events(spark, n_rows, n_keys)
        for shard in range(n_batches):
            ev.filter(F.col("event_id") % n_batches == shard).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        out = os.path.join(base, "out")

        def sink(bdf, bid):
            bdf.write.mode("append").parquet(out)

        t0 = time.monotonic()
        q = (
            user_activity_tracker(events_stream(spark, src, max_files_per_trigger=1))
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.monotonic() - t0
        n_out = spark.read.parquet(out).count()
        assert n_out >= n_keys, (n_out, n_keys)
        return wall
    finally:
        shutil.rmtree(base, ignore_errors=True)


def eviction_state_rows(spark, *, evict: bool) -> int:
    """Two initial batches populate 100 keys; after an idle gap past the
    (probe-tuned 3 s) timeout, a third file touching ONE key arrives.
    Returns the store's numRowsTotal after that batch: without eviction
    the store still holds all 100 keys; with eviction the idle 99 are
    REMOVED and state tracks the active set."""
    base = tempfile.mkdtemp(prefix="stateful_evict_")
    try:
        src = os.path.join(base, "in")
        ev = synth_events(spark, 2000, 100)
        ev.filter(F.col("user_id") < 50).coalesce(1).write.mode("append").parquet(src)
        ev.filter(F.col("user_id") >= 50).coalesce(1).write.mode("append").parquet(src)
        out = os.path.join(base, "out")

        def sink(bdf, bid):
            bdf.write.mode("append").parquet(out)

        q = (
            user_activity_tracker(
                events_stream(spark, src),
                evict_idle=evict,
                idle_timeout_ms=3000,
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(processingTime="1 second")
            .start()
        )

        # continuous trigger (availableNow's end-of-drain cleanup batch is
        # incompatible with ProcessingTimeTimeout — stateful.py docstring)
        def rows_now() -> int:
            lp = q.lastProgress
            if lp and lp.get("stateOperators"):
                return lp["stateOperators"][0].get("numRowsTotal", -1)
            return -1

        deadline = time.monotonic() + 60
        while time.monotonic() < deadline and rows_now() < 100:
            time.sleep(1)
        time.sleep(5)  # idle past the 3 s timeout
        # third file: refresh one key; the batch that processes it also
        # fires the idle keys' timeouts (when eviction is configured)
        synth_events(spark, 10, 1).coalesce(1).write.mode("append").parquet(src)
        time.sleep(8)
        rows = rows_now()
        q.stop()
        return rows
    finally:
        shutil.rmtree(base, ignore_errors=True)


def eviction_state_rows_event_time(spark) -> int:
    """EventTimeTimeout variant: 100 keys whose last events all sit inside
    day 0; a later single-key file at day +4 advances the watermark past
    every idle deadline (last_ts + 1h). The drain's final batch must fire
    all those timers — the store ends holding ~1 active key. Unlike the
    processing-time probe this needs no sleeps: eviction is a function of
    the DATA, which is also why it is the replay-deterministic mode."""
    base = tempfile.mkdtemp(prefix="stateful_evict_et_")
    try:
        src = os.path.join(base, "in")
        ev = synth_events(spark, 2000, 100)
        ev.filter(F.col("user_id") < 50).coalesce(1).write.mode("append").parquet(src)
        ev.filter(F.col("user_id") >= 50).coalesce(1).write.mode("append").parquet(src)
        late = synth_events(spark, 1, 1).withColumn(
            "ts", F.timestamp_seconds(F.lit(1704067200 + 4 * 86400))
        )
        late.coalesce(1).write.mode("append").parquet(src)
        out = os.path.join(base, "out")

        def sink(bdf, bid):
            bdf.write.mode("append").parquet(out)

        q = (
            user_activity_tracker(
                events_stream(spark, src, max_files_per_trigger=1),
                evict_idle=True,
                idle_timeout_ms=3600_000,
                timeout_mode="event",
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        lp = q.lastProgress
        if lp and lp.get("stateOperators"):
            return lp["stateOperators"][0].get("numRowsTotal", -1)
        return -1
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> int:
    spark = get_spark("stateful-capacity-probe")
    spark.sparkContext.setLogLevel("ERROR")
    drain(spark, 1000, 10, 2)  # warmup (JVM + python worker spawn)

    results = []
    for n_rows, n_keys, n_batches, label in [
        (10_000, 100, 4, "key sweep"),
        (10_000, 1_000, 4, "key sweep"),
        (10_000, 10_000, 4, "key sweep"),
        (10_000, 1_000, 2, "batch sweep"),
        (10_000, 1_000, 8, "batch sweep"),
        (10_000, 1_000, 16, "batch sweep"),
    ]:
        wall = drain(spark, n_rows, n_keys, n_batches)
        rec = {
            "probe": label,
            "rows": n_rows,
            "keys": n_keys,
            "batches": n_batches,
            "wall_s": round(wall, 2),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    no_evict = eviction_state_rows(spark, evict=False)
    with_evict = eviction_state_rows(spark, evict=True)
    event_time = eviction_state_rows_event_time(spark)
    print(
        json.dumps(
            {
                "probe": "eviction",
                "state_rows_no_evict": no_evict,
                "state_rows_with_evict": with_evict,
                "state_rows_event_time_evict": event_time,
            }
        ),
        flush=True,
    )
    ok = all(r["wall_s"] > 0 for r in results)
    print("RESULT:", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
