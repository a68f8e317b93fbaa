"""End-to-end lifecycle queries: the engine's OWN copy machinery under the
driver's oracle gate.

Every other registry query exercises the delegated-SQL surface; these
drive the reference's actual pipelines — the JDBC writer/reader pair
(``MonetDBUtil.java:205-295`` type lattice, ``CopyTool.java:829-866`` load
path), the streaming SCD-1 sync with versioned publish + retention
(``CopyTool.java:121-160,202-299,554-602``), and the watermark-triggered
incremental CopyEngine loop (``CopyTool.java:332-477``) — and hash the
OUTPUT of the pipeline against a plain-SQL oracle over the original
parquet. A green row means the machinery is value-preserving end-to-end,
not just unit-tested.

The builders stage state under ``tempfile.mkdtemp`` (fresh per invocation,
so repeated driver runs never collide); the returned DataFrame lazily reads
the staged output, so the directories are left for the OS tmp reaper rather
than deleted here.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..config.spec import CopyJob, JobSpec, SourceSpec
from ..engine.publish import VersionedCatalog
from ..sources.jdbc import jdbc_reader, jdbc_writer, partition_bounds_options
from ..streaming.pipelines import events_stream, upsert_stream_available_now
from .registry import query

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

#: deterministic subset: every 50th order's line items — big enough to cover
#: the value space, small enough that the JDBC insert path stays O(seconds).
RT_FILTER_MOD = 50


@query(
    "jdbc_roundtrip_lineitem",
    oracle=f"""
        SELECT l_orderkey, l_linenumber, l_quantity,
               CAST(CAST(l_extendedprice AS DECIMAL(18,6)) AS DOUBLE)
                   AS l_extendedprice,
               l_returnflag, l_linestatus,
               l_shipdate, CAST(l_shipdate AS DATE) AS l_shipdate_day
        FROM lineitem
        WHERE l_orderkey % {RT_FILTER_MOD} = 0
        ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
    """,
)
def jdbc_roundtrip_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC round-trip under the oracle gate: a lineitem subset is written
    to an embedded-Derby table through the engine's JDBC writer (batched
    inserts, ``sources/jdbc.py:jdbc_write_options``) and read back through
    the partitioned JDBC reader (4 concurrent range queries on
    ``l_orderkey`` — the cluster-scale ingest shape), then hashed against
    the parquet-direct oracle. Pins the JDBC type lattice the reference
    maps in ``MonetDBUtil.java:205-295``: BIGINT, INTEGER, DOUBLE,
    DECIMAL(18,6) (returned as DOUBLE — exact 6-decimal rationals
    round-trip bit-identically), VARCHAR/CLOB, TIMESTAMP, and DATE.

    Scale note: the roundtrip subset is intentionally small (a gate query,
    not a bench query) — the SAME writer/reader options run partitioned on
    a real cluster (``tests/test_jdbc_integration.py`` covers the bounds
    math; the reference's single forward cursor becomes N range scans).
    The embedded-Derby FIXTURE is driver-JVM-only (Derby forbids a second
    JVM booting the same db directory), so multi-executor probe sweeps
    skip this query (``scripts/cluster_mode_probe.py``); a real deployment
    points the same options at a server URL reachable from every executor.
    """
    t = Tables(spark, sf_dir)
    subset = (
        t.lineitem.filter(F.col("l_orderkey") % RT_FILTER_MOD == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.col("l_extendedprice").cast("decimal(18,6)").alias("l_extendedprice"),
            "l_returnflag",
            "l_linestatus",
            F.col("l_shipdate").cast("timestamp").alias("l_shipdate"),
            F.col("l_shipdate").cast("date").alias("l_shipdate_day"),
        )
    )
    db_path = os.path.join(tempfile.mkdtemp(prefix="jdbc_rt_"), "db")
    source = SourceSpec(
        name="derby_rt",
        format="jdbc",
        options={"url": f"jdbc:derby:{db_path};create=true", "driver": DERBY_DRIVER},
    )
    jdbc_writer(subset.coalesce(1), source, "lineitem_rt", mode="overwrite", locked_mode=False)

    # Bounds from a source-side MIN/MAX pushdown probe (the same probe shape
    # as the watermark trigger) rather than hard-coded constants: a fixed
    # upperBound skews every overflow row into the last range partition at
    # large sf and leaves partitions empty at tiny sf.
    lo, hi = (
        jdbc_reader(
            spark,
            source,
            CopyJob(
                job_id="lineitem_rt_bounds",
                source="derby_rt",
                # Spark's JDBC writer creates dialect-QUOTED (case-exact)
                # column identifiers; hand-written pushdown SQL must quote
                # them too or Derby case-normalizes to L_ORDERKEY
                from_query=(
                    'SELECT MIN("l_orderkey") AS lo, MAX("l_orderkey") AS hi'
                    " FROM lineitem_rt"
                ),
            ),
        ).first()[:2]
    )
    part_source = SourceSpec(
        name="derby_rt_part",
        format="jdbc",
        options={
            **source.options,
            # Spark requires lower < upper for a multi-partition range scan
            **partition_bounds_options(
                "l_orderkey", int(lo), max(int(hi), int(lo) + 1), num_partitions=4
            ),
        },
    )
    job = CopyJob(job_id="lineitem_rt", source="derby_rt_part", from_table="lineitem_rt")
    back = jdbc_reader(spark, part_source, job)
    return back.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
        "l_shipdate_day",
    ).orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "stream_lifecycle_publish",
    oracle="""
        SELECT event_id, ts, user_id, event_type, value, props FROM (
            SELECT event_id, ts, user_id, event_type, value, props,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1 ORDER BY user_id
    """,
)
def stream_lifecycle_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full streaming lifecycle under the oracle gate: the events fixture
    is staged as three incremental files (disjoint ``user_id % 3`` shards,
    so the SCD-1 merge result is independent of micro-batch arrival
    order), drained through ``upsert_stream_available_now`` with
    ``maxFilesPerTrigger=1`` (three micro-batches, three versioned
    publishes — the reference's scheduled incremental copy,
    ``CopyTool.java:121-160,202-299``), retention-cleaned to the keep-2
    policy (``CopyTool.java:554-602``), and the PUBLISHED view's content
    is hashed against the batch-equivalent oracle (latest event per user).

    This driver-pins the whole control plane in one row: the
    lineage-aware committed-batch guard, monotonic seq version naming,
    atomic manifest publish, newest-version discovery, and retention —
    if any of them drops/duplicates/reorders data, the hash breaks.
    """
    t = Tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="stream_lifecycle_")
    src = os.path.join(base, "in")
    for shard in range(3):
        t.events.filter(F.col("user_id") % 3 == shard).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    catalog = VersionedCatalog(os.path.join(base, "wh"))
    upsert_stream_available_now(
        events_stream(spark, src, max_files_per_trigger=1),
        catalog,
        "main",
        "user_state",
        os.path.join(base, "ckpt"),
    )
    catalog.cleanup("main", "user_state")
    published = catalog.table_at(spark, "main", "user_state")
    return published.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).orderBy("user_id")


@query(
    "copy_incremental_watermark",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders ORDER BY o_orderkey
    """,
)
def copy_incremental_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core scheduled loop under the oracle gate: a
    watermark-triggered incremental copy (``CopyTool.java:121-160`` tick,
    ``332-477`` trigger decision, ``305-309`` state-after-success) driven
    end-to-end through ``CopyEngine``. The orders fixture is staged as a
    file source in two halves split on the trigger column; tick 1 full-
    loads the old half and persists the watermark, tick 2 extracts only
    the strictly-newer delta (filter pushed to the source scan) and
    publishes snapshot+delta as a new version, tick 3 must see no new
    data and exit 2 WITHOUT publishing (``CopyTool.java:95-98``) — a
    RuntimeError (gate ERROR) otherwise. The published view's content is
    hashed against the plain full-table oracle: any row the trigger
    logic dropped, duplicated, or re-copied breaks the hash.
    """
    from ..engine.copy import CopyEngine

    t = Tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="copy_incr_")
    src_dir = os.path.join(base, "src")
    orders_dir = os.path.join(src_dir, "orders.parquet")
    os.makedirs(src_dir, exist_ok=True)
    # split at the key-range midpoint: both halves are non-empty for ANY
    # corpus with >= 2 distinct keys (max//2 left the first half empty on
    # key ranges clustered above half of max — caught by the edge corpus)
    lo, hi = t.orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    mid = (lo + hi) // 2

    spec = JobSpec(
        sources={"src": SourceSpec(name="src", format="parquet", path=src_dir)},
        jobs={
            "orders_sync": CopyJob(
                job_id="orders_sync",
                source="src",
                from_table="orders",
                to_table="orders_sync",
                trigger_column="o_orderkey",
                incremental=True,
                auto_trim=False,
            )
        },
        warehouse_dir=os.path.join(base, "wh"),
        state_dir=os.path.join(base, "state"),
    )
    engine = CopyEngine(spark, spec)

    # Explicit distinct load dates: the default wall-clock date has
    # 1-second granularity, so two sub-second ticks can collide on the
    # SAME version name — tick 2 would then overwrite the directory its
    # own snapshot is lazily reading (an intermittent FAILED_READ_FILE).
    from datetime import datetime

    t.orders.filter(F.col("o_orderkey") <= mid).coalesce(1).write.mode(
        "overwrite"
    ).parquet(orders_dir)
    engine.do_copy(load_date=datetime(2024, 1, 1))

    t.orders.filter(F.col("o_orderkey") > mid).coalesce(1).write.mode(
        "append"
    ).parquet(orders_dir)
    engine.do_copy(load_date=datetime(2024, 1, 2))

    code = engine.run()
    if code != 2:
        raise RuntimeError(
            f"third tick with unchanged source must exit 2 (no new data), got {code}"
        )
    published = engine.catalog.table_at(spark, "default", "orders_sync")
    return published.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ).orderBy("o_orderkey")
