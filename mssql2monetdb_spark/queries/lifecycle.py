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
from ..engine.publish import VersionedCatalog, version_of
from ..schema.mapper import jdbc_to_spark_type
from ..sources.jdbc import (
    derby_snapshot_jar,
    jdbc_bulk_loader,
    jdbc_reader,
    partition_bounds_options,
)
from ..streaming.pipelines import events_stream, upsert_stream_available_now
from .registry import query

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _stage_shards(df: DataFrame, shard_col: str, src: str) -> str:
    """Stage the three disjoint ``shard_col % 3`` slices (one parquet file
    each) CONCURRENTLY into per-shard subdirectories and return the glob
    the streaming source reads.

    The slices are independent single-task jobs, so submitting them from a
    small thread pool back-fills idle cores instead of serializing three
    full source scans (guide §2.6; measured 0.67 s -> 0.26 s at sf0.1 for
    the same three files). Per-shard directories keep the concurrent
    writers' ``_temporary`` staging trees disjoint — concurrent appends
    into ONE directory share a FileOutputCommitter staging dir and can
    clobber each other. Batch-arrival order over the glob may differ from
    the sequential append order; every consumer below is sharded on a
    disjoint key precisely so the drained result is arrival-order
    independent."""
    from concurrent.futures import ThreadPoolExecutor

    def one(shard: int) -> None:
        df.filter(F.col(shard_col) % 3 == shard).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"shard{shard}"))

    with ThreadPoolExecutor(max_workers=3) as pool:
        list(pool.map(one, range(3)))
    return os.path.join(src, "shard*")

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
    bench=True,
)
def jdbc_roundtrip_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC round-trip under the oracle gate: a lineitem subset is loaded
    into an embedded-Derby table through the engine's staged-CSV bulk
    loader — the reference's COPY INTO path (``CopyTool.java:1042-1071``;
    executors stage CSV, the driver issues per-file server-side imports,
    table DDL derived from the schema mapper) — and read back through the
    partitioned JDBC reader (4 concurrent range queries on ``l_orderkey``
    — the cluster-scale ingest shape), then hashed against the
    parquet-direct oracle. Pins the JDBC type lattice the reference maps
    in ``MonetDBUtil.java:205-295``: BIGINT, INTEGER, DOUBLE,
    DECIMAL(18,6) (returned as DOUBLE — exact 6-decimal rationals
    round-trip bit-identically), VARCHAR/CLOB, TIMESTAMP, and DATE.

    Scale note: the roundtrip subset is intentionally small (a gate query,
    not a bench query) — the SAME reader options run partitioned on a
    real cluster (``tests/test_jdbc_integration.py`` covers the bounds
    math; the reference's single forward cursor becomes N range scans).
    BOTH halves are multi-executor-real: the bulk load never opens a
    database connection on an executor (embedded Derby is single-JVM —
    the distributed batched-INSERT writer, :func:`jdbc_writer`, remains
    the production path for server URLs and is pytest-verified), and the
    READ-BACK goes through a read-only ``jar:``-subprotocol snapshot
    (:func:`derby_snapshot_jar`) — a URL every executor JVM boots
    concurrently, so the partitioned JDBC scan executes on real executor
    JVMs under ``scripts/cluster_mode_probe.py`` instead of being skipped.
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
    # boot/create the db driver-side, then bulk-load via staged CSV
    jdbc_bulk_loader(spark, subset.coalesce(1), source, "lineitem_rt")

    # Freeze the written db into a read-only jar snapshot: the read side of
    # the round-trip then runs against a URL that ANY executor JVM can open
    # (embedded Derby is single-JVM; the jar subprotocol is not).
    ro_source = SourceSpec(
        name="derby_rt_ro",
        format="jdbc",
        options={"url": derby_snapshot_jar(spark, db_path), "driver": DERBY_DRIVER},
    )

    # Bounds from a source-side MIN/MAX pushdown probe (the same probe shape
    # as the watermark trigger) rather than hard-coded constants: a fixed
    # upperBound skews every overflow row into the last range partition at
    # large sf and leaves partitions empty at tiny sf.
    lo, hi = (
        jdbc_reader(
            spark,
            ro_source,
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
    if lo is None or hi is None:
        # empty subset (hostile corpora): MIN/MAX are NULL, partition
        # bounds are undefined — a single-partition scan IS the plan
        part_source = ro_source
    else:
        part_source = SourceSpec(
            name="derby_rt_part",
            format="jdbc",
            options={
                **ro_source.options,
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
    bench=True,
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
    src = _stage_shards(t.events, "user_id", os.path.join(base, "in"))

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
    "jdbc_roundtrip_typelattice",
    oracle="""
        SELECT o_orderkey AS k_bigint,
               o_totalprice > 150000.0 AS c_boolean,
               CAST(o_custkey % 10000 AS INTEGER) AS c_smallint,
               CAST(o_custkey AS INTEGER) AS c_integer,
               CAST(o_custkey % 1000 AS DOUBLE) AS c_real,
               o_totalprice AS c_double,
               CAST(o_custkey AS BIGINT) AS c_dec0,
               CAST(o_custkey % 100 AS INTEGER) AS c_dec2,
               CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DOUBLE) AS c_dec186,
               o_orderpriority AS c_char,
               o_orderstatus AS c_varchar,
               repeat(o_orderpriority, 40) AS c_clob,
               to_base64(encode(o_orderpriority)) AS c_blob,
               printf('%02d:%02d:%02d', o_custkey % 24, o_custkey % 60,
                      o_orderkey % 60) AS c_time,
               o_orderdate AS c_timestamp,
               CAST(o_orderdate AS DATE) AS c_date
        FROM orders WHERE o_orderkey % 100 = 0
        ORDER BY k_bigint
    """,
)
def jdbc_roundtrip_typelattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL reference type lattice (``MonetDBUtil.java:205-295``) hashed
    through a real JDBC round-trip: an orders-derived frame is bulk-loaded
    (staged CSV + server-side import — the COPY INTO path,
    ``CopyTool.java:1042-1071``) into a hand-DDL'd Derby table covering
    BOOLEAN, SMALLINT, INTEGER, BIGINT, REAL, DOUBLE,
    DECIMAL(2,0)/DECIMAL(12,0)/DECIMAL(18,6), CHAR, VARCHAR, CLOB, BLOB,
    TIME, TIMESTAMP and DATE, then read back through the partitioned JDBC
    reader (via the multi-JVM-safe ``jar:`` snapshot) and compared against
    the parquet-direct oracle.

    Lattice decisions exercised on the read side (``schema/mapper.py``):

    - decimal narrowing (``MonetDBUtil.java:244-263``): DECIMAL(12,0) ->
      BIGINT, DECIMAL(2,0) -> TINYINT via :func:`jdbc_to_spark_type`; the
      byte/long casts run inside the hashed plan.
    - Derby has no TINYINT (the narrowing TARGET type): small integral
      values travel as SMALLINT on the wire, the narrowed Spark type is
      produced at ingest — same as the reference writing MonetDB TINYINT
      from a JDBC SMALLINT read.
    - TIME has no Spark type: staged from the engine's documented STRING
      rendering ('HH:mm:ss', parsed by the server-side import), read back
      as the JDBC driver's epoch-day timestamp and re-rendered with
      ``date_format`` — lossless both ways.
    - CHAR(n) pads on the wire: read side trims (the reference's autoTrim,
      ``CopyTable.java:72``).
    """
    t = Tables(spark, sf_dir)
    src = t.orders.filter(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("k_bigint"),
        (F.col("o_totalprice") > 150000.0).alias("c_boolean"),
        (F.col("o_custkey") % 10000).cast("short").alias("c_smallint"),
        F.col("o_custkey").cast("int").alias("c_integer"),
        (F.col("o_custkey") % 1000).cast("float").alias("c_real"),
        F.col("o_totalprice").alias("c_double"),
        F.col("o_custkey").cast("decimal(12,0)").alias("c_dec0"),
        (F.col("o_custkey") % 100).cast("decimal(2,0)").alias("c_dec2"),
        F.col("o_totalprice").cast("decimal(18,6)").alias("c_dec186"),
        F.col("o_orderpriority").alias("c_char"),
        F.col("o_orderstatus").alias("c_varchar"),
        F.repeat(F.col("o_orderpriority"), 40).alias("c_clob"),
        F.encode(F.col("o_orderpriority"), "utf-8").alias("c_blob"),
        F.format_string(
            "%02d:%02d:%02d",
            F.col("o_custkey") % 24,
            F.col("o_custkey") % 60,
            F.col("o_orderkey") % 60,
        ).alias("c_time"),
        F.col("o_orderdate").cast("timestamp").alias("c_timestamp"),
        F.col("o_orderdate").cast("date").alias("c_date"),
    )
    db_path = os.path.join(tempfile.mkdtemp(prefix="jdbc_lat_"), "db")
    # Explicit target-lattice DDL (the reference's createTableSql,
    # MonetDBUtil.java:162-190): Spark's own createTableColumnTypes can't
    # declare TIME (Spark 4 parses it as its native TimeType, which the
    # Derby dialect can't map), and the schema-derived default would pick
    # VARCHAR over CHAR/CLOB. Quoted lowercase identifiers match Spark's
    # dialect-quoted read-back schema.
    cols = (
        '"k_bigint" BIGINT, "c_boolean" BOOLEAN, "c_smallint" SMALLINT, '
        '"c_integer" INTEGER, "c_real" REAL, "c_double" DOUBLE, '
        '"c_dec0" DECIMAL(12,0), "c_dec2" DECIMAL(2,0), '
        '"c_dec186" DECIMAL(18,6), "c_char" CHAR(15), "c_varchar" VARCHAR(4), '
        '"c_clob" CLOB, "c_blob" BLOB, "c_time" TIME, '
        '"c_timestamp" TIMESTAMP, "c_date" DATE'
    )
    source = SourceSpec(
        name="derby_lat",
        format="jdbc",
        options={"url": f"jdbc:derby:{db_path};create=true", "driver": DERBY_DRIVER},
    )
    jdbc_bulk_loader(spark, src.coalesce(1), source, "lattice", table_ddl=cols)

    ro_source = SourceSpec(
        name="derby_lat_ro",
        format="jdbc",
        options={"url": derby_snapshot_jar(spark, db_path), "driver": DERBY_DRIVER},
    )
    lo, hi = (
        jdbc_reader(
            spark,
            ro_source,
            CopyJob(
                job_id="lattice_bounds",
                source="derby_lat_ro",
                from_query='SELECT MIN("k_bigint") AS lo, MAX("k_bigint") AS hi FROM lattice',
            ),
        ).first()[:2]
    )
    if lo is None or hi is None:
        # empty subset (hostile corpora): MIN/MAX are NULL, partition
        # bounds are undefined — a single-partition scan IS the plan
        part_source = ro_source
    else:
        part_source = SourceSpec(
            name="derby_lat_part",
            format="jdbc",
            options={
                **ro_source.options,
                **partition_bounds_options(
                    "k_bigint", int(lo), max(int(hi), int(lo) + 1), num_partitions=4
                ),
            },
        )
    back = jdbc_reader(
        spark,
        part_source,
        CopyJob(job_id="lattice_rt", source="derby_lat_part", from_table="lattice"),
    )
    return back.select(
        "k_bigint",
        "c_boolean",
        F.col("c_smallint").cast("int").alias("c_smallint"),
        F.col("c_integer").cast("int").alias("c_integer"),
        F.col("c_real").cast("double").alias("c_real"),
        "c_double",
        # the reference's decimal-narrowing rule, applied at ingest
        F.col("c_dec0").cast(jdbc_to_spark_type("DECIMAL", 12, 0)).alias("c_dec0"),
        F.col("c_dec2")
        .cast(jdbc_to_spark_type("DECIMAL", 2, 0))
        .cast("int")
        .alias("c_dec2"),
        F.col("c_dec186").cast("double").alias("c_dec186"),
        F.rtrim(F.col("c_char")).alias("c_char"),  # CHAR pad -> autoTrim
        "c_varchar",
        "c_clob",
        # binary cells aren't hashable by the driver's canonicalizer
        # (registry rule: stringify) — base64 keeps the BLOB round-trip
        # in the hashed plan while rendering it comparable
        F.base64(F.col("c_blob")).alias("c_blob"),
        F.date_format(F.col("c_time"), "HH:mm:ss").alias("c_time"),
        "c_timestamp",
        "c_date",
    ).orderBy("k_bigint")


@query(
    "stream_stateful_user_activity",
    oracle="""
        WITH q AS (
            SELECT user_id, ts,
                   LEAST(GREATEST(value * 1000, -1e9), 1e9) AS c
            FROM events
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               SUM(c - (c % 1)) AS sum_value,
               MAX(ts) AS last_ts
        FROM q GROUP BY user_id ORDER BY user_id
    """,
)
def stream_stateful_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom-stateful-operator rung (``streaming/stateful.py``,
    ``applyInPandasWithState``) under the driver's oracle gate: the events
    fixture is staged as three files sharded on ``event_id % 3`` (users SPAN
    micro-batches, so the per-user state genuinely accumulates across
    batches), drained through ``user_activity_tracker`` with
    ``maxFilesPerTrigger=1``, every update-mode emission is appended with
    its batch id, and the LAST emission per user — the cumulative total — is
    hashed against the batch groupBy oracle.

    Values are quantized to bounded integer-valued doubles before
    streaming — clamp to [-1e9, 1e9] then drop the fraction IN DOUBLE
    SPACE (``c - c % 1``; a bigint ``floor`` intermediate overflows on
    hostile 1e18-scale values, where Spark saturates at 2^63-1 but
    DuckDB's double floor doesn't): float addition over bounded integers
    is exact and order-insensitive, so the cross-batch Python-side
    accumulation hashes identically to the oracle's single SUM regardless
    of batch order — the same exactness discipline as the DEC(30,8)
    helper, expressed in the tracker's native double state.

    Reference analog: the polling scheduler's per-tick state carry
    (``CopyTool.java:121-160``) — here the state is per-KEY and
    checkpointed, the 100 TB-stream shape.
    """
    from ..streaming.stateful import user_activity_tracker

    t = Tables(spark, sf_dir)
    _c = F.least(F.greatest(F.col("value") * 1000, F.lit(-1.0e9)), F.lit(1.0e9))
    quantized = t.events.withColumn("value", (_c - (_c % F.lit(1.0))).cast("double"))
    base = tempfile.mkdtemp(prefix="stream_stateful_")
    # event_id shards are NOT user-disjoint, but the tracked per-user state
    # (count/sum/max) is commutative across batches, so the final batch's
    # row per user is arrival-order independent
    src = _stage_shards(quantized, "event_id", os.path.join(base, "in"))

    out_dir = os.path.join(base, "out")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(int(batch_id))).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        user_activity_tracker(events_stream(spark, src, max_files_per_trigger=1))
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("batch_id").desc())
    return (
        spark.read.parquet(out_dir)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_events", "sum_value", "last_ts")
        .orderBy("user_id")
    )


@query(
    "stream_lifecycle_partitioned",
    oracle="""
        SELECT event_id, ts, user_id, event_type, value, props FROM (
            SELECT event_id, ts, user_id, event_type, value, props,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1 ORDER BY user_id
    """,
    bench=True,
)
def stream_lifecycle_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partition-pruned streaming sync under the oracle gate: same
    drain as ``stream_lifecycle_publish`` (three user-disjoint shards,
    ``maxFilesPerTrigger=1``, retention to keep-2) but with
    ``partition_buckets=8`` — the published table is hive-partitioned on
    the key's hash bucket, each micro-batch merges only the buckets it
    touches, and untouched buckets carry into every new version by hard
    link (``VersionedCatalog.write_version_incremental``). The published
    view's content is hashed against the same batch oracle: if pruning
    reads the wrong buckets, the linker drops or duplicates a partition,
    or retention reaps a linked file, the hash breaks.

    This is the O(touched buckets)-per-batch publish shape a 100 TB
    published table needs under frequent ticks (SCALE.md round-8 section
    for the measured write-volume drop).
    """
    t = Tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="stream_lcp_")
    src = _stage_shards(t.events, "user_id", os.path.join(base, "in"))

    catalog = VersionedCatalog(os.path.join(base, "wh"))
    upsert_stream_available_now(
        events_stream(spark, src, max_files_per_trigger=1),
        catalog,
        "main",
        "user_state",
        os.path.join(base, "ckpt"),
        partition_buckets=8,
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
    bench=True,
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


@query(
    "copy_multi_table_guard",
    oracle="""
        SELECT c.c_custkey, c.c_name, c.c_mktsegment,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(COALESCE(o.o_totalprice, 0.0) AS DECIMAL(30,8)))
                    AS DOUBLE) AS sum_price
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey AND o.o_orderkey % 4 = 0
        GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
        ORDER BY c.c_custkey
    """,
)
def copy_multi_table_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's multi-table run gate under the oracle: ONE
    ``CopyEngine.do_copy`` carries N jobs, and an empty source with
    ``allow_empty=False`` aborts the WHOLE run before ANY table loads or
    publishes (``CopyTool.java:192-197,205-231`` — the all-or-nothing
    empty guard, ``SourceDatabaseUtil.java:22-52``).

    Tick 1 stages a real customer subset but an EMPTY orders relation:
    ``run()`` must exit 1 and leave BOTH targets unpublished (a partial
    publish — customers without their orders — is exactly the torn state
    the guard exists to prevent; a RuntimeError here is a gate ERROR).
    Tick 2 stages both subsets and the happy path publishes the pair;
    the returned frame joins the two PUBLISHED views (per-customer order
    counts + exact-decimal price sums) and is hashed against the
    parquet-direct oracle — value-preservation across a multi-job run,
    not just per-table.
    """
    from ..engine.copy import EXIT_ERROR, CopyEngine

    t = Tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="copy_multi_")
    src_dir = os.path.join(base, "src")
    os.makedirs(src_dir, exist_ok=True)
    # stage the FULL tables: any modulo subset can be empty on a hostile
    # corpus (edge-corpus catch), which would make the HAPPY-path tick
    # abort too; selection lives in the final join condition instead
    cust = t.customer
    ords = t.orders
    cust.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src_dir, "customer.parquet")
    )
    # tick 1: orders exists but is EMPTY (schema-only parquet)
    ords.filter(F.lit(False)).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src_dir, "orders.parquet")
    )

    spec = JobSpec(
        sources={"src": SourceSpec(name="src", format="parquet", path=src_dir)},
        jobs={
            "cust_sync": CopyJob(
                job_id="cust_sync",
                source="src",
                from_table="customer",
                to_table="cust_sync",
                auto_trim=False,
            ),
            "ord_sync": CopyJob(
                job_id="ord_sync",
                source="src",
                from_table="orders",
                to_table="ord_sync",
                auto_trim=False,
            ),
        },
        warehouse_dir=os.path.join(base, "wh"),
        state_dir=os.path.join(base, "state"),
    )
    engine = CopyEngine(spark, spec)
    code = engine.run()
    if code != EXIT_ERROR:
        raise RuntimeError(
            f"empty-source multi-table run must exit 1 (abort), got {code}"
        )
    for target in ("cust_sync", "ord_sync"):
        if engine.catalog.exists("default", target):
            raise RuntimeError(
                f"aborted run must publish NOTHING, but {target} exists "
                "(torn multi-table publish)"
            )

    # tick 2: both sources populated -> both load + publish atomically
    from datetime import datetime

    ords.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src_dir, "orders.parquet")
    )
    published = engine.do_copy(load_date=datetime(2024, 3, 1))
    if set(published) != {"cust_sync", "ord_sync"}:
        raise RuntimeError(f"expected both jobs published, got {sorted(published)}")

    from .helpers import DEC

    c = engine.catalog.table_at(spark, "default", "cust_sync")
    o = engine.catalog.table_at(spark, "default", "ord_sync")
    return (
        c.join(
            o,
            (o["o_custkey"] == c["c_custkey"]) & (o["o_orderkey"] % 4 == 0),
            "left",
        )
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)).cast(DEC))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("c_custkey")
    )


@query(
    "jdbc_warehouse_publish",
    oracle=f"""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % {RT_FILTER_MOD} = 0
        ORDER BY o_orderkey
    """,
)
def jdbc_warehouse_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's WAREHOUSE-side publish lifecycle under the oracle
    gate (``engine/export.py::JdbcWarehouse``): two versioned loads land in
    a real Derby warehouse through the staged-CSV bulk path, each publish
    transactionally swaps the public VIEW (``MonetDBUtil.java:442-529``),
    retention keeps current + backup (``CopyTool.java:554-602``), and the
    final VIEW's content — read back through the multi-JVM-safe ``jar:``
    snapshot with a partitioned scan — is hashed against the parquet
    oracle. A wrong view target, a reaped live version, or a lossy load
    breaks the hash; the in-query assertions turn protocol violations
    (view not following the newest publish, retention width) into gate
    ERRORs.
    """
    t = Tables(spark, sf_dir)
    subset = t.orders.filter(F.col("o_orderkey") % RT_FILTER_MOD == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority",
    )
    from datetime import datetime

    from ..engine.export import JdbcWarehouse

    db_path = os.path.join(tempfile.mkdtemp(prefix="jdbc_wh_"), "db")
    wh = JdbcWarehouse(
        spark,
        SourceSpec(
            name="derby_wh",
            format="jdbc",
            options={
                "url": f"jdbc:derby:{db_path};create=true",
                "driver": DERBY_DRIVER,
            },
        ),
    )
    # v1 = lower key half (range midpoint: non-empty for any corpus with
    # >= 2 distinct keys), v2 = the full subset; the view must follow v2
    lo_hi = subset.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    if lo_hi[0] is None:
        v1_frame = subset  # empty subset (hostile corpora): both loads empty
    else:
        mid = (lo_hi[0] + lo_hi[1]) // 2
        v1_frame = subset.filter(F.col("o_orderkey") <= mid)
    wh.export(v1_frame.coalesce(1), "orders_wh", datetime(2024, 6, 1))
    p2 = wh.export(subset.coalesce(1), "orders_wh", datetime(2024, 6, 2))

    cur = wh.current_version("orders_wh")
    if cur is None or cur.lower() != p2.lower():
        raise RuntimeError(f"view must follow the newest publish: {cur} != {p2}")
    n_versions = len(wh.table_versions("orders_wh"))
    if n_versions != 2:
        raise RuntimeError(f"retention must keep current + backup, found {n_versions}")

    ro = SourceSpec(
        name="derby_wh_ro",
        format="jdbc",
        options={"url": derby_snapshot_jar(spark, db_path), "driver": DERBY_DRIVER},
    )
    if lo_hi[0] is None:
        part_source = ro
    else:
        part_source = SourceSpec(
            name="derby_wh_part",
            format="jdbc",
            options={
                **ro.options,
                **partition_bounds_options(
                    "o_orderkey",
                    int(lo_hi[0]),
                    max(int(lo_hi[1]), int(lo_hi[0]) + 1),
                    num_partitions=4,
                ),
            },
        )
    back = jdbc_reader(
        spark,
        part_source,
        CopyJob(job_id="wh_rb", source="derby_wh_part", from_table="orders_wh"),
    )
    return back.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ).orderBy("o_orderkey")


@query(
    "jdbc_schema_publish",
    oracle=f"""
        WITH subset AS (
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders WHERE o_orderkey % {RT_FILTER_MOD} = 0
        ),
        mid AS (
            SELECT (MIN(o_orderkey) + MAX(o_orderkey)) // 2 AS m FROM subset
        )
        SELECT 'mart_a' AS mart, o_orderkey, o_custkey, o_totalprice
        FROM subset WHERE o_orderkey <= (SELECT m FROM mid)
        UNION ALL
        SELECT 'mart_b' AS mart, o_orderkey, o_custkey, o_totalprice
        FROM subset
        ORDER BY mart, o_orderkey
    """,
)
def jdbc_schema_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-qualified warehouse publish (round 10): the SAME public table
    name lands in TWO warehouse schemas with the SAME load_date — identical
    bare physical names, the exact collision that forced the pre-round-10
    spec rejection — and each schema's view must follow its own load.
    Parity target: the reference's two-schema topology
    (``MonetDBTable.java:12-25`` schema-carrying tables;
    ``MonetDBUtil.java:41-88`` schema-scoped catalog probes;
    ``MonetDBUtil.java:301-333`` schema-qualified identifiers). mart_a gets
    the lower key half (range midpoint), mart_b the full subset; the gate
    reads BOTH schemas back through the ``jar:`` snapshot and hashes the
    union against the parquet oracle. In-query assertions turn protocol
    violations (cross-schema probe bleed, a view bound to the other
    schema's physical, anything visible in the default namespace) into
    gate ERRORs.
    """
    from datetime import datetime

    from ..engine.export import JdbcWarehouse

    t = Tables(spark, sf_dir)
    subset = t.orders.filter(F.col("o_orderkey") % RT_FILTER_MOD == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lo_hi = subset.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    if lo_hi[0] is None:
        half = subset  # empty subset (hostile corpora): both loads empty
    else:
        half = subset.filter(F.col("o_orderkey") <= (int(lo_hi[0]) + int(lo_hi[1])) // 2)

    db_path = os.path.join(tempfile.mkdtemp(prefix="jdbc_sp_"), "db")
    wh = JdbcWarehouse(
        spark,
        SourceSpec(
            name="derby_wh",
            format="jdbc",
            options={
                "url": f"jdbc:derby:{db_path};create=true",
                "driver": DERBY_DRIVER,
            },
        ),
    )
    load_date = datetime(2024, 6, 1)  # SAME date: identical bare physical names
    pa = wh.export(half.coalesce(1), "orders_shared", load_date, schema="mart_a")
    pb = wh.export(subset.coalesce(1), "orders_shared", load_date, schema="mart_b")
    if pa.lower() != pb.lower():
        raise RuntimeError(f"expected colliding bare physical names, got {pa}/{pb}")
    for schema, expect in (("mart_a", pa), ("mart_b", pb)):
        cur = wh.current_version("orders_shared", schema=schema)
        if cur is None or cur.lower() != expect.lower():
            raise RuntimeError(f"{schema} view must follow its own load: {cur}")
        if len(wh.table_versions("orders_shared", schema=schema)) != 1:
            raise RuntimeError(f"{schema} must see exactly its own version")
    if wh.exists("orders_shared"):
        raise RuntimeError("default namespace must not see schema-qualified loads")

    ro = SourceSpec(
        name="derby_wh_ro",
        format="jdbc",
        options={"url": derby_snapshot_jar(spark, db_path), "driver": DERBY_DRIVER},
    )
    parts = []
    for schema in ("mart_a", "mart_b"):
        back = jdbc_reader(
            spark,
            ro,
            CopyJob(
                job_id=f"sp_rb_{schema}",
                source="derby_wh_ro",
                from_table=f"{schema}.orders_shared",
            ),
        )
        parts.append(back.select(F.lit(schema).alias("mart"), "o_orderkey", "o_custkey", "o_totalprice"))
    return parts[0].unionAll(parts[1]).orderBy("mart", "o_orderkey")


@query(
    "catalog_version_diff",
    oracle=f"""
        WITH subset AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % {RT_FILTER_MOD} = 0
        ),
        mid AS (
            SELECT (MIN(o_orderkey) + MAX(o_orderkey)) // 2 AS m FROM subset
        ),
        v1 AS (  -- first load: lower key half, prices as loaded
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
            FROM subset WHERE o_orderkey <= (SELECT m FROM mid)
        ),
        v2 AS (  -- second load: full subset, lower half re-priced (+1.0)
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   CASE WHEN o_orderkey <= (SELECT m FROM mid)
                            AND o_orderkey % 3 = 0
                        THEN o_totalprice + 1.0 ELSE o_totalprice END
                   AS o_totalprice
            FROM subset
        )
        SELECT COALESCE(v2.o_orderkey, v1.o_orderkey) AS o_orderkey,
               CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
                    WHEN v2.o_orderkey IS NULL THEN 'delete'
                    ELSE 'update' END AS change,
               v1.o_totalprice AS old_price,
               v2.o_totalprice AS new_price
        FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
        WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
           OR v1.o_custkey IS DISTINCT FROM v2.o_custkey
           OR v1.o_orderstatus IS DISTINCT FROM v2.o_orderstatus
           OR v1.o_totalprice IS DISTINCT FROM v2.o_totalprice
        ORDER BY o_orderkey
    """,
)
def catalog_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between two RETAINED versions of a published table
    — the audit every keep-2 deployment wants ('what did the last load
    change?'), computed entirely from the catalog's own time travel
    (``table_at``: current vs backup), no extra bookkeeping at load time.
    Two loads go through the real publish lifecycle (v1 = lower key half;
    v2 = full subset with every third lower-half row re-priced), then the
    versions are full-outer-joined on the key and classified
    insert/update/delete with null-safe column compares. One shuffle on
    the key; at 100 TB the diff is the same join the SCD-2 merge already
    pays, and retention guarantees both inputs exist."""
    from datetime import datetime

    t = Tables(spark, sf_dir)
    subset = t.orders.filter(F.col("o_orderkey") % RT_FILTER_MOD == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    lo_hi = subset.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    if lo_hi[0] is None:
        half = subset
        repriced = subset
    else:
        mid = (int(lo_hi[0]) + int(lo_hi[1])) // 2
        half = subset.filter(F.col("o_orderkey") <= mid)
        repriced = subset.withColumn(
            "o_totalprice",
            F.when(
                (F.col("o_orderkey") <= mid) & (F.col("o_orderkey") % 3 == 0),
                F.col("o_totalprice") + 1.0,
            ).otherwise(F.col("o_totalprice")),
        )

    wh_dir = tempfile.mkdtemp(prefix="vdiff_wh_")
    catalog = VersionedCatalog(wh_dir)
    p1 = catalog.write_version(half, "default", "orders_cdf", datetime(2024, 6, 1))
    catalog.publish(spark, "default", "orders_cdf", p1)
    p2 = catalog.write_version(repriced, "default", "orders_cdf", datetime(2024, 6, 2))
    catalog.publish(spark, "default", "orders_cdf", p2)
    catalog.cleanup("default", "orders_cdf")

    backup = catalog.manifest_info("default", "orders_cdf").get("previous")
    if backup is None:
        raise RuntimeError("keep-2 retention must leave a backup version")
    v1 = catalog.table_at(spark, "default", "orders_cdf", version_of(backup))
    v2 = catalog.table_at(spark, "default", "orders_cdf")

    a = v1.select(*[F.col(c).alias(f"a_{c}") for c in v1.columns])
    b = v2.select(*[F.col(c).alias(f"b_{c}") for c in v2.columns])
    joined = a.join(b, a["a_o_orderkey"] == b["b_o_orderkey"], "full_outer")
    changed = (
        a["a_o_orderkey"].isNull()
        | b["b_o_orderkey"].isNull()
        | ~a["a_o_custkey"].eqNullSafe(b["b_o_custkey"])
        | ~a["a_o_orderstatus"].eqNullSafe(b["b_o_orderstatus"])
        | ~a["a_o_totalprice"].eqNullSafe(b["b_o_totalprice"])
    )
    return (
        joined.filter(changed)
        .select(
            F.coalesce(b["b_o_orderkey"], a["a_o_orderkey"]).alias("o_orderkey"),
            F.when(a["a_o_orderkey"].isNull(), F.lit("insert"))
            .when(b["b_o_orderkey"].isNull(), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("change"),
            a["a_o_totalprice"].alias("old_price"),
            b["b_o_totalprice"].alias("new_price"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "stream_jdbc_warehouse_publish",
    oracle="""
        SELECT event_id, ts, user_id, event_type, value FROM (
            SELECT event_id, ts, user_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1 ORDER BY user_id
    """,
)
def stream_jdbc_warehouse_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FULL topology under the oracle gate: a real
    readStream (three micro-batches, disjoint ``user_id % 3`` shards so
    the SCD-1 result is arrival-order independent) drained through
    ``jdbc_warehouse_stream_sync`` into a real Derby WAREHOUSE — each
    batch merges latest-per-user over the previously published warehouse
    state (read back through a per-batch ``jar:`` snapshot; a server
    deployment reads the view directly), lands the merged state through
    the staged-CSV bulk loader, and transactionally swaps the view
    (``MonetDBUtil.java:442-529``) with keep-2 retention. The final
    published VIEW is read back through a partitioned ``jar:`` snapshot
    scan and hashed against the batch-equivalent oracle. One green row
    pins streaming trigger + bulk COPY + view switch + retention
    composing correctly — the exact pipeline a reference user runs, with
    the polling scheduler upgraded to Structured Streaming."""
    from datetime import datetime

    from ..engine.export import JdbcWarehouse
    from ..streaming.pipelines import jdbc_warehouse_stream_sync

    t = Tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="stream_jdbc_wh_")
    src = _stage_shards(t.events, "user_id", os.path.join(base, "in"))

    db_path = os.path.join(base, "whdb")
    wh = JdbcWarehouse(
        spark,
        SourceSpec(
            name="derby_wh",
            format="jdbc",
            options={
                "url": f"jdbc:derby:{db_path};create=true",
                "driver": DERBY_DRIVER,
            },
        ),
    )
    jdbc_warehouse_stream_sync(
        events_stream(spark, src, max_files_per_trigger=1),
        wh,
        "user_state",
        os.path.join(base, "ckpt"),
        state_url=lambda batch_id: derby_snapshot_jar(
            spark, db_path, tag=f"b{batch_id}"
        ),
        base_date=datetime(2024, 6, 1),
    )
    if len(wh.table_versions("user_state")) != 2:  # keep-2 after 3 publishes
        raise RuntimeError("retention must keep current + backup")

    ro = SourceSpec(
        name="derby_wh_ro",
        format="jdbc",
        options={
            "url": derby_snapshot_jar(spark, db_path, tag="final"),
            "driver": DERBY_DRIVER,
        },
    )
    lo_hi = t.events.agg(F.min("user_id"), F.max("user_id")).first()
    opts = dict(ro.options)
    if lo_hi[0] is not None:
        opts.update(
            partition_bounds_options(
                "user_id",
                int(lo_hi[0]),
                max(int(lo_hi[1]), int(lo_hi[0]) + 1),
                num_partitions=4,
            )
        )
    back = jdbc_reader(
        spark,
        SourceSpec(name="derby_wh_ro", format="jdbc", options=opts),
        CopyJob(job_id="swp_rb", source="derby_wh_ro", from_table="user_state"),
    )
    return back.select("event_id", "ts", "user_id", "event_type", "value").orderBy(
        "user_id"
    )


@query(
    "copy_partitioned_publish",
    oracle="""
        WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events)
        SELECT CAST(ts AS DATE) AS event_date,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(ROUND(SUM(CAST(COALESCE(value, 0.0) AS DECIMAL(30,8))), 2)
                    AS DOUBLE) AS sum_value
        FROM events, b
        WHERE CAST(ts AS DATE) BETWEEN b.d0 + 1 AND b.d0 + 3
        GROUP BY 1 ORDER BY 1
    """,
    bench=True,
)
def copy_partitioned_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-partitioned publish as a first-class gate (round-11 verdict
    item 4): a 100 TB events table is date-partitioned before it is
    anything else. The events fixture is published through
    ``VersionedCatalog.write_version(partition_by=["event_date"])``
    (hive-style day directories), read back through the catalog, and a
    literal 3-of-30-day range query is hashed against the parquet-direct
    oracle. The builder FAILS unless the read-side scan actually pruned:
    every ``inputFiles()`` path must carry an in-range ``event_date=``
    directory (directories outside the range are never listed — the
    coarsest and cheapest skip level), and the physical plan must push
    the range into ``PartitionFilters``; a regression to a full scan
    turns this gate red even though the VALUES would still match.

    Reference analog: the versioned publish lifecycle (PHASES 2-4 of
    ``CopyTool.doCopy``) with the partitioning the reference delegates to
    MonetDB's storage layer expressed as parquet partition directories.
    """
    from datetime import timedelta

    t = Tables(spark, sf_dir)
    events = t.events.withColumn("event_date", F.to_date("ts"))
    base = tempfile.mkdtemp(prefix="copy_partpub_")
    catalog = VersionedCatalog(os.path.join(base, "wh"))
    from datetime import datetime

    physical = catalog.write_version(
        events,
        "main",
        "events_by_day",
        datetime(2024, 6, 1),
        partition_by=["event_date"],
    )
    catalog.publish(spark, "main", "events_by_day", physical)

    published = catalog.table_at(spark, "main", "events_by_day")
    d0 = t.events.agg(F.min(F.to_date("ts"))).first()[0]
    if d0 is None:  # hostile empty corpus: range over nothing, oracle empty too
        lo = hi = None
        ranged = published.filter(F.lit(False))
    else:
        lo, hi = d0 + timedelta(days=1), d0 + timedelta(days=3)
        ranged = published.filter(F.col("event_date").between(F.lit(lo), F.lit(hi)))

        # -- pruning assertions: a full scan is a gate ERROR --------------
        plan = ranged._jdf.queryExecution().executedPlan().toString()
        if "PartitionFilters: []" in plan or "PartitionFilters" not in plan:
            raise RuntimeError(
                "date range did not reach PartitionFilters — partition "
                "pruning regressed to a full scan:\n" + plan[:2000]
            )
        # runtime proof (inputFiles() reports the UNPRUNED base relation):
        # the executed scan must only ever open in-range day directories
        files = [
            r[0]
            for r in ranged.select(F.input_file_name()).distinct().collect()
        ]
        for f in files:
            part = [s for s in f.split("/") if s.startswith("event_date=")]
            if not part or not (str(lo) <= part[0][len("event_date="):] <= str(hi)):
                raise RuntimeError(f"scan read an out-of-range partition file: {f}")

    dec = F.coalesce(F.col("value"), F.lit(0.0)).cast("decimal(30,8)")
    return (
        ranged.groupBy("event_date")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.round(F.sum(dec), 2).cast("double").alias("sum_value"),
        )
        .orderBy("event_date")
    )


@query(
    "stream_stream_join_attribution",
    oracle="""
        SELECT c.event_id AS click_id, c.user_id AS click_user,
               c.ts AS click_ts, p.event_id AS purchase_id,
               p.ts AS purchase_ts, p.value AS purchase_value
        FROM events c JOIN events p
          ON c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.user_id = c.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        ORDER BY click_id, purchase_id
    """,
)
def stream_stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join under the oracle gate (previously
    pytest-only): clicks matched to the same user's purchases within 30
    minutes — conversion attribution over two unbounded sides
    (``streaming/pipelines.py:correlated_purchases_stream``), drained as a
    REAL readStream and hashed against the batch interval-join oracle.

    Staging is CHRONOLOGICAL — three consecutive 10-day shards with
    monotone file mtimes, so the oldest-first FileStreamSource order makes
    event time monotone across micro-batches and no row is ever late: the
    watermark(1h)+horizon(30m) state-retention bound then provably emits
    every cross-batch match (a boundary click is still buffered when its
    next-shard purchase arrives, because horizon < watermark), making the
    streaming result EQUAL to the batch join rather than a subset. That
    equality — inner interval join + watermark state eviction = batch
    semantics under in-order arrival — is the 100 TB contract this gate
    pins; per-side state stays bounded by watermark + horizon regardless
    of stream length.
    """
    import glob as _glob

    from ..streaming.pipelines import correlated_purchases_stream

    t = Tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="stream_ssj_")
    src = os.path.join(base, "in")
    bounds = t.events.agg(F.min("ts")).first()
    d0 = bounds[0]
    if d0 is None:  # hostile empty corpus: one empty shard, empty oracle
        t.events.coalesce(1).write.mode("append").parquet(src)
    else:
        from datetime import timedelta

        cut1 = d0 + timedelta(days=10)
        cut2 = d0 + timedelta(days=20)
        shards = [
            t.events.filter(F.col("ts") < F.lit(cut1)),
            t.events.filter((F.col("ts") >= F.lit(cut1)) & (F.col("ts") < F.lit(cut2))),
            t.events.filter(F.col("ts") >= F.lit(cut2)),
        ]
        seen: set[str] = set()
        for i, shard in enumerate(shards):
            shard.coalesce(1).write.mode("append").parquet(src)
            for f in set(_glob.glob(os.path.join(src, "*.parquet"))) - seen:
                os.utime(f, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))
                seen.add(f)

    out_dir = os.path.join(base, "out")
    joined = correlated_purchases_stream(
        events_stream(spark, src, max_files_per_trigger=1)
    )
    out_schema = joined.schema
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    return (
        spark.read.schema(out_schema)
        .parquet(out_dir)
        .orderBy("click_id", "purchase_id")
    )


@query(
    "catalog_compact_publish",
    oracle="""
        SELECT event_id, ts, user_id, event_type, value
        FROM events ORDER BY event_id
    """,
)
def catalog_compact_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (the OPTIMIZE analog) under the oracle gate —
    previously pytest-only. A deliberately FRAGMENTED publish (32-way
    repartition, the layout a streaming sink or highly-parallel load
    accumulates) is compacted to 2 files via ``VersionedCatalog.compact``
    and atomically republished; the gate hashes the compacted read-back
    against the parquet-direct oracle AND asserts the physical contract
    in-builder: the compacted version's data-file count actually shrank
    to the target, the view follows the compacted version, and the
    fragmented version survives as the retention backup (readers never
    see a half-compacted table; a crashed compact leaves the old version
    live). At 100 TB small files dominate scan cost — per-file open +
    footer reads and task-scheduling overhead — so "compaction preserves
    values" is a lifecycle invariant worth a driver verdict, not just a
    unit test.
    """
    from datetime import datetime

    t = Tables(spark, sf_dir)
    ev = t.events.select("event_id", "ts", "user_id", "event_type", "value")
    base = tempfile.mkdtemp(prefix="catalog_compact_")
    catalog = VersionedCatalog(os.path.join(base, "wh"))

    p1 = catalog.write_version(ev.repartition(32), "main", "ev", datetime(2024, 6, 1))
    catalog.publish(spark, "main", "ev", p1)

    def _data_files(physical: str) -> int:
        d = catalog.version_dir("main", physical)
        return sum(1 for f in os.listdir(d) if f.startswith("part-"))

    n_frag = _data_files(p1)
    p2 = catalog.compact(spark, "main", "ev", datetime(2024, 6, 2), target_files=2)
    n_compact = _data_files(p2)

    if catalog.current_version("main", "ev") != p2:
        raise RuntimeError("view must follow the compacted version")
    if n_compact > 2:
        raise RuntimeError(f"compact(target_files=2) left {n_compact} data files")
    # the shrink is only meaningful when the corpus filled the 32-way
    # layout (hostile corpora are tiny; empty partitions write no file)
    if n_frag >= 32 and not n_compact < n_frag:
        raise RuntimeError(f"compaction did not shrink files: {n_frag} -> {n_compact}")
    if p1 not in catalog.table_versions("main", "ev"):
        raise RuntimeError("fragmented version must survive as the keep-2 backup")

    return catalog.table_at(spark, "main", "ev").orderBy("event_id")


@query(
    "join_bucketed_colocated",
    oracle="""
        SELECT o.o_custkey AS custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
                   AS total_spend,
               MAX(c.c_name) AS c_name
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY o.o_custkey ORDER BY custkey
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join under the oracle gate — previously
    pytest-only. Both sides are written as catalog tables bucketed 8-way
    on the join key (``engine/bucketing.py``); the join must then plan
    WITHOUT any Exchange — no shuffle on either side, no broadcast (the
    threshold is disabled for the probe, since gate-scale fixtures would
    otherwise broadcast and bypass the bucketed path entirely). The
    builder executes the join, asserts the final adaptive plan is
    exchange-free (and a SortMergeJoin whenever both sides are
    non-empty), restores the session conf, and hashes the staged result
    against the plain-join oracle.

    This is the repeated-big-join contract at 100 TB: two fact tables
    joined on the same key every run pay the shuffle ONCE at write time
    (bucket layout) instead of every query."""
    from datetime import datetime as _dt

    from ..engine.bucketing import bucketed_join, write_bucketed

    t = Tables(spark, sf_dir)
    tag = os.path.basename(tempfile.mkdtemp(prefix="bk_")).replace("bk_", "")
    lt, rt = f"bk_orders_{tag}", f"bk_customer_{tag}"
    write_bucketed(
        t.orders.select(F.col("o_custkey").alias("custkey"), "o_totalprice"),
        lt,
        bucket_col="custkey",
        n_buckets=8,
    )
    write_bucketed(
        t.customer.select(F.col("c_custkey").alias("custkey"), "c_name"),
        rt,
        bucket_col="custkey",
        n_buckets=8,
    )
    out_dir = os.path.join(tempfile.mkdtemp(prefix="bkout_"), "out")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        dec = F.col("o_totalprice").cast("decimal(30,8)")
        joined = (
            bucketed_join(spark, lt, rt, "custkey")
            .groupBy("custkey")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.sum(dec).cast("double").alias("total_spend"),
                F.max("c_name").alias("c_name"),
            )
        )
        joined.write.mode("overwrite").parquet(out_dir)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        if "Exchange hashpartitioning" in plan or "BroadcastExchange" in plan:
            raise RuntimeError(
                "bucketed join shuffled — the co-location contract "
                "regressed:\n" + plan[:2000]
            )
        both = spark.table(lt).limit(1).count() and spark.table(rt).limit(1).count()
        if both and "SortMergeJoin" not in plan:
            raise RuntimeError("expected the bucketed SortMergeJoin:\n" + plan[:2000])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for name in (lt, rt):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
    return spark.read.parquet(out_dir).orderBy("custkey")


@query(
    "catalog_zorder_publish",
    oracle="""
        WITH probe AS (
            SELECT user_id FROM events GROUP BY user_id
            ORDER BY COUNT(*) DESC, user_id LIMIT 1
        )
        SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value
        FROM events e, probe p WHERE e.user_id = p.user_id
        ORDER BY e.event_id
    """,
)
def catalog_zorder_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering under the oracle gate — previously
    pytest/probe-only (``engine/zorder.py``, ``zorder_skip_probe.py``).
    Events are published twice at 16 files each: once range-clustered on
    ``ts`` (the layout a time-ordered ingest naturally produces) and once
    Z-ORDERED on (user_id, value bits interleaved). The gate then reads
    the hottest user's rows back from the z-ordered version (hashed
    against the parquet oracle) and asserts the LOCALITY contract
    in-builder: the z-ordered layout must concentrate that user into
    strictly fewer files than the time-ordered layout spreads it across
    (measured from the executed scan's ``input_file_name`` set). File
    locality is what parquet footer min/max stats turn into skipped I/O
    at 100 TB — a clustering regression turns this gate red even though
    the VALUES would still match.
    """
    from datetime import datetime as _dt

    from ..engine.zorder import ZCol, cluster_by_zorder

    t = Tables(spark, sf_dir)
    ev = t.events.select("event_id", "ts", "user_id", "event_type", "value")
    base = tempfile.mkdtemp(prefix="catalog_zorder_")
    catalog = VersionedCatalog(os.path.join(base, "wh"))

    bounds = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value"),
        F.count(F.lit(1)),
    ).first()
    n_rows = bounds[4]
    if bounds[0] is None or bounds[2] is None:
        # hostile empty/degenerate corpus: publish raw, skip locality proof
        pz = catalog.write_version(ev, "main", "ev_z", _dt(2024, 6, 1))
        catalog.publish(spark, "main", "ev_z", pz)
        probe_user = None
    else:
        specs = [
            ZCol("user_id", float(bounds[0]), float(bounds[1])),
            ZCol("value", float(bounds[2]), float(bounds[3])),
        ]
        pz = catalog.write_version(
            cluster_by_zorder(ev, specs, num_files=16), "main", "ev_z", _dt(2024, 6, 1)
        )
        catalog.publish(spark, "main", "ev_z", pz)
        pt = catalog.write_version(
            ev.repartitionByRange(16, "ts"), "main", "ev_ts", _dt(2024, 6, 1)
        )
        catalog.publish(spark, "main", "ev_ts", pt)
        probe_user = (
            ev.groupBy("user_id")
            .count()
            .orderBy(F.col("count").desc(), "user_id")
            .first()["user_id"]
        )

        def _files_with_user(table: str) -> int:
            return (
                catalog.table_at(spark, "main", table)
                .filter(F.col("user_id") == F.lit(probe_user))
                .select(F.input_file_name())
                .distinct()
                .count()
            )

        # locality proof only when the corpus can express it: a tiny
        # hostile fixture can't fill 16 files on either layout
        if n_rows >= 2000:
            z_files = _files_with_user("ev_z")
            ts_files = _files_with_user("ev_ts")
            if not z_files < ts_files:
                raise RuntimeError(
                    "z-order locality regressed: hottest user in "
                    f"{z_files} z-ordered files vs {ts_files} time-ordered"
                )

    out = catalog.table_at(spark, "main", "ev_z")
    if probe_user is not None:
        out = out.filter(F.col("user_id") == F.lit(probe_user))
    else:
        # empty corpus: oracle's probe CTE yields no user, result empty
        out = out.filter(F.lit(False))
    return out.select("event_id", "ts", "user_id", "event_type", "value").orderBy(
        "event_id"
    )


@query(
    "join_dpp_partition_pruned",
    oracle="""
        WITH f AS (
            SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year, o_totalprice
            FROM orders
        ),
        target AS (
            SELECT DISTINCT o_year FROM f WHERE o_year % 3 = 0
        )
        SELECT f.o_year,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(f.o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
                   AS total_spend
        FROM f JOIN target USING (o_year)
        GROUP BY f.o_year ORDER BY f.o_year
    """,
)
def join_dpp_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning under the oracle gate — previously
    pytest-only (``test_runtime_filters.py``). Orders are published
    year-partitioned through the versioned catalog, then joined to a
    selective dimension (every third year) that only becomes known at
    RUNTIME: the planner must inject a ``dynamicpruning`` subquery on the
    fact scan's partition column, so at 100 TB the join scans 1/3 of the
    years instead of all of them — runtime's answer to the literal-range
    pruning `copy_partitioned_publish` pins statically. The builder
    raises if the mechanism doesn't engage (fact non-empty), and the join
    result hashes against the plain-SQL oracle.
    """
    from datetime import datetime as _dt

    t = Tables(spark, sf_dir)
    fact_src = t.orders.select(
        F.year("o_orderdate").alias("o_year"), "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix="dpp_gate_")
    catalog = VersionedCatalog(os.path.join(base, "wh"))
    p = catalog.write_version(
        fact_src, "main", "orders_by_year", _dt(2024, 6, 1), partition_by=["o_year"]
    )
    catalog.publish(spark, "main", "orders_by_year", p)

    fact = catalog.table_at(spark, "main", "orders_by_year")
    dim = fact.select("o_year").distinct().filter(F.col("o_year") % 3 == 0)
    joined = (
        fact.join(dim, "o_year")
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
            .cast("double")
            .alias("total_spend"),
        )
        .orderBy("o_year")
    )
    if not fact.limit(1).isEmpty():
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        if "dynamicpruning" not in plan.lower():
            raise RuntimeError(
                "dynamic partition pruning did not engage on the "
                "year-partitioned fact scan:\n" + plan[:2000]
            )
    return joined


@query(
    "join_runtime_bloom_pruned",
    oracle="""
        SELECT l.l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(30,8))) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
        GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """,
)
def join_runtime_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning — the row-level counterpart of
    ``join_dpp_partition_pruned``: when the probe side is NOT partitioned
    on the join key, the planner can still build a bloom filter from the
    selective creation side (urgent orders, 1/5 of the table) and inject
    a ``might_contain`` predicate on the fact scan, so at 100 TB the
    shuffle receives ~1/5 of lineitem instead of all of it. The builder
    pins the engaging confs (shuffle join forced — a broadcast join
    already prunes at the hash table and the planner rightly skips the
    bloom; application-side size floor lowered for the sf0.01 fixture),
    asserts both ``might_contain`` and ``bloom_filter_agg`` appear in the
    compiled plan, then RESTORES every conf so the driver's collect and
    all later queries replan under vanilla settings — the bloom is
    semantically transparent, which is exactly what the oracle hash
    verifies."""
    t = Tables(spark, sf_dir)
    pinned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved: dict[str, str | None] = {}
    for k in pinned:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    joined = (
        t.lineitem.join(urgent, t.lineitem["l_orderkey"] == urgent["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,8)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("l_returnflag")
    )
    try:
        for k, v in pinned.items():
            spark.conf.set(k, v)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        if "might_contain" not in plan or "bloom_filter_agg" not in plan:
            raise RuntimeError(
                "runtime bloom filter did not engage on the fact scan:\n"
                + plan[:2000]
            )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return joined
