"""SURVEY.md §2B streaming row — batch-equivalent declared queries.

The reference's "streaming" is a polling scheduler + watermark trigger
(``CopyTool.java:121-160,332-477``); the Spark-idiomatic upgrade is
Structured Streaming over the events table (see ``streaming/pipelines.py``
for the real readStream pipelines, pinned by pytest). The driver's oracle
gate runs batch mode, so these queries express the same window semantics on
the static events table with exact DuckDB equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from .helpers import dsum, oracle_dsum
from .registry import query


@query(
    "stream_tumbling_hourly",
    oracle=f"""
        SELECT date_trunc('hour', ts) AS w_start,
               COUNT(*) AS n_events,
               {oracle_dsum('value', 'sum_value')}
        FROM events GROUP BY date_trunc('hour', ts) ORDER BY w_start
    """,
    bench=True,
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate (streaming: groupBy(window(ts,'1 hour'))
    with a watermark; batch-equivalent shown here, windows epoch-aligned)."""
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("w_start"), "n_events", "sum_value")
        .orderBy("w_start")
    )


@query(
    "stream_sliding_windows",
    oracle=f"""
        WITH b AS (
            SELECT time_bucket(INTERVAL '30 minutes', ts) AS bucket, value FROM events
        ), w AS (
            SELECT bucket AS w_start, value FROM b
            UNION ALL
            SELECT bucket - INTERVAL 30 MINUTE AS w_start, value FROM b
        )
        SELECT w_start, COUNT(*) AS n_events, {oracle_dsum('value', 'sum_value')}
        FROM w GROUP BY w_start ORDER BY w_start
    """,
)
def stream_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30m windows: every event lands in exactly two windows (the
    oracle materializes both slide offsets explicitly)."""
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("w_start"), "n_events", "sum_value")
        .orderBy("w_start")
    )


@query(
    "stream_session_windows",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             <= INTERVAL 10 MINUTE THEN 0 ELSE 1 END AS is_new
            FROM events
        ), sessions AS (
            SELECT user_id, ts, event_id,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 10 MINUTE AS session_end,
               COUNT(*) AS n_events
        FROM sessions GROUP BY user_id, sess
        ORDER BY user_id, session_start
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 10-minute gap per user — Spark's
    ``session_window``; the oracle is the classic gaps-and-islands rewrite
    (session_end = last event + gap, matching Spark's definition).

    The running-sum window's tie order must MATCH the lag window's
    (ts, event_id) — an earlier draft ordered it (ts, is_new), which on
    TIED timestamps ran the boundary flags in a different order than they
    were computed in and split a tied pair into two sessions
    (scripts/edge_corpus_probe.py caught the off-by-one row count; the
    driver fixtures have no tied (user_id, ts) pairs)."""
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "stream_dedup_first",
    oracle="""
        SELECT user_id, event_type, event_id, ts FROM (
            SELECT user_id, event_type, event_id, ts,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1 ORDER BY user_id, event_type
    """,
)
def stream_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first stateful dedup on (user_id, event_type) — the batch analog
    of ``dropDuplicatesWithinWatermark`` with a deterministic survivor."""
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        t.events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
        .orderBy("user_id", "event_type")
    )


@query(
    "stream_watermark_recent",
    oracle=f"""
        SELECT date_trunc('hour', ts) AS w_start, COUNT(*) AS n_events,
               {oracle_dsum('value', 'sum_value')}
        FROM events
        WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 3 DAY
        GROUP BY date_trunc('hour', ts) ORDER BY w_start
    """,
)
def stream_watermark_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data cutoff relative to the stream's max event time — the batch
    analog of a 3-day watermark (reference trigger semantics: only data newer
    than the persisted high-water mark is processed, ``CopyTool.java:444-473``)."""
    t = Tables(spark, sf_dir)
    events = t.events
    max_ts = events.agg(F.max("ts").alias("m"))
    return (
        events.join(F.broadcast(max_ts))
        .filter(F.col("ts") >= F.col("m") - F.expr("INTERVAL 3 DAYS"))
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("w_start"), "n_events", "sum_value")
        .orderBy("w_start")
    )


@query(
    "stream_static_enrich",
    oracle=f"""
        SELECT date_trunc('hour', e.ts) AS w_start,
               c.c_mktsegment AS segment,
               COUNT(*) AS n_events,
               {oracle_dsum('e.value', 'sum_value')}
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2 ORDER BY w_start, segment
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (batch equivalent): events enriched
    with the broadcast customer dimension, hourly window x market segment.
    The true readStream pipeline is streaming/pipelines.py:
    enriched_windowed_stream, pinned against this shape in pytest."""
    t = Tables(spark, sf_dir)
    enriched = t.events.join(
        F.broadcast(t.customer.select("c_custkey", "c_mktsegment")),
        on=F.col("user_id") == F.col("c_custkey"),
        how="inner",
    )
    return (
        enriched.groupBy(F.window("ts", "1 hour").alias("w"), F.col("c_mktsegment"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("c_mktsegment").alias("segment"),
            "n_events",
            "sum_value",
        )
        .orderBy("w_start", "segment")
    )
