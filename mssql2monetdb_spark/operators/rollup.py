"""Hypertable-style time-bucket rollups (continuous-aggregate analog).

A multi-granularity rollup materializes coarse aggregates from fine ones:
minute -> hour -> day, each level computed FROM the previous level, not from
raw events — at 100 TB the raw table is scanned once, and each further level
aggregates ~60x fewer rows. Combined with the engine's versioned publish,
this is the batch form of a continuous aggregate; the streaming form is
``streaming.pipelines.windowed_counts_stream`` with a coarser window.

Aggregates carried: count + exact decimal sum (re-aggregatable: sums of
sums; count of counts). AVG is derived at query time as sum/count — never
rolled up directly (avg of avgs is wrong).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine import caches

#: granularity name -> date_trunc unit (epoch-aligned buckets)
GRAINS = ("hour", "day")


def rollup_level(df: DataFrame, ts_col: str, value_col: str, grain: str) -> DataFrame:
    """One rollup level from RAW events: (bucket, n_events, sum_value)."""
    return (
        df.groupBy(F.date_trunc(grain, F.col(ts_col)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(30,8)")).alias("sum_value_dec"),
        )
    )


def rollup_coarser(fine: DataFrame, grain: str) -> DataFrame:
    """Next level FROM a finer level — re-aggregation, no raw scan."""
    return (
        fine.groupBy(F.date_trunc(grain, F.col("bucket")).alias("bucket"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_dec").alias("sum_value_dec"),
        )
    )


def time_bucket_rollup(df: DataFrame, ts_col: str, value_col: str) -> DataFrame:
    """Stacked hour+day rollup in one relation, tagged by grain.

    Output: (grain, bucket, n_events, sum_value: double). The day level is
    computed from the hour level (sums of sums — exact because decimal).
    """
    hourly = caches.tracked(rollup_level(df, ts_col, value_col, "hour"))
    daily = rollup_coarser(hourly, "day")
    out = hourly.select(F.lit("hour").alias("grain"), "bucket", "n_events", "sum_value_dec").unionAll(
        daily.select(F.lit("day").alias("grain"), "bucket", "n_events", "sum_value_dec")
    )
    return out.select(
        "grain",
        "bucket",
        "n_events",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
    )
