"""Bucketed tables: co-located (exchange-free) joins for repeated big joins.

At 100 TB, two fact tables joined on the same key every run should not
re-shuffle each run: write both bucketed by the join key and Spark's
sort-merge join reads matching buckets directly — the `.explain` shows NO
Exchange on either side.

Bucketing requires the session catalog (``saveAsTable``); plain parquet
directories cannot carry bucket metadata. This module is the engine's
opt-in path for hot join keys; the versioned-publish pipeline remains the
default storage layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``n_buckets`` should match downstream ``spark.sql.shuffle.partitions``
    scale: each bucket becomes one task side in the exchange-free join.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner") -> DataFrame:
    """Join two identically-bucketed tables — planner elides both Exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
