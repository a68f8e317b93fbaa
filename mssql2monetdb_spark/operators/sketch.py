"""Count-min sketch as pure DataFrame aggregation.

A CMS is d hash rows x w counters; every key increments one counter per
row, and a key's estimate is the MIN of its d counters — an upper bound on
the true count that tightens as w grows. Expressed relationally the build
is one groupBy over (row, bucket) pairs — map-side combinable, shuffle
bounded by d*w regardless of input size — and the probe is a join against
the (at most d*w)-row sketch relation, which always broadcasts.

This is the streaming-telemetry shape ("how often did key X appear in a
100 TB log") where an exact per-key groupBy would shuffle billions of
distinct keys: the sketch costs a constant-size state no matter the key
cardinality. Hashes are the engine-portable md5 family
(functions.hashing), so DuckDB can run the identical algorithm as the
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hashing

CMS_DEPTH = 4  # hash rows
CMS_WIDTH = 256  # counters per row


def _bucket(key: Column, i: int) -> Column:
    """Row-i bucket of a key: first 32 md5 bits of 'i:key' mod width."""
    return (
        hashing.md5_int32(F.concat(F.lit(f"{i}:"), key.cast("string"))) % CMS_WIDTH
    )


def _bucket_sql(key_expr: str, i: int) -> str:
    """DuckDB fragment equivalent to :func:`_bucket`."""
    inner = f"'{i}:' || CAST({key_expr} AS VARCHAR)"
    return f"({hashing.md5_int32_sql(inner)} % {CMS_WIDTH})"


def count_min_build(rows: DataFrame, key_col: str) -> DataFrame:
    """(row i, bucket, c): the sketch counters for a key stream."""
    pairs = rows.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), _bucket(F.col(key_col), i).alias("bucket")
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("ib")
    ).select("ib.i", "ib.bucket")
    return pairs.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("c"))


def count_min_estimate(sketch: DataFrame, probes: DataFrame, key_col: str) -> DataFrame:
    """min-of-d-counters estimate for every probe key.

    The sketch is <= d*w rows and broadcasts; each probe key expands to d
    (i, bucket) lookups and collapses back with MIN.
    """
    lookups = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), _bucket(F.col(key_col), i).alias("bucket")
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("ib"),
    ).select(key_col, "ib.i", "ib.bucket")
    return (
        lookups.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy(key_col)
        .agg(F.min("c").cast("bigint").alias("cms_count"))
    )


BLOOM_BITS = 2048
BLOOM_HASHES = 3


def _bloom_bit(key: Column, i: int) -> Column:
    return (
        hashing.md5_int32(F.concat(F.lit(f"b{i}:"), key.cast("string"))) % BLOOM_BITS
    )


def _bloom_bit_sql(key_expr: str, i: int) -> str:
    inner = f"'b{i}:' || CAST({key_expr} AS VARCHAR)"
    return f"({hashing.md5_int32_sql(inner)} % {BLOOM_BITS})"


def bloom_build(rows: DataFrame, key_col: str) -> DataFrame:
    """One-column (bit) relation: the set bits of an m-bit / k-hash bloom
    filter over the key stream. At most BLOOM_BITS rows regardless of
    input size — the membership analog of the count-min build."""
    return (
        rows.select(
            F.explode(
                F.array(*[_bloom_bit(F.col(key_col), i) for i in range(BLOOM_HASHES)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(bloom: DataFrame, probes: DataFrame, key_col: str) -> DataFrame:
    """(key, maybe_present): true iff all k bits are set. No false
    negatives by construction; false-positive rate ~ (set_bits/m)^k. The
    bloom relation (<= m rows) always broadcasts — the probe side never
    shuffles."""
    lookups = probes.select(
        F.col(key_col),
        F.explode(
            F.array(*[_bloom_bit(F.col(key_col), i) for i in range(BLOOM_HASHES)])
        ).alias("bit"),
    )
    marked = lookups.join(
        F.broadcast(bloom.withColumn("_set", F.lit(1))), "bit", "left"
    )
    return marked.groupBy(key_col).agg(
        (F.count("_set") == BLOOM_HASHES).alias("maybe_present")
    )
