"""Z-order (Morton) clustering for multi-column data skipping.

Sorting by a single column gives parquet min/max pruning on that column
only; interleaving the bits of several rank-normalized columns gives
*every* interleaved column locality within each file, so predicates on any
of them prune row groups. This is the standard lakehouse technique for
multi-dimensional clustering (Delta/Iceberg ``ZORDER BY``), built here from
plain JVM expressions: normalize -> bit-interleave -> repartitionByRange on
the z-value -> sortWithinPartitions.

At 100 TB: the range partitioner samples the z-value distribution, so files
come out balanced; the z-value itself is a narrow BIGINT shuffle key.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16  # bits per column; 2 cols -> 32-bit z-values, 4 -> 64


@dataclass(frozen=True)
class ZCol:
    """A column to interleave, with its value bounds (inclusive).

    Bounds come from a cheap MIN/MAX probe (the same probe shape as the
    watermark trigger); values outside are clamped.
    """

    name: str
    lo: float
    hi: float


def _normalized(spec: ZCol, bits: int) -> Column:
    """Map the column into [0, 2^bits) as a BIGINT rank."""
    span = spec.hi - spec.lo
    if span <= 0:
        return F.lit(0).cast("bigint")
    scaled = (F.col(spec.name).cast("double") - F.lit(float(spec.lo))) / F.lit(float(span))
    clamped = F.least(F.lit(1.0), F.greatest(F.lit(0.0), scaled))
    return F.least(
        F.lit((1 << bits) - 1).cast("bigint"),
        F.floor(clamped * F.lit(float(1 << bits))).cast("bigint"),
    )


def zvalue(specs: list[ZCol], bits: int = ZORDER_BITS) -> Column:
    """Morton code: bit ``b`` of column ``i`` lands at position ``b*n + i``."""
    n = len(specs)
    if n * bits > 63:
        raise ValueError(f"{n} columns x {bits} bits exceeds a signed 64-bit z-value")
    z = F.lit(0).cast("bigint")
    for i, spec in enumerate(specs):
        norm = _normalized(spec, bits)
        for b in range(bits):
            z = z + F.shiftleft(F.shiftright(norm, b).bitwiseAND(F.lit(1)), b * n + i).cast(
                "bigint"
            )
    return z


def cluster_by_zorder(
    df: DataFrame, specs: list[ZCol], *, num_files: int, bits: int = ZORDER_BITS
) -> DataFrame:
    """Return ``df`` re-clustered so each output partition covers a compact
    z-range — write the result to get data-skipping files on every
    interleaved column."""
    z = zvalue(specs, bits)
    return (
        df.withColumn("_zorder", z)
        .repartitionByRange(num_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
    )
