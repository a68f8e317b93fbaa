"""Shared expression helpers keeping Spark and DuckDB results bit-identical.

Floating-point SUM/AVG are order-dependent; at cluster scale Spark's partial
aggregation order is nondeterministic, so hash-stable results require exact
arithmetic. Doubles are cast to DECIMAL(30,8) (exact, associative), summed,
and the final value cast back to DOUBLE — the same exact decimal converts to
the same double in every engine. Precision 30 admits per-row magnitudes up
to 1e22 (a 24,8 cast overflowed — ANSI error — on a hostile corpus with
value = 1e18; scripts/edge_corpus_probe.py) while the engine-side SUM still
widens within the 38-digit cap in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

DEC = DecimalType(30, 8)


def dsum(col: Column | str, alias: str) -> Column:
    """Order-insensitive SUM of a double column, returned as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-insensitive AVG of a double column, returned as DOUBLE.

    Defined as exact-decimal SUM cast to DOUBLE, divided by COUNT(col) —
    double division of identical operands is deterministic.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def oracle_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,8))) AS DOUBLE) AS {alias}"


def oracle_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,8))) AS DOUBLE) / COUNT({expr}) AS {alias}"
