"""Vector column expressions over ``array<float>`` embeddings.

Dot products / norms are computed as LEFT-TO-RIGHT folds in DOUBLE so both
engines produce bit-identical results despite FP non-associativity:

- Spark:  ``reduce(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0D, +)``
- DuckDB: ``list_reduce(list_transform(generate_series(1, len(a)),
            i -> a[i]::DOUBLE * b[i]::DOUBLE), (x, y) -> x + y)``

(DuckDB's builtin ``list_dot_product`` is NOT used in oracle-checked paths —
its accumulation order is unspecified.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.reduce(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; both operands assumed non-zero (embeddings are)."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance as a deterministic left fold (same order both engines)."""
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.reduce(diffs, F.lit(0.0), lambda acc, x: acc + x)


def l2sq_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
        f"* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))), (x, y) -> x + y)"
    )


def const_array(values: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])


def const_array_sql(values: list[float]) -> str:
    return "[" + ", ".join(repr(float(v)) for v in values) + "]"
