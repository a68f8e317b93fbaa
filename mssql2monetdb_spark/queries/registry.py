"""Central registry of declared queries.

Each entry pairs a Spark builder ``(spark, sf_dir) -> DataFrame`` with the
equivalent ANSI SQL that DuckDB runs on the same parquet tables — the
driver's correctness gate (CORRECTNESS_r{N}.json) compares the two at
sf=0.01 via row-count + schema + order-insensitive value hash.

Discipline for hash-stable results (FIXTURES.md determinism rules):

- every computed column is aliased identically on both sides;
- double aggregations go through ``DECIMAL(24,8)`` so the sum is exact and
  order-insensitive, then cast back to DOUBLE (identical bits both engines);
- integer sums are cast to BIGINT (DuckDB SUM(int) is HUGEINT otherwise);
- every query carries a total-order ORDER BY;
- timestamps are computed under UTC sessions.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    build: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    bench: bool = False  # include in bench.py headline set
    doc: str = field(default="")


REGISTRY: dict[str, Query] = {}


def query(name: str, *, oracle: str | None, bench: bool = False) -> Callable[[Builder], Builder]:
    """Decorator registering a declared query under ``name``."""

    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, bench=bench, doc=fn.__doc__ or "")
        return fn

    return wrap


def queries() -> dict[str, Builder]:
    return {name: q.build for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


def bench_queries() -> dict[str, Query]:
    return {name: q for name, q in REGISTRY.items() if q.bench}
