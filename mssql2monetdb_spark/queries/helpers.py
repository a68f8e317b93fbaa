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

import itertools

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

DEC = DecimalType(30, 8)

#: monotonically unique suffix for ephemeral temp-view names (a counter,
#: not a random token, so repeated runs produce stable plan text).
_VIEW_SEQ = itertools.count()


def sql_with_views(spark: SparkSession, sql_template: str, **dfs: DataFrame) -> DataFrame:
    """Run a SQL statement over per-call ephemeral temp views.

    Registers each DataFrame under a generated unique name, formats the
    template's ``{placeholder}`` tokens with those names, resolves the SQL
    (``spark.sql`` analyzes eagerly, so the returned DataFrame owns its
    fully-bound plan), then drops the views again.

    Fixed-name ``createOrReplaceTempView`` inside a query builder is a
    shared-session hazard twice over: (1) two builders racing on the same
    name in one long-lived session can bind the OTHER builder's table —
    e.g. ``orders`` from a different sf_dir — in the window between
    registration and analysis, silently computing on wrong data; (2) a
    library caller's own temp view of that name is clobbered. Unique
    ephemeral names eliminate both, and dropping them leaves the caller's
    catalog exactly as it was found.

    Substitution replaces only the ``{key}`` tokens of the DataFrames
    actually passed (not ``str.format``), so literal braces elsewhere in
    the SQL — JSON-path arguments, regex quantifiers, string literals —
    pass through untouched.
    """
    names = {key: f"_q_{key}_{next(_VIEW_SEQ)}" for key in dfs}
    sql = sql_template
    for key, view in names.items():
        sql = sql.replace("{" + key + "}", view)
    for key, df in dfs.items():
        df.createOrReplaceTempView(names[key])
    try:
        return spark.sql(sql)
    finally:
        for name in names.values():
            spark.catalog.dropTempView(name)


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
