"""Local replica of the driver's DuckDB-oracle correctness gate.

For a query name: run the Spark builder and the oracle SQL on the same
parquet tables, canonicalize both results (column-name sort, row sort,
float rounding), and compare exactly. Used by test_oracle_conformance.py.
"""

from __future__ import annotations

import math
from pathlib import Path

import duckdb
import pandas as pd

from mssql2monetdb_spark.catalog import TABLE_NAMES

FLOAT_DECIMALS = 6


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = Path(sf_dir) / f"{name}.parquet"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name order, float rounding, row sort — mirrors an
    order-insensitive value hash."""
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        s = df[col]
        if s.dtype.kind == "f":
            df[col] = s.astype("float64").round(FLOAT_DECIMALS)
        elif s.dtype.kind == "M":
            df[col] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object:
            # normalize lists/arrays to tuples for sortability
            df[col] = s.map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "__len__") and not isinstance(v, (str, bytes)) else v
            )
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype.kind == "f" and bv.dtype.kind == "f":
            eq = [
                (math.isnan(x) and math.isnan(y)) or x == y
                for x, y in zip(av.fillna(float("nan")), bv.fillna(float("nan")))
            ]
        else:
            eq = list((av.isna() & bv.isna()) | (av == bv))
        bad = [i for i, ok in enumerate(eq) if not ok]
        if bad:
            i = bad[0]
            problems.append(
                f"column {col!r}: {len(bad)} mismatched rows; first at {i}: "
                f"spark={a[col].iloc[i]!r} oracle={b[col].iloc[i]!r}"
            )
    return problems
