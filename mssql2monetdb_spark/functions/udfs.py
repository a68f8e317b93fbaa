"""The user-defined-function surface (SURVEY §2B UDF/pandas-UDF/UDAF/UDTF).

The query corpus itself never uses Python UDFs (built-ins are the fast
path); this module is the declared extension surface for logic Spark can't
express, with the performance ladder made explicit:

1. built-in expressions    — JVM, codegen, fastest (everything in queries/)
2. pandas UDF / UDAF       — Arrow-batched, vectorized NumPy (~10-100x a
                             row-at-a-time UDF)
3. Python UDTF             — table function, row-multiplying transforms
4. row-at-a-time UDF       — last resort, kept here only as the reference
                             point tests measure the others against
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf, udf, udtf
from pyspark.sql.types import DoubleType, IntegerType, StringType


# 4. row-at-a-time UDF (the slow path, for comparison only)
@udf(returnType=IntegerType())
def py_token_count(text: str) -> int:
    return len(text.split()) if text else 0


# 2a. scalar pandas UDF: vectorized over Arrow batches
@pandas_udf(DoubleType())
def zscore_pandas(v: pd.Series) -> pd.Series:
    # batch-local standardization (per Arrow batch; for global z-scores
    # compute mean/std with aggregates and broadcast — see queries)
    std = v.std(ddof=0)
    return (v - v.mean()) / (std if std else 1.0)


# 2a'. scalar pandas UDF with exact (string) semantics — the one the
# driver gate verifies against DuckDB (fn_pandas_udf query): lowercase,
# trim, collapse internal whitespace. Strings are deterministic
# cross-engine, unlike batch-local float statistics.
@pandas_udf(StringType())
def normalize_ws_pandas(v: pd.Series) -> pd.Series:
    # Exact oracle semantics (DuckDB lower/trim/regexp_replace): NULL
    # propagates (pandas .str ops keep NaN -> Arrow NULL; no fillna),
    # trim() strips spaces only (not \t/\n/unicode), and the collapse
    # class is RE2's ASCII \s = [\t\n\f\r ] rather than Python's
    # unicode-aware \s.
    return v.str.lower().str.strip(" ").str.replace(r"[\t\n\f\r ]+", " ", regex=True)


# 2b. grouped-aggregate pandas UDAF
@pandas_udf(DoubleType())
def trimmed_mean_udaf(v: pd.Series) -> float:
    """10%-trimmed mean — an aggregate Spark has no builtin for."""
    lo, hi = v.quantile(0.1), v.quantile(0.9)
    clipped = v[(v >= lo) & (v <= hi)]
    return float(clipped.mean()) if len(clipped) else float(v.mean())


# 3. Python UDTF (Spark 3.5+): one row in, N rows out
@udtf(returnType="pos: int, shingle: string")
class ShingleUDTF:
    """Word-bigram expansion as a table function (the UDTF surface demo;
    the production shingle path is the codegen pipeline in operators/dedup)."""

    def eval(self, text: str):
        words = (text or "").split()
        for i in range(len(words) - 1):
            yield i, f"{words[i]} {words[i + 1]}"


def register_all(spark: SparkSession) -> None:
    """Make the surface available to SQL: SELECT py_token_count(text) ..."""
    spark.udf.register("py_token_count", py_token_count)
    spark.udf.register("zscore_pandas", zscore_pandas)
    spark.udf.register("normalize_ws_pandas", normalize_ws_pandas)
    spark.udf.register("trimmed_mean", trimmed_mean_udaf)
    spark.udtf.register("shingles", ShingleUDTF)
