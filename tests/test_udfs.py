"""UDF/pandas-UDF/UDAF/UDTF surface: each variant runs and agrees with its
built-in or pandas reference."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mssql2monetdb_spark.catalog import load_table
from mssql2monetdb_spark.functions import udfs

SF = "/root/testdata/sf0.001"


def test_row_udf_matches_builtin(spark):
    docs = load_table(spark, SF, "documents").limit(30)
    out = docs.select(
        udfs.py_token_count("text").alias("py"),
        F.size(F.split(F.col("text"), r"\s+")).alias("builtin"),
    )
    for r in out.collect():
        assert r["py"] == r["builtin"]


def test_pandas_udf_zscore(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double").coalesce(1)
    vals = [r["z"] for r in df.select(udfs.zscore_pandas("v").alias("z")).collect()]
    s = pd.Series(range(100), dtype="float64")
    expected = ((s - s.mean()) / s.std(ddof=0)).tolist()
    assert vals == expected


def test_udaf_trimmed_mean(spark):
    orders = load_table(spark, SF, "orders")
    got = {
        r["o_orderstatus"]: r["tm"]
        for r in orders.groupBy("o_orderstatus")
        .agg(udfs.trimmed_mean_udaf("o_totalprice").alias("tm"))
        .collect()
    }
    pdf = orders.select("o_orderstatus", "o_totalprice").toPandas()
    for status, grp in pdf.groupby("o_orderstatus"):
        v = grp["o_totalprice"]
        lo, hi = v.quantile(0.1), v.quantile(0.9)
        expected = float(v[(v >= lo) & (v <= hi)].mean())
        assert abs(got[status] - expected) < 1e-9


def test_normalize_ws_pandas_matches_oracle_edge_semantics(spark):
    """Edge inputs the sf fixtures never exercise (ADVICE round 2): NULL
    must propagate (not map to ''), and trim must strip spaces only — the
    exact semantics of the DuckDB oracle expression, checked side-by-side.
    """
    import duckdb

    cases = [None, "  MiXeD  Case  ", "\tkeep-tab edges\t", "a\nb", "", "   "]
    df = spark.createDataFrame([(c,) for c in cases], "text string").coalesce(1)
    got = [
        r["n"]
        for r in df.select(udfs.normalize_ws_pandas("text").alias("n")).collect()
    ]
    con = duckdb.connect()
    expected = [
        con.sql(
            "SELECT regexp_replace(lower(trim(?)), '\\s+', ' ', 'g')", params=[c]
        ).fetchone()[0]
        for c in cases
    ]
    assert got == expected
    assert got[0] is None  # NULL in -> NULL out


def test_udtf_shingles(spark):
    udfs.register_all(spark)
    out = spark.sql("SELECT * FROM shingles('a b c d')").collect()
    assert [(r["pos"], r["shingle"]) for r in out] == [
        (0, "a b"),
        (1, "b c"),
        (2, "c d"),
    ]


def test_sql_registration(spark):
    udfs.register_all(spark)
    load_table(spark, SF, "documents").limit(5).createOrReplaceTempView("d5")
    rows = spark.sql("SELECT py_token_count(text) AS n FROM d5").collect()
    assert all(r["n"] > 0 for r in rows)
