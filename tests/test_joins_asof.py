"""salted_join equivalence + asof_join semantics edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from mssql2monetdb_spark.operators.asof import asof_join
from mssql2monetdb_spark.operators.joins import salted_join


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_equals_plain_inner(spark):
    # skewed left: 90% of rows share key 1
    left = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame([(1, "hot"), (5, "cold"), (77777, "missing")], ["k", "label"])
    expected = left.join(right, "k", "inner")
    got = salted_join(left, right, "k", n_salts=4, how="inner")
    cols = ["k", "payload", "label"]
    assert _rows(got, cols) == _rows(expected, cols)


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    right = spark.createDataFrame([(1, "x")], ["k", "w"])
    got = salted_join(left, right, "k", n_salts=3, how="left")
    expected = left.join(right, "k", "left")
    cols = ["k", "v", "w"]
    assert _rows(got, cols) == _rows(expected, cols)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, "L1"), (1, 20, "L2"), (2, 5, "L3")], ["k", "ts", "tag"]
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (2, 9, 300.0)], ["k", "ts", "v"]
    )
    out = {
        r["tag"]: (r["matched_ts"], r["matched_v"])
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="ts").collect()
    }
    assert out["L1"] == (8, 100.0)   # latest right <= 10 is ts=8
    assert out["L2"] == (15, 200.0)  # latest right <= 20 is ts=15
    assert out["L3"] == (None, None)  # no right row at or before ts=5


def test_asof_equal_ts_is_inclusive(spark):
    left = spark.createDataFrame([(1, 10, "L")], ["k", "ts", "tag"])
    right = spark.createDataFrame([(1, 10, 42.0)], ["k", "ts", "v"])
    row = asof_join(left, right, on="k", left_ts="ts", right_ts="ts").collect()[0]
    assert row["matched_ts"] == 10 and row["matched_v"] == 42.0


def test_asof_left_rows_preserved_exactly_once(spark):
    left = spark.range(0, 100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("ts")
    )
    right = spark.range(0, 10).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 7).alias("ts"), F.lit("r").alias("tag")
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
    assert out.count() == 100
    assert out.select("k", "ts").distinct().count() == 100


def test_asof_matches_pandas_merge_asof(spark):
    """Cross-check against pandas.merge_asof (an independent reference
    implementation) on seeded random data."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(42)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 8, 300),
            "ts": rng.randint(0, 10_000, 300).astype("int64"),
        }
    ).assign(lid=range(300))
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 8, 150),
            "ts": rng.randint(0, 10_000, 150).astype("int64"),
            "v": rng.randn(150).round(6),
        }
    )
    # merge_asof needs sort + unique right (k, ts); dedupe like the operator input
    right = right.drop_duplicates(["k", "ts"])
    expected = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )

    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        left_ts="ts",
        right_ts="ts",
    ).toPandas()

    exp = {(r.lid): (None if pd.isna(r.v) else round(r.v, 6)) for r in expected.itertuples()}
    act = {
        (r.lid): (None if r.matched_v is None or pd.isna(r.matched_v) else round(r.matched_v, 6))
        for r in got.itertuples()
    }
    assert act == exp


def test_asof_forward_inclusive_and_null(spark):
    from datetime import datetime

    from mssql2monetdb_spark.operators.asof import asof_join

    def ts(h):
        return datetime(2024, 1, 1, h)

    left = spark.createDataFrame(
        [(1, 1, ts(5)), (2, 1, ts(8)), (3, 2, ts(1))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, 1, ts(5), 1.0), (11, 1, ts(7), 2.0), (12, 2, ts(0), 3.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r.event_id: r
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            right_cols=["event_id", "value"], direction="forward",
        ).collect()
    }
    assert out[1].matched_event_id == 10  # equal ts matches (inclusive)
    assert out[2].matched_event_id is None  # nothing follows
    assert out[3].matched_event_id is None  # right row PRECEDES: no match
