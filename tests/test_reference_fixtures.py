"""FIXTURES.md §B — reference-shaped fixtures pinning ETL semantics:
b1 all-types mapping + rendering, b2 dirty strings E2E, b5 schema evolution.
(b3 trigger cases live in test_watermark.py; b4 empty in test_copy_engine.py.)"""

from __future__ import annotations

import glob
from datetime import date, datetime
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from mssql2monetdb_spark.config.spec import load_spec
from mssql2monetdb_spark.engine.copy import CopyEngine
from mssql2monetdb_spark.schema.evolve import SchemaEvolutionError, evolve_to_union
from mssql2monetdb_spark.schema.mapper import map_column
from mssql2monetdb_spark.sources.readers import write_csv_compat


# --- b1_alltypes ---------------------------------------------------------

def b1_schema() -> T.StructType:
    # one column per supported JDBC type (FIXTURES.md b1; MonetDBUtil.java:205-226)
    return T.StructType(
        [
            map_column("id", "BIGINT", nullable=False, auto_increment=True),
            map_column("c_bool", "BIT"),
            map_column("c_tiny", "TINYINT"),
            map_column("c_small", "SMALLINT"),
            map_column("c_int", "INTEGER"),
            map_column("c_big", "BIGINT"),
            map_column("c_real", "REAL"),
            map_column("c_double", "DOUBLE"),
            map_column("c_dec_18_2", "DECIMAL", 18, 2),
            map_column("c_dec_19_0", "NUMERIC", 19, 0),
            map_column("c_dec_9_0", "NUMERIC", 9, 0),
            map_column("c_dec_4_0", "NUMERIC", 4, 0),
            map_column("c_dec_2_0", "NUMERIC", 2, 0),
            map_column("c_char", "CHAR", 10),
            map_column("c_varchar", "VARCHAR", 50),
            map_column("c_clob", "CLOB"),
            map_column("c_date", "DATE"),
            map_column("c_time", "TIME"),
            map_column("c_ts", "TIMESTAMP"),
            map_column("c_blob", "BLOB"),
        ]
    )


def test_b1_schema_types():
    s = b1_schema()
    assert s["id"].dataType == T.LongType() and not s["id"].nullable
    assert s["id"].metadata["auto_increment"] is True
    assert s["c_bool"].dataType == T.BooleanType()
    assert s["c_dec_18_2"].dataType == T.DecimalType(18, 2)
    # narrowing ladder (MonetDBUtil.java:244-263)
    assert s["c_dec_19_0"].dataType == T.LongType()
    assert s["c_dec_9_0"].dataType == T.IntegerType()
    assert s["c_dec_4_0"].dataType == T.ShortType()
    assert s["c_dec_2_0"].dataType == T.ByteType()
    assert s["c_char"].metadata["maxlength"] == 10
    assert s["c_time"].dataType == T.StringType()  # documented TIME choice
    assert s["c_blob"].dataType == T.BinaryType()


def test_b1_null_and_decimal_rendering(spark, tmp_path):
    """NULL -> \\N sentinel; decimals render plain, never scientific
    (CopyTool.java:50,697-707)."""
    schema = b1_schema()
    row = (
        1, True, 2, 3, 4, 5, 1.5, 2.5,
        Decimal("0.00000001").quantize(Decimal("0.01")) + Decimal("0.00"),  # 0.00
        6, 7, 8, 9,
        "char10", "varchar", "clob text",
        date(2024, 2, 29), "23:59:59", datetime(2024, 1, 1, 12, 0, 0),
        b"\x00\x01",
    )
    nulls = tuple([2] + [None] * (len(schema) - 1))
    df = spark.createDataFrame([row, nulls], schema)
    # force a tiny decimal that would be scientific in repr()
    df = df.withColumn("c_dec_18_2", df.c_dec_18_2 + Decimal("0.01"))
    out = str(tmp_path / "b1")
    write_csv_compat(df.coalesce(1), out)
    text = open(glob.glob(out + "/part-*.csv")[0]).read()
    assert r"\N" in text  # NULL sentinel
    assert "E-" not in text and "e-" not in text  # plain decimal rendering


# --- b2_dirty_strings E2E -----------------------------------------------

def test_b2_dirty_strings_copy_e2e(spark, tmp_path):
    src_dir = tmp_path / "src"
    df = spark.createDataFrame(
        [(1, 'va"l', "  padded  "), (2, "back\\slash", "x,y\nz")],
        ["Weird Col-Name!", "s_quotes", "s_pad"],
    )
    df.write.parquet(str(src_dir / "dirty.parquet"))
    spec = load_spec(
        {
            "warehouse_dir": str(tmp_path / "wh"),
            "sources": {"_default": {"format": "parquet", "path": str(src_dir)}},
            "tables": {"d": {"from_table": "dirty"}},
        }
    )
    engine = CopyEngine(spark, spec)
    engine.do_copy(load_date=datetime(2024, 1, 1))
    out = engine.sql("SELECT * FROM dirty ORDER BY weird_col_name_")
    # identifier normalized (MonetDBUtil.java:301-310)
    assert out.columns == ["weird_col_name_", "s_quotes", "s_pad"]
    rows = out.collect()
    assert rows[0]["s_pad"] == "padded"  # autoTrim default ON
    assert rows[0]["s_quotes"] == 'va"l'  # content preserved exactly
    assert rows[1]["s_pad"] == "x,y\nz".strip()


# --- b5_evolve -----------------------------------------------------------

def test_b5_schema_evolution_adds_column(spark, tmp_path):
    src_dir = tmp_path / "src"
    spec_dict = {
        "warehouse_dir": str(tmp_path / "wh"),
        "sources": {"_default": {"format": "parquet", "path": str(src_dir)}},
        "tables": {"t": {"from_table": "ev"}},
    }
    # v1: (id, a)
    spark.createDataFrame([(1, "x")], "id long, a string").write.mode("overwrite").parquet(
        str(src_dir / "ev.parquet")
    )
    engine = CopyEngine(spark, load_spec(spec_dict))
    engine.do_copy(load_date=datetime(2024, 1, 1))
    # v2: source gains b (MonetDBUtil.java:339-394 ADD COLUMN analog)
    spark.createDataFrame([(2, "y", 7)], "id long, a string, b int").write.mode(
        "overwrite"
    ).parquet(str(src_dir / "ev.parquet"))
    engine.do_copy(load_date=datetime(2024, 1, 2))
    out = engine.sql("SELECT * FROM ev ORDER BY id")
    assert out.columns == ["id", "a", "b"]
    assert [r["b"] for r in out.collect()] == [7]


def test_b5_removed_column_kept_as_null(spark, tmp_path):
    src_dir = tmp_path / "src"
    spec_dict = {
        "warehouse_dir": str(tmp_path / "wh"),
        "sources": {"_default": {"format": "parquet", "path": str(src_dir)}},
        "tables": {"t": {"from_table": "ev"}},
    }
    spark.createDataFrame([(1, "x")], "id long, a string").write.mode("overwrite").parquet(
        str(src_dir / "ev.parquet")
    )
    engine = CopyEngine(spark, load_spec(spec_dict))
    engine.do_copy(load_date=datetime(2024, 1, 1))
    # source LOSES column a: published view must keep it (as NULL)
    spark.createDataFrame([(2,)], "id long").write.mode("overwrite").parquet(
        str(src_dir / "ev.parquet")
    )
    engine.do_copy(load_date=datetime(2024, 1, 2))
    out = engine.sql("SELECT * FROM ev")
    assert out.columns == ["id", "a"]
    assert out.collect()[0]["a"] is None


def test_evolve_to_union_type_conflict(spark):
    published = T.StructType([T.StructField("x", T.LongType())])
    df = spark.createDataFrame([("s",)], "x string")
    with pytest.raises(SchemaEvolutionError, match="retyping"):
        evolve_to_union(df, published)


def test_notify_hook_called(spark, tmp_path):
    spec = load_spec(
        {
            "warehouse_dir": str(tmp_path / "wh"),
            "sources": {"_default": {"format": "parquet", "path": str(tmp_path)}},
            "tables": {"t": {"from_table": "missing_table"}},
        }
    )
    engine = CopyEngine(spark, spec)
    seen = []
    assert engine.run(notify=seen.append) == 1
    assert len(seen) == 1 and isinstance(seen[0], Exception)


def test_load_table_handles_legacy_nanos_events(spark, tmp_path):
    """Older driver fixtures persist events.ts as parquet TIMESTAMP(NANOS),
    which Spark (nanosAsLong) surfaces as an epoch-nanos LONG; catalog
    dispatch must rebuild a session TIMESTAMP with exact integer ns->us
    truncation (catalog.py load_table bigint branch — keep BOTH branches,
    the fixture type varies by generation)."""
    from pyspark.sql import functions as F

    from mssql2monetdb_spark.catalog import load_table

    src = load_table(spark, "/root/testdata/sf0.001", "events")
    as_nanos = src.select(
        "event_id",
        (F.unix_micros(F.col("ts")) * F.lit(1000) + F.lit(999)).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    out = str(tmp_path / "fixtures")
    as_nanos.write.parquet(f"{out}/events.parquet")

    got = load_table(spark, out, "events")
    assert dict(got.dtypes)["ts"] == "timestamp"
    # +999 ns must floor away: values equal the original micro timestamps
    orig = {r["event_id"]: r["ts"] for r in src.select("event_id", "ts").collect()}
    back = {r["event_id"]: r["ts"] for r in got.select("event_id", "ts").collect()}
    assert back == orig
