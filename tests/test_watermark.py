"""Watermark trigger decision table (CopyTool.java:332-477) + state store."""

from __future__ import annotations

from datetime import date, datetime

import pytest

from mssql2monetdb_spark.engine.watermark import (
    Watermark,
    WatermarkStore,
    has_new_data,
    probe_max,
)


def test_probe_types(spark):
    df = spark.createDataFrame(
        [(1, date(2024, 1, 1), datetime(2024, 1, 1, 12, 0))], ["i", "d", "ts"]
    )
    assert probe_max(df, "i") == Watermark(1, "bigint")
    assert probe_max(df, "d") == Watermark(date(2024, 1, 1), "date")
    assert probe_max(df, "ts") == Watermark(datetime(2024, 1, 1, 12, 0), "timestamp")


def test_probe_empty_is_none(spark):
    df = spark.createDataFrame([], "i long")
    assert probe_max(df, "i") is None


def test_probe_unsupported_type(spark):
    df = spark.createDataFrame([("x",)], ["s"])
    with pytest.raises(TypeError, match="unsupported"):
        probe_max(df, "s")


# --- the decision table (fail-open rules) -------------------------------

def test_no_probe_fails_open():
    assert has_new_data(None, Watermark(5, "bigint")) is True  # CopyTool.java:352


def test_no_state_runs():
    assert has_new_data(Watermark(5, "bigint"), None) is True  # 420-427


def test_type_mismatch_fails_open():
    assert has_new_data(Watermark(5, "bigint"), Watermark(date(2024, 1, 1), "date")) is True


def test_typed_compare():
    assert has_new_data(Watermark(6, "bigint"), Watermark(5, "bigint")) is True
    assert has_new_data(Watermark(5, "bigint"), Watermark(5, "bigint")) is False
    assert has_new_data(Watermark(4, "bigint"), Watermark(5, "bigint")) is False
    assert (
        has_new_data(
            Watermark(datetime(2024, 1, 2), "timestamp"),
            Watermark(datetime(2024, 1, 1), "timestamp"),
        )
        is True
    )
    assert (
        has_new_data(
            Watermark(date(2024, 1, 1), "date"), Watermark(date(2024, 1, 1), "date")
        )
        is False
    )


# --- state store --------------------------------------------------------

def test_store_roundtrip(tmp_path):
    store = WatermarkStore(str(tmp_path))
    for wm in (
        Watermark(42, "bigint"),
        Watermark(date(2024, 2, 29), "date"),
        Watermark(datetime(2024, 1, 1, 23, 59, 59, 123456), "timestamp"),
    ):
        store.save("abc123", wm)
        assert store.load("abc123") == wm


def test_store_checksum_mismatch_invalidates(tmp_path):
    # config change invalidates trigger state (CopyTool.java:434-438)
    store = WatermarkStore(str(tmp_path))
    store.save("abc123", Watermark(42, "bigint"))
    assert store.load("other_checksum") is None


def test_store_corrupt_file_fails_open(tmp_path):
    store = WatermarkStore(str(tmp_path))
    path = tmp_path / "job-abc_lastrun.json"
    path.write_text("{not json")
    assert store.load("abc") is None
