"""Scheduler interval grammar + loop semantics (CopyTool.java:121-160,
CopyToolConfig.java:574-642)."""

from __future__ import annotations

import pytest

from mssql2monetdb_spark.engine.scheduler import parse_interval, run_scheduled


@pytest.mark.parametrize(
    "text,seconds",
    [
        ("every 1 minute", 60),
        ("every 5 minutes", 300),
        ("every 2 hours", 7200),
        ("every 1 day", 86400),
        ("EVERY 3 MINUTES", 180),
        ("90", 90),
        (45, 45),
    ],
)
def test_parse_interval(text, seconds):
    assert parse_interval(text) == seconds


def test_parse_interval_invalid():
    with pytest.raises(ValueError, match="invalid scheduler interval"):
        parse_interval("whenever")


def test_run_scheduled_counts_and_sleeps():
    sleeps: list[float] = []
    runs: list[int] = []
    n = run_scheduled(
        lambda: runs.append(1),
        "every 3 minutes",
        max_runs=3,
        sleep=sleeps.append,
    )
    assert n == 3 and len(runs) == 3
    # 180 s interval sleeps in <=60 s increments (CopyTool.java:144-156);
    # two gaps between three runs
    assert sleeps == [60, 60, 60, 60, 60, 60]


def test_run_scheduled_swallows_exceptions():
    # per-iteration failures are logged, never fatal (CopyTool.java:131-141)
    calls: list[int] = []

    def flaky():
        calls.append(1)
        raise RuntimeError("boom")

    n = run_scheduled(flaky, 0, max_runs=2, sleep=lambda s: None)
    assert n == 2 and len(calls) == 2
