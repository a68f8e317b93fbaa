"""Registry hygiene gate.

The driver's correctness harness has two hard constraints discovered in
round 1 (CORRECTNESS_r01.json):

1. It verifies only the FIRST 50 entries of ``queries()`` in registration
   order — so the curated ``GATE_PRIORITY`` window must keep covering every
   capability family, or queries silently lose their verdicts.
2. Its order-insensitive value hash canonicalizes rows via pandas
   ``sort_values``, which cannot hash array/struct/map-typed cells
   (``TypeError: unhashable numpy.ndarray`` — the round-1 ``agg_array_collect``
   failure). Every registry query must therefore return scalar columns only.
"""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import types as T

from mssql2monetdb_spark.queries import (
    GATE_PRIORITY,
    GATE_WINDOW,
    NEXT_WINDOW_QUEUE,
    REGISTRY,
)

ALL_NAMES = list(REGISTRY.keys())

# Capability families that must each hold a driver verdict — a
# representative inside the current window OR a green row on record from a
# previous round (the round-3+ rotation: long-green families rotate out to
# free slots for never-verified queries). Prefix-based so new queries join
# their family automatically.
FAMILY_PREFIXES = [
    "agg_",
    "join_",
    "window_",
    "subquery_",
    "cte_",
    "fn_",
    "dedup_",
    "ann_",
    "text_",
    "multimodal_",
    "rollup_",
    "pipeline_",
    "stream_",
    "pack_",
    "split_",
]


def test_gate_priority_is_the_window_prefix():
    assert len(GATE_PRIORITY) == GATE_WINDOW
    assert ALL_NAMES[:GATE_WINDOW] == GATE_PRIORITY
    assert len(set(GATE_PRIORITY)) == GATE_WINDOW


def test_every_capability_family_verified_or_inside_window():
    covered = set(ALL_NAMES[:GATE_WINDOW]) | _driver_green_names()
    missing = [
        prefix
        for prefix in FAMILY_PREFIXES
        if not any(name.startswith(prefix) for name in covered)
    ]
    assert not missing, f"families with no driver verdict and no window slot: {missing}"


def _driver_green_names() -> set[str]:
    """Names with a recorded green driver verdict in any CORRECTNESS_r*.json
    — these may rotate behind the window without losing their verdict."""
    import json

    green: set[str] = set()
    for path in sorted(Path(__file__).resolve().parent.parent.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(path.read_text()).items():
            if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                green.add(name)
    return green


def test_all_extension_operators_verified_or_inside_window():
    """Every §2C / LLM-pipeline operator must hold a verification slot —
    a window slot now, a green verdict on record from a previous round, or
    a place in the documented NEXT_WINDOW_QUEUE (new additions waiting for
    the next rotation)."""
    window = set(ALL_NAMES[:GATE_WINDOW])
    extension_prefixes = ("dedup_", "ann_", "text_", "multimodal_", "rollup_", "pipeline_", "stream_")
    green = _driver_green_names()
    outside = [
        name
        for name in ALL_NAMES
        if name.startswith(extension_prefixes)
        and name not in window
        and name not in green
        and name not in NEXT_WINDOW_QUEUE
    ]
    assert not outside, (
        f"extension operators with no driver verdict and no window slot: {outside}"
    )


def test_next_window_queue_names_exist_and_fit():
    """The round-4 queue must reference live registry names (renames can't
    silently drop a planned verification). The FIRST GATE_WINDOW entries
    define the round-4 window; entries beyond that are the documented
    round-5 rollover (bounded so the backlog can't silently balloon)."""
    missing = [n for n in NEXT_WINDOW_QUEUE if n not in REGISTRY]
    assert not missing, f"queued names not in registry: {missing}"
    assert len(NEXT_WINDOW_QUEUE) == len(set(NEXT_WINDOW_QUEUE))
    assert len(NEXT_WINDOW_QUEUE) <= 2 * GATE_WINDOW


def _atomic(dt: T.DataType) -> bool:
    return not isinstance(dt, (T.ArrayType, T.MapType, T.StructType))


@pytest.mark.parametrize("name", ALL_NAMES)
def test_query_returns_scalar_columns_only(name, spark, sf_dir):
    schema = REGISTRY[name].build(spark, sf_dir).schema
    bad = [f.name for f in schema.fields if not _atomic(f.dataType)]
    assert not bad, (
        f"{name} returns non-scalar columns {bad}; the driver's value hash "
        "cannot canonicalize them — stringify with array_join(sort_array(...))"
    )


def test_coverage_totals_match_registry():
    """COVERAGE.md's totals line is regenerated from the registry, not by
    hand (it drifted once in round 1)."""
    n_queries = len(REGISTRY)
    n_oracles = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    text = (Path(__file__).resolve().parent.parent / "COVERAGE.md").read_text()
    expected = f"**Totals: {n_queries} registry queries, {n_oracles} with DuckDB oracles**"
    assert expected in text, (
        f"COVERAGE.md totals drifted — expected the line {expected!r} "
        f"(registry: {n_queries} queries, {n_oracles} oracles)"
    )


def test_window_oracles_non_vacuous():
    """Every gate-window oracle must return rows at sf0.01 — a 0-row result
    makes the green verdict vacuous (the round-1 join_anti lesson). Runs on
    DuckDB only, so it's cheap enough to gate every commit."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'")
    empty = []
    for name in GATE_PRIORITY:
        oracle = REGISTRY[name].oracle
        if oracle is None:
            continue
        if con.sql(f"SELECT COUNT(*) FROM ({oracle})").fetchone()[0] == 0:
            empty.append(name)
    assert not empty, f"vacuous (0-row) window oracles at sf0.01: {empty}"


def test_every_window_query_has_an_oracle():
    """A slot spent on a rows-only query wastes verification budget — keep
    oracle-less queries (if any ever return) behind the window."""
    missing = [n for n in GATE_PRIORITY if REGISTRY[n].oracle is None]
    assert not missing, f"window queries without oracle SQL: {missing}"
