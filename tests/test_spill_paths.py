"""Results must be identical when operators spill instead of staying
in memory.

Local fixtures fit comfortably in executor memory, so the spill branches
of WindowExec / SortMergeJoinExec / ObjectHashAggregate never execute in
a normal test run — yet at 100 TB a partition outgrowing execution
memory is routine, and a spilled operator that reorders or drops rows
would corrupt results only in production.  Dropping the internal buffer
thresholds to toy sizes forces the spill / sort-based-fallback path on
every partition regardless of data size.

The full-registry version of this check is the --force-spill sweep in
``scripts/cluster_mode_probe.py`` (recorded in SCALE.md); this pins the
fast regression subset: one query per spilling operator class.
"""

from __future__ import annotations

import pytest

from mssql2monetdb_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

SPILL_CONFS = {
    "spark.sql.windowExec.buffer.in.memory.threshold": "64",
    "spark.sql.windowExec.buffer.spill.threshold": "64",
    "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold": "64",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold": "64",
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": "16",
}

QUERIES = [
    "window_row_number",  # WindowExec partition buffer spill
    "window_running_sum",  # frame-sensitive window over spilled buffer
    "join_inner",  # SortMergeJoin match-buffer spill
    "agg_array_collect",  # ObjectHashAggregate sort-based fallback
    "agg_string_agg",  # ordered collect under fallback aggregation
]


@pytest.mark.parametrize("name", QUERIES)
def test_result_identical_under_forced_spill(spark, name):
    normal = [tuple(r) for r in REGISTRY[name].build(spark, SF).collect()]
    saved = {k: spark.conf.get(k) for k in SPILL_CONFS}
    try:
        for k, v in SPILL_CONFS.items():
            spark.conf.set(k, v)
        spilled = [tuple(r) for r in REGISTRY[name].build(spark, SF).collect()]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert normal == spilled and len(normal) > 0
