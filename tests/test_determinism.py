"""Partition-count invariance: the determinism discipline (DECIMAL sums,
fixed-order folds, total-order sorts — registry docstring) claims results
are independent of physical parallelism. At cluster scale the partition
count is whatever the data size dictates, so any query whose output shifts
with spark.sql.shuffle.partitions would produce different hashes on a
1000-executor run than on local[32]. Pin it: representative aggregate /
window / dedup / sketch queries must collect IDENTICAL rows under 5 and 32
shuffle partitions.
"""

from __future__ import annotations

import pytest

from mssql2monetdb_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

QUERIES = [
    "agg_tpch_q1",  # decimal-sum aggregate
    "agg_variance_exact",  # sum-of-squares moments
    "window_running_sum",  # ordered prefix aggregate
    "dedup_minhash_lsh",  # multi-stage shuffle pipeline
    "sketch_count_min",  # sketch build + probe
    "sketch_hll_distinct",  # register build + fixed-order fold
    "order_curriculum_stages",  # broadcast-stats bucketing
]


def _rows(spark, name):
    return [tuple(r) for r in REGISTRY[name].build(spark, SF).collect()]


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_shuffle_partitions(spark, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        few = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        many = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert few == many and len(few) > 0
