"""Runtime-filtering evidence: dynamic partition pruning and runtime bloom
filters are the two Catalyst mechanisms that shrink a 100 TB scan/shuffle at
execution time, after static pushdown has done what it can. Neither shows up
in the sf-fixture query corpus (single-file parquet, broadcast-sized dims),
so these tests construct the conditions deliberately and pin that the
mechanism actually engages — the at-scale claim is the mechanism, and a
silent config regression would cost a full fact-table scan per query.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@contextlib.contextmanager
def _confs(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    try:
        for k, v in kv.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_engages_on_partitioned_fact(spark, tmp_path):
    """A fact table partitioned on order year, joined to a dimension with a
    selective filter, must plan a dynamicpruning subquery on the partition
    column — at 100 TB this is the difference between scanning 7 years and
    scanning 1. (The sf fixtures are single parquet files, so DPP can never
    fire on the query corpus; this pins the mechanism itself.)"""
    fact_dir = str(tmp_path / "orders_by_year")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    (
        orders.withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(fact_dir)
    )
    fact = spark.read.parquet(fact_dir)
    # dimension: one row per year with an attribute to filter on
    dim = (
        fact.select("o_year")
        .distinct()
        .withColumn("is_target", F.col("o_year") % 3 == 0)
    )
    joined = fact.join(dim.filter("is_target"), "o_year").groupBy("o_year").count()
    plan = _explain(joined)
    assert "dynamicpruning" in plan.lower(), plan
    # and the pruning lands in the partition filters of the fact scan
    assert "PartitionFilters" in plan


def test_runtime_bloom_filter_prunes_shuffle_join_probe(spark):
    """With broadcast disabled (fact-to-fact shape), a selective filter on
    one join side must inject a bloom filter on the probe side
    (bloom_filter_agg / might_contain in the plan), pruning shuffle input
    before the exchange. Thresholds are lowered to fixture scale — at real
    scale the defaults (10 MB creation side) gate the same mechanism."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    with _confs(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
        },
    ):
        sel = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
        joined = li.join(sel, li.l_orderkey == sel.o_orderkey).groupBy("l_returnflag").count()
        plan = _explain(joined)
    assert "might_contain" in plan or "bloom_filter" in plan.lower(), plan
