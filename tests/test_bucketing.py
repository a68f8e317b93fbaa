"""Bucketed tables: the join over two identically-bucketed tables must plan
WITHOUT a shuffle Exchange on either side."""

from __future__ import annotations

import contextlib
import io

from mssql2monetdb_spark.catalog import load_table
from mssql2monetdb_spark.engine.bucketing import bucketed_join, write_bucketed

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    import shutil

    # clean any previous run's managed-table locations
    for t in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"), "b_orders",
        bucket_col="custkey", n_buckets=8,
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"), "b_customer",
        bucket_col="custkey", n_buckets=8,
    )
    # the fixture tables are small enough to broadcast, which bypasses the
    # bucketed path entirely; disable broadcast to exercise the co-located
    # sort-merge join (the plan shape the 100 TB case would take)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_customer", "custkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout replaces the shuffle
        # and the result is correct
        plain = orders.join(customer, orders.o_custkey == customer.c_custkey).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
