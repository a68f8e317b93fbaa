"""Do the lineitem-fact bench queries gain from spreading the unsplittable
single-row-group scan before their heavy map-side work (broadcast-join
probes + DECIMAL partial aggregation)?

Variants: current builder vs the same shape with parallelized() applied to
the pruned fact input. Interleaved min-of-N; identical results asserted
via sorted collect on first rep.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mssql2monetdb_spark.session import get_spark  # noqa: E402
from mssql2monetdb_spark.catalog import Tables, parallelized  # noqa: E402
from mssql2monetdb_spark.queries.helpers import dsum  # noqa: E402

SF = "/root/testdata/sf0.1"
N = 5


def force(df):
    df.write.mode("overwrite").format("noop").save()


def q3(spark, spread: bool):
    t = Tables(spark, SF)
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ords = t.orders.filter(F.col("o_orderdate") < cutoff).select("o_orderkey", "o_custkey", "o_orderdate")
    li = t.lineitem.filter(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    if spread:
        li = parallelized(li)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(ords, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
    )


def q5(spark, spread: bool):
    t = Tables(spark, SF)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    li = t.lineitem
    if spread:
        li = parallelized(li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"))
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t.supplier),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def main() -> int:
    spark = get_spark("factside-repart-probe")
    variants = {
        "q3_cur": lambda: q3(spark, False),
        "q3_spread": lambda: q3(spark, True),
        "q5_cur": lambda: q5(spark, False),
        "q5_spread": lambda: q5(spark, True),
    }
    # identity check
    assert [tuple(r) for r in q3(spark, False).collect()] == [tuple(r) for r in q3(spark, True).collect()]
    assert [tuple(r) for r in q5(spark, False).collect()] == [tuple(r) for r in q5(spark, True).collect()]
    print("IDENTICAL results (q3, q5)")
    for fn in variants.values():
        force(fn())
    times = {k: [] for k in variants}
    for _ in range(N):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            force(fn())
            times[k].append(time.perf_counter() - t0)
    for k, v in times.items():
        print(f"{k:10s} min {min(v):.3f}  runs {[round(x, 3) for x in v]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
