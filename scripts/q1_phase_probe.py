"""agg_tpch_q1 phase breakdown at sf0.1: what does the 1.1 s buy?

 a) bare 7-col scan of lineitem -> noop       (decode floor, single task)
 b) current q1                                 (single-task partial agg)
 c) q1 with a round-robin repartition first    (parallel decimal agg,
                                                pays one full exchange)
 d) q1 with DOUBLE sums instead of DECIMAL     (diagnostic only — shows
                                                the decimal tax; NOT a
                                                candidate, oracle-pinned)
Interleaved min-of-N.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mssql2monetdb_spark.session import get_spark  # noqa: E402
from mssql2monetdb_spark.catalog import Tables, parallelized  # noqa: E402
from mssql2monetdb_spark.queries.helpers import dsum, davg  # noqa: E402

SF = "/root/testdata/sf0.1"
N = 5


def force(df):
    df.write.mode("overwrite").format("noop").save()


def q1(li):
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q1_double(li):
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("a"),
            F.sum("l_extendedprice").alias("b"),
            F.sum(disc_price).alias("c"),
            F.avg("l_quantity").alias("d"),
            F.count(F.lit(1)).alias("e"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def main() -> int:
    spark = get_spark("q1-phase-probe")
    cut = F.lit("1998-09-02 00:00:00").cast("timestamp")
    cols = [
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    ]

    def li():
        return Tables(spark, SF).lineitem.filter(F.col("l_shipdate") <= cut)

    variants = {
        "scan_only": lambda: Tables(spark, SF).lineitem.select(*cols),
        "q1_current": lambda: q1(li()),
        "q1_repart": lambda: q1(parallelized(li().select(*cols))),
        "q1_double_diag": lambda: q1_double(li()),
    }
    # warmup
    for fn in variants.values():
        force(fn())

    times = {k: [] for k in variants}
    for _ in range(N):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            force(fn())
            times[k].append(time.perf_counter() - t0)
    for k, v in times.items():
        print(f"{k:18s} min {min(v):.3f}  runs {[round(x, 3) for x in v]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
