"""Extended relational corpus: more TPC-H-shaped composites, advanced window
functions, pivot/conditional aggregation, string aggregation, percentiles,
grouping sets, deterministic sampling, and the as-of join.

Same determinism discipline as relational.py (see registry docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Tables
from ..operators.asof import asof_join
from ..operators.asof import asof_join_cogroup as asof_join_cogroup_op
from .helpers import DEC, dsum, oracle_dsum, sql_with_views
from .registry import query


# ---------------------------------------------------------------------------
# TPC-H-shaped composites
# ---------------------------------------------------------------------------

@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
        SELECT {oracle_dsum('l_extendedprice * l_discount', 'revenue')}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter+aggregate — every predicate pushes to the scan."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))


@query(
    "tpch_q4_order_priority",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS -> left-semi join, then count by priority.

    (The fixture lacks commit/receipt dates; the correlated predicate uses
    l_shipdate > o_orderdate — same plan shape.)
    """
    t = Tables(spark, sf_dir)
    o = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = t.lineitem.select("l_orderkey", "l_shipdate")
    semi = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
        SELECT c_custkey, c_name, n_name,
               {oracle_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 4-way join + agg + top-20 (nation broadcast)."""
    t = Tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            t.lineitem.filter(F.col("l_returnflag") == "R").select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(rev, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q12_conditional_agg",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def tpch_q12_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + CASE-WHEN conditional counting."""
    t = Tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.orders.join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "tpch_q14_promo_ratio",
    oracle=f"""
        SELECT 100.0 * (
            SELECT {oracle_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 'x').replace(' AS x', '')}
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ) / (
            SELECT {oracle_dsum('l_extendedprice * (1 - l_discount)', 'y').replace(' AS y', '')}
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ) AS promo_revenue_pct
    """,
)
def tpch_q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of conditional to total revenue (part broadcast)."""
    t = Tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    joined = t.lineitem.join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
    agg = joined.agg(
        dsum(promo, "promo_rev"),
        dsum(rev, "total_rev"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias("promo_revenue_pct")
    )


@query(
    "tpch_q18_large_orders",
    bench=True,
    oracle=f"""
        SELECT c_custkey, o_orderkey, o_orderdate,
               {oracle_dsum('l_quantity', 'total_qty')}
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY c_custkey, o_orderkey, o_orderdate
        HAVING SUM(CAST(l_quantity AS DECIMAL(30,8))) > 150
        ORDER BY total_qty DESC, o_orderkey LIMIT 20
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: agg + HAVING on the aggregate + top-k.

    Aggregates lineitem per order FIRST and applies the HAVING before any
    join: the group key is functionally determined by o_orderkey (orders
    and customer are key-unique), so joining before aggregating is pure
    waste — the fact table would ride through two joins only to collapse
    to the same per-order sums. Post-HAVING survivors are rare, so both
    subsequent joins broadcast under AQE; the fact is touched by exactly
    one scan + one keyed aggregate. Measured ~25% faster at sf0.1, and at
    100 TB the difference is two avoided fact-sized shuffles.

    The HAVING filter and the output column share ONE decimal sum (the
    exact value is kept, filtered, then cast to double) — an earlier
    draft ran dsum alongside a second differently-typed decimal sum for
    the filter, and when the edge-corpus hardening widened dsum's cast
    to DECIMAL(30,8) the two casts stopped sharing a subexpression,
    doubling per-row cast+sum work (measured +40% on this agg-bound
    query; the single-sum form measures at parity with the pre-widening
    code).
    """
    t = Tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_qty_dec"))
        .filter(F.col("_qty_dec") > 150)
        .select("l_orderkey", F.col("_qty_dec").cast("double").alias("total_qty"))
    )
    return (
        big.join(t.orders, big.l_orderkey == t.orders.o_orderkey)
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Advanced windows / aggregation surface
# ---------------------------------------------------------------------------

@query(
    "window_percent_cume",
    oracle="""
        SELECT c_custkey,
               PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) AS pct_rank,
               CUME_DIST()    OVER (ORDER BY c_acctbal, c_custkey) AS cume,
               NTH_VALUE(c_custkey, 2) OVER (
                   PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_in_nation
        FROM customer ORDER BY c_custkey
    """,
)
def window_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / nth_value analytic windows. The
    unpartitioned PERCENT_RANK/CUME_DIST ordering is those functions'
    declared SQL semantics (a single global window partition); at 100 TB
    compute ranks against a bounded value histogram instead (the
    two-pass shape of the exact-quantile rewrite in extensions.py)."""
    t = Tables(spark, sf_dir)
    w_global = Window.orderBy("c_acctbal", "c_custkey")
    w_nation = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.customer.select(
        "c_custkey",
        F.percent_rank().over(w_global).alias("pct_rank"),
        F.cume_dist().over(w_global).alias("cume"),
        F.nth_value("c_custkey", 2).over(w_nation).alias("second_in_nation"),
    ).orderBy("c_custkey")


@query(
    "window_moving_avg",
    oracle="""
        SELECT o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,8))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / COUNT(*) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg_price
        FROM orders ORDER BY o_orderkey
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average via exact-decimal window sum / window count."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return t.orders.select(
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast("decimal(24,8)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg_price"),
    ).orderBy("o_orderkey")


@query(
    "agg_string_agg",
    oracle="""
        SELECT n_name, string_agg(c_name, ',' ORDER BY c_name) AS members, COUNT(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_custkey < 100
        GROUP BY n_name ORDER BY n_name
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG) — sort_array(collect_list)."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.filter(F.col("c_custkey") < 100)
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_name")), ",").alias("members"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_name")
    )


@query(
    "agg_pivot",
    oracle="""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (explicit value list -> no extra distinct-values job)."""
    t = Tables(spark, sf_dir)
    p = (
        t.orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return (
        p.select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("status_f"),
            F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("status_o"),
            F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("status_p"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_percentiles",
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS q25,
               quantile_cont(l_quantity, 0.50) AS median,
               quantile_cont(l_quantity, 0.75) AS q75
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (dyadic quantiles of integer-valued
    doubles — interpolation is exact in both engines)."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.25).alias("q25"),
            F.percentile("l_quantity", 0.50).alias("median"),
            F.percentile("l_quantity", 0.75).alias("q75"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_grouping_sets",
    oracle="""
        SELECT COALESCE(o_orderpriority, '(all)') AS priority,
               COALESCE(o_orderstatus, '(all)') AS status,
               COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY priority, status
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SQL surface; rollup/cube are special cases)."""
    t = Tables(spark, sf_dir)
    return sql_with_views(
        spark,
        """
        SELECT COALESCE(o_orderpriority, '(all)') AS priority,
               COALESCE(o_orderstatus, '(all)') AS status,
               COUNT(*) AS n
        FROM {orders}
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY priority, status
        """,
        orders=t.orders,
    )


# ---------------------------------------------------------------------------
# Deterministic sampling + as-of join
# ---------------------------------------------------------------------------

@query(
    "sample_deterministic_hash",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE (('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT) % 10 = 0
        ORDER BY o_orderkey
    """,
)
def sample_deterministic_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic hash sample — reproducible across engines and
    runs, unlike rng-based TABLESAMPLE (the scale-friendly way to sample:
    pure filter, pushes down, no shuffle)."""
    t = Tables(spark, sf_dir)
    h = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10).cast("bigint")
    return (
        t.orders.filter(h % 10 == 0)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "asof_join_events",
    bench=True,
    oracle="""
        SELECT l.event_id, l.ts, l.user_id,
               r.ts AS matched_ts,
               r.event_id AS matched_event_id,
               r.value AS matched_value
        FROM (SELECT * FROM events WHERE event_type = 'error') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        ORDER BY l.event_id
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event matched to the user's most recent
    preceding purchase (operators/asof.py — union + carry-forward window,
    one shuffle; DuckDB's native ASOF JOIN is the oracle)."""
    t = Tables(spark, sf_dir)
    events = t.events
    errors = events.filter(F.col("event_type") == "error").select("event_id", "ts", "user_id")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    return asof_join(
        errors,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
    ).orderBy("event_id")


@query(
    "agg_variance_exact",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n,
               (CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,8))) AS DOUBLE)
                - CAST(SUM(CAST(l_quantity AS DECIMAL(24,8))) AS DOUBLE)
                  * CAST(SUM(CAST(l_quantity AS DECIMAL(24,8))) AS DOUBLE) / COUNT(*))
               / NULLIF(COUNT(*) - 1, 0) AS var_qty,
               SQRT((CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,8))) AS DOUBLE)
                - CAST(SUM(CAST(l_quantity AS DECIMAL(24,8))) AS DOUBLE)
                  * CAST(SUM(CAST(l_quantity AS DECIMAL(24,8))) AS DOUBLE) / COUNT(*))
               / NULLIF(COUNT(*) - 1, 0)) AS stddev_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev via exact decimal sums (sum-of-squares form).

    Built-in var_samp/stddev use streaming moment updates whose FP order
    differs per engine/partitioning; the exact-sum formulation is
    deterministic everywhere (quantities are integral: sums are exact).
    """
    t = Tables(spark, sf_dir)
    DEC = "decimal(24,8)"
    s = F.sum(F.col("l_quantity").cast(DEC)).cast("double")
    s2 = F.sum((F.col("l_quantity") * F.col("l_quantity")).cast(DEC)).cast("double")
    n = F.count(F.lit(1))
    # NULL for singleton groups (SQL var_samp convention) — a bare n-1
    # divisor is an ANSI DIVIDE_BY_ZERO crash on any group with one row
    # (found by scripts/edge_corpus_probe.py)
    var = (s2 - s * s / n) / F.nullif((n - F.lit(1)).cast("bigint"), F.lit(0).cast("bigint"))
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(n.alias("n"), var.alias("var_qty"), F.sqrt(var).alias("stddev_qty"))
        .orderBy("l_returnflag")
    )


@query(
    "agg_array_collect",
    oracle="""
        SELECT n_regionkey,
               array_to_string(list_sort(list_distinct(list(n_name))), ',') AS nations,
               CAST(LEN(list_distinct(list(n_name))) AS INTEGER) AS n_nations
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def agg_array_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation (collect_set) made deterministic by sorting; the
    collected set is emitted as a joined string because the driver's
    order-insensitive value hash cannot canonicalize array-typed columns."""
    t = Tables(spark, sf_dir)
    return (
        t.nation.groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations"),
            F.size(F.collect_set("n_name")).alias("n_nations"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "agg_mode_deterministic",
    oracle="""
        SELECT c_mktsegment, o_orderpriority AS mode_priority, cnt FROM (
            SELECT c_mktsegment, o_orderpriority, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                      ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY c_mktsegment, o_orderpriority
        ) WHERE rn = 1 ORDER BY c_mktsegment
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode with a deterministic tie-break (count desc, then value) — the
    built-in mode() breaks ties arbitrarily, so it is rebuilt as
    agg + rank-1 window."""
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    counts = (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("cnt").desc(), F.col("o_orderpriority"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_mktsegment", F.col("o_orderpriority").alias("mode_priority"), "cnt")
        .orderBy("c_mktsegment")
    )


@query(
    "subquery_not_in_nulls",
    oracle="""
        SELECT 'with_nulls' AS arm, c_custkey FROM customer
        WHERE c_custkey NOT IN (
            SELECT NULLIF(o_custkey, 3) FROM orders WHERE o_custkey < 50)
        UNION ALL
        SELECT 'no_nulls' AS arm, c_custkey FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders WHERE o_custkey < 50 AND o_custkey <> 3)
        ORDER BY arm, c_custkey
    """,
)
def subquery_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN three-valued-logic trap, asserted from both sides: the
    null-containing arm must be EMPTY (any NULL in the subquery makes NOT IN
    never-true — a null-naive engine would emit rows here and fail the row
    count), while the equivalent null-free arm is non-empty, so the green
    verdict is never vacuous."""
    t = Tables(spark, sf_dir)
    return sql_with_views(
        spark,
        """
        SELECT 'with_nulls' AS arm, c_custkey FROM {customer}
        WHERE c_custkey NOT IN (
            SELECT NULLIF(o_custkey, 3) FROM {orders} WHERE o_custkey < 50)
        UNION ALL
        SELECT 'no_nulls' AS arm, c_custkey FROM {customer}
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM {orders} WHERE o_custkey < 50 AND o_custkey <> 3)
        ORDER BY arm, c_custkey
        """,
        customer=t.customer,
        orders=t.orders,
    )


@query(
    "cte_with_clause",
    oracle=f"""
        WITH nation_rev AS (
            SELECT n_name,
                   {oracle_dsum('o_totalprice', 'total_rev')},
                   COUNT(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        )
        SELECT n_name, total_rev, n_orders
        FROM nation_rev
        WHERE total_rev > (SELECT CAST(SUM(CAST(total_rev AS DECIMAL(24,8))) AS DOUBLE)
                           / COUNT(*) FROM nation_rev)
        ORDER BY total_rev DESC, n_name
    """,
)
def cte_with_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE (WITH clause) referenced twice — TPC-H Q15 shape: compute a
    per-group revenue relation once, filter it against its own average."""
    t = Tables(spark, sf_dir)
    return sql_with_views(
        spark,
        """
        WITH nation_rev AS (
            SELECT n_name,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(24,8))) AS DOUBLE) AS total_rev,
                   COUNT(*) AS n_orders
            FROM {orders}
            JOIN {customer} ON o_custkey = c_custkey
            JOIN {nation} ON c_nationkey = n_nationkey
            GROUP BY n_name
        )
        SELECT n_name, total_rev, n_orders
        FROM nation_rev
        WHERE total_rev > (SELECT CAST(SUM(CAST(total_rev AS DECIMAL(24,8))) AS DOUBLE)
                           / COUNT(*) FROM nation_rev)
        ORDER BY total_rev DESC, n_name
        """,
        orders=t.orders,
        customer=t.customer,
        nation=t.nation,
    )


@query(
    "subquery_correlated_min",
    oracle="""
        SELECT s_suppkey, s_name, s_acctbal, s_nationkey
        FROM supplier s1
        WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM supplier s2
                           WHERE s2.s_nationkey = s1.s_nationkey)
        ORDER BY s_nationkey, s_suppkey
    """,
)
def subquery_correlated_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated aggregate subquery (min per group) —
    Catalyst decorrelates to an aggregate + join; doubles pass through
    untouched so the equality is bit-exact in both engines."""
    t = Tables(spark, sf_dir)
    return sql_with_views(
        spark,
        """
        SELECT s_suppkey, s_name, s_acctbal, s_nationkey
        FROM {supplier} s1
        WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM {supplier} s2
                           WHERE s2.s_nationkey = s1.s_nationkey)
        ORDER BY s_nationkey, s_suppkey
        """,
        supplier=t.supplier,
    )


@query(
    "window_range_frame",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
                   PARTITION BY l_returnflag ORDER BY CAST(l_quantity AS BIGINT)
                   RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS qty_range_sum
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber, qty_range_sum
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frame: sums over rows whose quantity lies
    within 5 units below the current row's — frame membership by value, not
    position, so result is deterministic even with duplicate sort keys."""
    t = Tables(spark, sf_dir)
    qty = F.col("l_quantity").cast("bigint")
    w = Window.partitionBy("l_returnflag").orderBy(qty).rangeBetween(-5, Window.currentRow)
    return (
        t.lineitem.select(
            "l_orderkey",
            "l_linenumber",
            F.sum(qty).over(w).cast("bigint").alias("qty_range_sum"),
        )
        .orderBy("l_orderkey", "l_linenumber", "qty_range_sum")
    )


@query(
    "agg_filter_clause",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_total,
               COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER (WHERE ...) clause — per-aggregate predicates in one
    pass (one shuffle, three conditioned counters)."""
    t = Tables(spark, sf_dir)
    return sql_with_views(
        spark,
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_total,
               COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished
        FROM {orders} GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        orders=t.orders,
    )


@query(
    "agg_histogram_bins",
    oracle="""
        SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bin,
               COUNT(*) AS n,
               CAST(MIN(FLOOR(o_totalprice)) AS BIGINT) AS bin_min,
               CAST(MAX(FLOOR(o_totalprice)) AS BIGINT) AS bin_max
        FROM orders GROUP BY 1 ORDER BY bin
    """,
)
def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram binning via floor division (single-pass, map-side combined
    — the building block for distributed quantile sketches)."""
    t = Tables(spark, sf_dir)
    bin_col = F.floor(F.col("o_totalprice") / 50000).cast("bigint")
    return (
        t.orders.groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.floor("o_totalprice")).cast("bigint").alias("bin_min"),
            F.max(F.floor("o_totalprice")).cast("bigint").alias("bin_max"),
        )
        .orderBy("bin")
    )


@query(
    "agg_approx_quantile",
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.5) AS exact_median,
               1 AS within_tolerance
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantile sketch (Greenwald-Khanna). Like
    agg_approx_count_distinct, the sketch value is algorithm-specific, so
    the verifiable contract is the invariant — and it is the sketch's OWN
    guarantee, stated in ranks: the returned element's rank interval
    [r_lt + 1, r_le] must come within n/accuracy (+1 for the element-vs-
    interpolated-midpoint offset) of the target rank 0.5*n. The original
    ±5%-of-exact-VALUE check was not implied by any GK property and fails
    legitimately on small spread-out groups (a 2-row group's approx IS its
    lower element, 3x below the interpolated midpoint —
    scripts/edge_corpus_probe.py); the rank form is tighter on large
    groups and correct on every group size. Both engines return
    (exact median, flag=1); the rank check needs the approx value first,
    so it is a second aggregate over a broadcast join of the tiny
    per-group relation."""
    t = Tables(spark, sf_dir)
    exact = F.percentile("l_extendedprice", 0.5)
    approx = F.percentile_approx("l_extendedprice", 0.5, 100)
    g = t.lineitem.groupBy("l_returnflag").agg(
        exact.alias("exact_median"),
        approx.alias("_approx"),
        F.count(F.lit(1)).cast("double").alias("_n"),
    )
    j = t.lineitem.join(F.broadcast(g), "l_returnflag")
    slack = F.lit(0.01) * F.col("_n") + F.lit(1.0)
    target = F.lit(0.5) * F.col("_n")
    return (
        j.groupBy("l_returnflag", "exact_median", "_n")
        .agg(
            F.sum((F.col("l_extendedprice") <= F.col("_approx")).cast("bigint"))
            .cast("double")
            .alias("_r_le"),
            F.sum((F.col("l_extendedprice") < F.col("_approx")).cast("bigint"))
            .cast("double")
            .alias("_r_lt"),
        )
        .select(
            "l_returnflag",
            "exact_median",
            (
                (F.col("_r_le") >= target - slack) & (F.col("_r_lt") <= target + slack)
            )
            .cast("int")
            .alias("within_tolerance"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_corr_regression",
    oracle="""
        WITH s AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))
                       * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / NULLIF(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0) AS corr_xy,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / CAST(n AS DOUBLE) / CAST(n AS DOUBLE) AS covar_pop,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0) AS slope,
               (CAST(sy AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0)
                    * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS intercept
        FROM s ORDER BY l_returnflag
    """,
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical/regression aggregates (Pearson corr, population
    covariance, least-squares slope/intercept) per return flag.

    Built-in F.corr/F.covar_pop are float aggregates whose result depends
    on partition merge order — they can never hash-match across engines.
    Instead the moment sums accumulate as exact DECIMAL (associative and
    partition-order independent), and the closed-form expressions are
    evaluated on the sums in one fixed double-arithmetic tree replicated
    verbatim in the oracle: +,-,*,/,sqrt are all IEEE exact-rounded, so
    the doubles match bit-for-bit. Same discipline as helpers.dsum
    (oracle-determinism rule: no order-dependent float aggregation)."""
    t = Tables(spark, sf_dir)
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    s = t.lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov_num = nd * sxy - sx * sy
    # a zero-variance group (constant column, or n = 1) has no defined
    # corr/slope: NULLIF instead of a bare divide — ANSI mode crashes the
    # whole job on the 0/0 otherwise (scripts/edge_corpus_probe.py); the
    # decimal sums make a zero variance EXACTLY 0.0, so the guard is sound
    var_x = F.nullif(nd * sxx - sx * sx, F.lit(0.0))
    var_y = F.nullif(nd * syy - sy * sy, F.lit(0.0))
    slope = cov_num / var_x
    return s.select(
        "l_returnflag",
        "n",
        (cov_num / F.nullif(F.sqrt(var_x) * F.sqrt(var_y), F.lit(0.0))).alias("corr_xy"),
        (cov_num / nd / nd).alias("covar_pop"),
        slope.alias("slope"),
        ((sy - slope * sx) / nd).alias("intercept"),
    ).orderBy("l_returnflag")


@query(
    "window_first_last_nth",
    oracle="""
        SELECT o_orderkey, o_custkey,
               FIRST_VALUE(o_orderkey) OVER w AS first_order,
               LAST_VALUE(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS last_order,
               NTH_VALUE(o_orderkey, 2) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS second_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_orderkey
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sensitive value window functions: first/last/nth order per
    customer. LAST_VALUE and NTH_VALUE use an explicit unbounded frame —
    the default frame ends at CURRENT ROW, a classic cross-engine trap;
    ordering includes the key so ties are deterministic."""
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    w_default = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w_default.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        t.orders.select(
            "o_orderkey",
            "o_custkey",
            F.first("o_orderkey").over(w_default).alias("first_order"),
            F.last("o_orderkey").over(w_full).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "agg_boolean",
    oracle="""
        SELECT l_returnflag,
               bool_and(l_quantity > 1) AS all_multi,
               bool_or(l_discount > 0.09) AS any_high_disc,
               CAST(count_if(l_tax = 0) AS BIGINT) AS n_tax_free
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (EVERY/ANY/COUNT_IF) — the predicate-summary
    family the delegated-SQL surface exposes as bool_and/bool_or."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.every(F.col("l_quantity") > 1).alias("all_multi"),
            F.some(F.col("l_discount") > 0.09).alias("any_high_disc"),
            F.count_if(F.col("l_tax") == 0).cast("bigint").alias("n_tax_free"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_unpivot",
    oracle="""
        SELECT o_orderkey, metric, CAST(val AS DOUBLE) AS val
        FROM (
            SELECT o_orderkey,
                   CAST(o_totalprice AS DOUBLE) AS totalprice,
                   CAST(o_custkey AS DOUBLE) AS custkey
            FROM orders WHERE o_orderkey < 200
        )
        UNPIVOT (val FOR metric IN (totalprice, custkey))
        ORDER BY o_orderkey, metric
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long reshape), the inverse of agg_pivot — Spark's
    DataFrame.unpivot / SQL stack(); narrow per-row expansion, no shuffle
    beyond the output sort."""
    t = Tables(spark, sf_dir)
    wide = t.orders.filter(F.col("o_orderkey") < 200).select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    return wide.unpivot(
        "o_orderkey", ["totalprice", "custkey"], "metric", "val"
    ).orderBy("o_orderkey", "metric")


@query(
    "join_salted_skew",
    oracle="""
        SELECT s.s_name,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(24,8))) AS DOUBLE) AS sum_qty
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY s.s_name ORDER BY s.s_name
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (operators/joins.py:salted_join): the fact side
    carries a deterministic xxhash64 salt, the supplier side is replicated
    once per salt, and the join key becomes (key, salt) — spreading any
    pathologically hot supplier over 8 reducers. The result is provably
    identical to the plain equi-join (the oracle IS the plain join); this
    query driver-verifies that equivalence on real data."""
    from ..operators.joins import salted_join

    t = Tables(spark, sf_dir)
    sup = t.supplier.select(F.col("s_suppkey").alias("l_suppkey"), "s_name")
    joined = salted_join(t.lineitem.select("l_suppkey", "l_quantity"), sup, "l_suppkey")
    return (
        joined.groupBy("s_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(24,8)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("s_name")
    )


@query(
    "cte_recursive",
    oracle="""
        WITH RECURSIVE walk AS (
            SELECT c_custkey AS start_key, c_custkey AS node, 0 AS depth
            FROM customer
            UNION ALL
            SELECT start_key, node // 2, depth + 1 FROM walk WHERE node > 1
        )
        SELECT start_key,
               CAST(MAX(depth) AS INTEGER) AS depth_to_root,
               CAST(SUM(node) AS BIGINT) AS path_sum
        FROM walk GROUP BY start_key ORDER BY start_key
    """,
)
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): per-customer ancestor walk
    up an implicit binary tree (node -> node div 2), aggregating path depth
    and node sum — the iterative-traversal capability the reference
    delegates to warehouse SQL. Each recursion step is a self-union the
    engine evaluates breadth-first; depth is log2(maxkey) (~11 here), and
    rows stay keyed on start_key so the final aggregate shuffles once."""
    t = Tables(spark, sf_dir)
    return sql_with_views(
        spark,
        """
        WITH RECURSIVE walk AS (
            SELECT c_custkey AS start_key, c_custkey AS node, 0 AS depth
            FROM {customer}
            UNION ALL
            SELECT start_key, node DIV 2, depth + 1 FROM walk WHERE node > 1
        )
        SELECT start_key,
               CAST(MAX(depth) AS INT) AS depth_to_root,
               CAST(SUM(node) AS BIGINT) AS path_sum
        FROM walk GROUP BY start_key ORDER BY start_key
        """,
        customer=t.customer,
    )


@query(
    "asof_join_forward",
    oracle="""
        SELECT l.event_id, l.ts, l.user_id,
               r.ts AS matched_ts,
               r.event_id AS matched_event_id,
               r.value AS matched_value
        FROM (SELECT * FROM events WHERE event_type = 'error') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.ts <= r.ts
        ORDER BY l.event_id
    """,
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each error matched to the user's EARLIEST
    following purchase (operators/asof.py direction='forward' — the same
    one-shuffle union + carry window as backward, with the frame flipped).
    DuckDB's native ASOF <= is the oracle."""
    t = Tables(spark, sf_dir)
    events = t.events
    errors = events.filter(F.col("event_type") == "error").select("event_id", "ts", "user_id")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    return asof_join(
        errors,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        direction="forward",
    ).orderBy("event_id")


@query(
    "window_count_distinct",
    oracle="""
        SELECT event_id, user_id,
               CAST(COUNT(DISTINCT event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS INTEGER) AS n_types_seen
        FROM events ORDER BY event_id
    """,
)
def window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — Spark has no native form, so
    the idiomatic workaround is size(collect_set() OVER w); the oracle is
    DuckDB's native windowed COUNT(DISTINCT). Per-user running distinct
    event types: state is bounded by |event types| per user, so the
    collect_set never outgrows the small type domain at any scale."""
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t.events.select(
            "event_id",
            "user_id",
            F.size(F.collect_set("event_type").over(w)).alias("n_types_seen"),
        )
        .orderBy("event_id")
    )


@query(
    "agg_grouping_flags",
    oracle="""
        SELECT COALESCE(o_orderpriority, '(all)') AS priority,
               COALESCE(o_orderstatus, '(all)') AS status,
               CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
               CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
        ORDER BY priority, status, g_priority, g_status
    """,
)
def agg_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() flags over CUBE: distinguishes a real NULL group key from
    a super-aggregate row — the standard disambiguator the delegated-SQL
    surface needs alongside rollup/cube/grouping-sets."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            "g_priority",
            "g_status",
            "n",
        )
        .orderBy("priority", "status", "g_priority", "g_status")
    )


@query(
    "fn_try_arithmetic",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_linenumber % 3 = 0 THEN NULL
                    ELSE CAST(l_quantity AS DOUBLE) / (l_linenumber % 3) END
                   AS safe_div,
               CASE WHEN l_orderkey % 2 = 0
                    THEN TIMESTAMP '2024-01-15 10:00:00' ELSE NULL END
                   AS parsed_ts,
               CASE WHEN (l_linenumber % 5) + 1 <= 3
                    THEN [10, 20, 30][(l_linenumber % 5) + 1] ELSE NULL END
                   AS elem
        FROM lineitem ORDER BY l_orderkey, l_linenumber, safe_div
    """,
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_* error-safe surface: try_divide (NULL on zero divisor),
    try_to_timestamp (NULL on unparseable), try_element_at (NULL out of
    range) — the oracle computes each NULL condition explicitly, so the
    check is that Spark's try-variants fail soft in exactly the declared
    cases."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.select(
            "l_orderkey",
            "l_linenumber",
            F.try_divide(
                F.col("l_quantity").cast("double"),
                (F.col("l_linenumber") % 3).cast("double"),
            ).alias("safe_div"),
            F.try_to_timestamp(
                F.when(F.col("l_orderkey") % 2 == 0, F.lit("2024-01-15 10:00:00"))
                .otherwise(F.lit("not a timestamp"))
            ).alias("parsed_ts"),
            F.try_element_at(
                F.array(F.lit(10), F.lit(20), F.lit(30)),
                ((F.col("l_linenumber") % 5) + 1).cast("int"),
            ).alias("elem"),
        )
        .orderBy("l_orderkey", "l_linenumber", "safe_div")
    )


# ---------------------------------------------------------------------------
# Bucketed range join (point-in-overlapping-intervals at scale)
# ---------------------------------------------------------------------------

@query(
    "join_range_bucketed",
    oracle="""
        WITH ranges AS (
            SELECT p_partkey,
                   p_retailprice * CAST(0.95 AS DOUBLE) AS lo,
                   p_retailprice * CAST(1.05 AS DOUBLE) AS hi
            FROM part WHERE p_partkey % 20 = 1
        ), probe AS (
            SELECT l_extendedprice / NULLIF(l_quantity, 0) AS up FROM lineitem
        )
        SELECT r.p_partkey, CAST(COUNT(*) AS BIGINT) AS n_in_range
        FROM ranges r JOIN probe p ON p.up BETWEEN r.lo AND r.hi
        GROUP BY r.p_partkey
        ORDER BY p_partkey
    """,
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join via uniform bucketing — the scale form of a
    pure range join (no equi key to extract, so a naive plan is a
    nested-loop over every (probe, range) pair).

    Each interval [lo, hi] is assigned to every bucket of width w =
    max(hi - lo) it overlaps (<= 2 buckets, since no interval is wider
    than w); each probe value lands in exactly ONE bucket. The join is
    then a plain equi-join on the bucket id with the exact BETWEEN as a
    residual filter — candidates per probe are the handful of intervals
    sharing its bucket, never the full interval table. floor((x-base)/w)
    is monotone in x under IEEE rounding, so an in-range probe can never
    miss its interval's bucket span. Each (probe, range) candidate pair
    arises at most once (the interval's bucket rows are distinct buckets),
    so no distinct step is needed before the count.

    At 100 TB both sides shuffle only on the narrow bucket key; the 1-row
    stats relation (base, w) broadcasts. Skewed buckets (many intervals
    piling into one bucket) are AQE-split like any hot hash key.
    """
    t = Tables(spark, sf_dir)
    ranges = t.part.filter(F.col("p_partkey") % 20 == 1).select(
        "p_partkey",
        (F.col("p_retailprice") * F.lit(0.95)).alias("lo"),
        (F.col("p_retailprice") * F.lit(1.05)).alias("hi"),
    )
    stats = ranges.agg(
        F.min("lo").alias("base"),
        F.greatest(F.max(F.col("hi") - F.col("lo")), F.lit(1e-9)).alias("w"),
    )
    rb = (
        ranges.crossJoin(F.broadcast(stats))
        .select(
            "p_partkey",
            "lo",
            "hi",
            F.explode(
                F.sequence(
                    F.floor((F.col("lo") - F.col("base")) / F.col("w")),
                    F.floor((F.col("hi") - F.col("base")) / F.col("w")),
                )
            ).alias("bucket"),
        )
    )
    pb = (
        # NULLIF: a zero-quantity row must drop (NULL bucket joins nothing,
        # and NULL fails the BETWEEN residual in both engines), not crash
        # the stage under ANSI division (scripts/edge_corpus_probe.py)
        t.lineitem.select(
            (F.col("l_extendedprice") / F.nullif(F.col("l_quantity"), F.lit(0.0))).alias("up")
        )
        .crossJoin(F.broadcast(stats))
        .select("up", F.floor((F.col("up") - F.col("base")) / F.col("w")).alias("bucket"))
    )
    return (
        pb.join(rb, "bucket")
        .filter((F.col("up") >= F.col("lo")) & (F.col("up") <= F.col("hi")))
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_in_range"))
        .orderBy("p_partkey")
    )


@query(
    "asof_join_cogroup",
    oracle="""
        SELECT l.event_id, l.ts, l.user_id,
               r.ts AS matched_ts,
               r.event_id AS matched_event_id,
               r.value AS matched_value
        FROM (SELECT * FROM events WHERE event_type = 'error') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        ORDER BY l.event_id
    """,
)
def asof_join_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join again, through the co-grouped Arrow surface
    (groupBy.cogroup.applyInPandas + per-key pandas.merge_asof) — verified
    against the same native-ASOF oracle as asof_join_events, closing the
    cogroup rung of the UDF ladder. The JVM window form stays the
    production default (operators/asof.py docstrings)."""
    t = Tables(spark, sf_dir)
    events = t.events
    errors = events.filter(F.col("event_type") == "error").select("event_id", "ts", "user_id")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    return asof_join_cogroup_op(
        errors,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
    ).orderBy("event_id")


@query(
    "join_lateral_topn",
    oracle="""
        SELECT c.c_custkey, c.c_name, l.o_orderkey, l.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 2) l
        ORDER BY c.c_custkey, l.o_orderkey
    """,
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table with ORDER BY + LIMIT — the
    per-group top-N expressed as a join, not a window: each customer row
    drives a top-2-orders subquery. Both engines run the identical SQL.

    Scale note: Catalyst DECORRELATES this (no per-row re-execution) into
    exactly the plan a hand-written window top-k would get —
    ``WindowGroupLimit`` (partial, rank <= 2 inside each partition before
    any shuffle) + one hash join back to the driving side; customers here
    broadcast. The lateral FORM is what the surface needs (arbitrary
    correlated SQL in FROM, ``CopyToolConfig.java:856-867``); the plan is
    proof it costs the same as the idiomatic rewrite.
    """
    t = Tables(spark, sf_dir)
    return sql_with_views(
        spark,
        """
        SELECT c.c_custkey, c.c_name, l.o_orderkey, l.o_totalprice
        FROM {customer} c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM {orders} o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 2) l
        ORDER BY c.c_custkey, l.o_orderkey
        """,
        customer=t.customer,
        orders=t.orders,
    )
