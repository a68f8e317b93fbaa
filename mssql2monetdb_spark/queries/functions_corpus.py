"""SURVEY.md §2B — scalar-function surface (string / date / math /
conditional / JSON / array), each with a DuckDB oracle.

Everything stays JVM-side (built-in ``pyspark.sql.functions``) so the whole
projection runs inside WholeStageCodegen — no Python in the hot path.

Cross-engine type discipline: DuckDB's YEAR()/CEIL()/date_diff return wider
types than Spark's (BIGINT vs INT, DOUBLE vs BIGINT), so both sides carry
explicit casts to the same type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from .helpers import sql_with_views
from .registry import query


@query(
    "fn_string",
    oracle="""
        SELECT c_custkey,
               UPPER(c_name) AS name_upper,
               LOWER(c_mktsegment) AS seg_lower,
               CAST(LENGTH(c_name) AS INTEGER) AS name_len,
               TRIM(c_mktsegment) AS seg_trim,
               SUBSTRING(c_name, 1, 8) AS name_prefix,
               c_name || '/' || c_mktsegment AS name_seg,
               REPLACE(c_name, 'Customer', 'Cust') AS name_short,
               TRY_CAST(REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
               CONTAINS(c_name, '#00000000') AS is_low_key,
               LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded
        FROM customer ORDER BY c_custkey
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions (incl. the reference's autoTrim semantics,
    ``CopyTool.java:713-714``)."""
    t = Tables(spark, sf_dir)
    c = t.customer
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.trim(F.col("c_mktsegment")).alias("seg_trim"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("name_seg"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        # try_cast: a digitless name extracts '' and a plain CAST is an ANSI
        # crash; NULL in both engines instead (scripts/edge_corpus_probe.py)
        F.regexp_extract("c_name", r"([0-9]+)", 1).try_cast("bigint").alias("name_num"),
        F.col("c_name").contains("#00000000").alias("is_low_key"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
    ).orderBy("c_custkey")


@query(
    "fn_datetime",
    oracle="""
        SELECT o_orderkey,
               CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
               CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
               CAST(DAY(o_orderdate) AS INTEGER) AS order_day,
               DATE_TRUNC('month', o_orderdate) AS order_month_start,
               CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER) AS days_since_95,
               o_orderdate + INTERVAL 30 DAY AS due_date,
               STRFTIME(o_orderdate, '%Y_%m_%d_%H_%M_%S') AS load_stamp
        FROM orders ORDER BY o_orderkey
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions; ``load_stamp`` is the reference's versioned-table
    suffix format yyyy_MM_dd_HH_mm_ss (``CopyTool.java:216-218``)."""
    t = Tables(spark, sf_dir)
    o = t.orders
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias("days_since_95"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.date_format("o_orderdate", "yyyy_MM_dd_HH_mm_ss").alias("load_stamp"),
    ).orderBy("o_orderkey")


@query(
    "fn_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4)), 2) AS DOUBLE) AS net_price,
               ABS(l_discount - 0.05) AS disc_dev,
               CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
               CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
               l_orderkey % 7 AS okey_mod,
               SQRT(l_quantity) AS qty_sqrt,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec
        FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math / decimal arithmetic incl. plain (non-scientific) decimal
    rendering parity (``CopyTool.java:704-707``).

    ROUND goes through an exact DECIMAL(24,4) intermediate: rounding the raw
    double directly is tie-ambiguous across engines (the true products have 4
    decimal digits), while decimal->2-digit rounding is HALF_UP in both for
    positive values.
    """
    t = Tables(spark, sf_dir)
    li = t.lineitem
    net = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,4)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(net, 2).cast("double").alias("net_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        (F.col("l_orderkey") % 7).alias("okey_mod"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.col("l_extendedprice").cast("decimal(18,2)").cast("double").alias("price_dec"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "fn_conditional",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 100000 THEN 'big'
                    WHEN o_totalprice > 10000 THEN 'mid'
                    ELSE 'small' END AS size_class,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_decoded,
               CAST(FLOOR(o_totalprice) AS BIGINT) AS price_trunc,
               CAST(o_orderkey AS VARCHAR) AS okey_str,
               IF(o_orderpriority = '1-URGENT', 1, 0) AS is_urgent
        FROM orders ORDER BY o_orderkey
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / COALESCE / NULLIF / CAST / IF."""
    t = Tables(spark, sf_dir)
    o = t.orders
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 100000, "big")
        .when(F.col("o_totalprice") > 10000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias("status_decoded"),
        F.floor("o_totalprice").alias("price_trunc"),
        F.col("o_orderkey").cast("string").alias("okey_str"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
    ).orderBy("o_orderkey")


@query(
    "fn_json",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
        FROM events ORDER BY event_id
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction over the events stream table."""
    t = Tables(spark, sf_dir)
    e = t.events
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        # try_cast: '$.k' can hold a non-numeric string; NULL, not an ANSI
        # cast crash (scripts/edge_corpus_probe.py)
        k.try_cast("bigint").alias("k_int"),
    ).orderBy("event_id")


@query(
    "fn_array",
    oracle="""
        SELECT vec_id,
               CAST(LEN(embedding) AS INTEGER) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_val,
               list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)), (a, b) -> a + b) AS vec_sum,
               list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b) AS vec_sq_sum
        FROM embeddings ORDER BY vec_id
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column.

    Both engines fold left-to-right in DOUBLE, so the float sums are
    bit-identical despite FP non-associativity.
    """
    t = Tables(spark, sf_dir)
    e = t.embeddings
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    as_sq = F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.reduce(as_double, F.lit(0.0), lambda a, b: a + b).alias("vec_sum"),
        F.reduce(as_sq, F.lit(0.0), lambda a, b: a + b).alias("vec_sq_sum"),
    ).orderBy("vec_id")


@query(
    "fn_explode_posexplode",
    oracle="""
        SELECT vec_id, CAST(i AS INTEGER) AS pos, CAST(embedding[i] AS DOUBLE) AS val
        FROM embeddings, UNNEST(generate_series(1, 4)) AS t(i)
        WHERE vec_id < 10 AND i <= len(embedding)
        ORDER BY vec_id, pos
    """,
)
def fn_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode with position (generator/UNNEST surface)."""
    t = Tables(spark, sf_dir)
    e = t.embeddings.filter(F.col("vec_id") < 10)
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos0", "val_f"))
        .select(
            "vec_id",
            (F.col("pos0") + 1).cast("int").alias("pos"),
            F.col("val_f").cast("double").alias("val"),
        )
        .filter(F.col("pos") <= 4)
        .orderBy("vec_id", "pos")
    )


@query(
    "fn_string2",
    oracle="""
        SELECT p_partkey,
               split_part(p_brand, '#', 2) AS brand_num,
               CAST(strpos(p_name, 'widget') AS INTEGER) AS widget_pos,
               translate(p_type, 'AEIOU', 'aeiou') AS type_translated,
               repeat(left(p_name, 2), 2) AS name_rep,
               reverse(p_brand) AS brand_rev,
               right(p_type, 3) AS type_suffix,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled
        FROM part ORDER BY p_partkey
    """,
)
def fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string surface: split_part/instr/translate/repeat/reverse/
    left/right/global regexp_replace."""
    t = Tables(spark, sf_dir)
    p = t.part
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_brand"), F.lit("#"), F.lit(2)).alias("brand_num"),
        F.instr(F.col("p_name"), "widget").cast("int").alias("widget_pos"),
        F.translate(F.col("p_type"), "AEIOU", "aeiou").alias("type_translated"),
        F.repeat(F.substring("p_name", 1, 2), 2).alias("name_rep"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.substring(F.col("p_type"), -3, 3).alias("type_suffix"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
    ).orderBy("p_partkey")


@query(
    "fn_bitwise",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_orderkey & 255 AS and_mask,
               l_orderkey | 7 AS or_low,
               xor(l_orderkey, l_partkey) AS xor_keys,
               l_linenumber << 3 AS shl,
               l_orderkey >> 2 AS shr,
               CAST(bit_count(l_orderkey) AS INTEGER) AS popcount
        FROM lineitem ORDER BY l_orderkey, l_linenumber, xor_keys
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface (&, |, xor, shifts, popcount)."""
    t = Tables(spark, sf_dir)
    li = t.lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("and_mask"),
        F.col("l_orderkey").bitwiseOR(F.lit(7)).alias("or_low"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("xor_keys"),
        F.shiftleft(F.col("l_linenumber"), 3).alias("shl"),
        F.shiftright(F.col("l_orderkey"), 2).alias("shr"),
        F.bit_count(F.col("l_orderkey")).alias("popcount"),
    ).orderBy("l_orderkey", "l_linenumber", "xor_keys")


@query(
    "fn_datetime2",
    oracle="""
        SELECT o_orderkey,
               CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
               make_timestamp(CAST(epoch(o_orderdate) AS BIGINT) * 1000000) AS ts_roundtrip,
               CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
               CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
               last_day(o_orderdate) AS month_end,
               CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus_2mo
        FROM orders ORDER BY o_orderkey
    """,
)
def fn_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch conversions, ISO week/quarter, last_day, month arithmetic."""
    t = Tables(spark, sf_dir)
    o = t.orders
    epoch_s = F.unix_timestamp(F.col("o_orderdate"))
    return o.select(
        "o_orderkey",
        epoch_s.alias("epoch_s"),
        F.timestamp_seconds(epoch_s).alias("ts_roundtrip"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.quarter("o_orderdate").alias("qtr"),
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months(F.col("o_orderdate"), 2).alias("plus_2mo"),
    ).orderBy("o_orderkey")


@query(
    "fn_null_semantics",
    oracle="""
        WITH t AS (
            SELECT o_orderkey,
                   NULLIF(o_orderstatus, 'P') AS maybe_status,
                   NULLIF(o_custkey % 3, 0) AS maybe_mod
            FROM orders
        )
        SELECT o_orderkey,
               maybe_status IS NULL AS status_is_null,
               maybe_status IS NOT DISTINCT FROM NULL AS nullsafe_eq_null,
               maybe_status IS NOT DISTINCT FROM 'F' AS nullsafe_eq_f,
               COALESCE(maybe_mod, -1) AS mod_filled,
               CASE WHEN maybe_mod IS NULL THEN 'none' ELSE 'some' END AS mod_class
        FROM t ORDER BY o_orderkey
    """,
)
def fn_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL handling: IS NULL, null-safe equality (<=>), COALESCE over
    derived NULLs (fixtures are null-free; NULLIF synthesizes them)."""
    t = Tables(spark, sf_dir)
    o = t.orders
    maybe_status = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    maybe_mod = F.nullif(F.col("o_custkey") % 3, F.lit(0))
    return o.select(
        "o_orderkey",
        maybe_status.isNull().alias("status_is_null"),
        maybe_status.eqNullSafe(F.lit(None).cast("string")).alias("nullsafe_eq_null"),
        maybe_status.eqNullSafe(F.lit("F")).alias("nullsafe_eq_f"),
        F.coalesce(maybe_mod, F.lit(-1)).alias("mod_filled"),
        F.when(maybe_mod.isNull(), "none").otherwise("some").alias("mod_class"),
    ).orderBy("o_orderkey")


@query(
    "join_nullsafe",
    oracle="""
        WITH a AS (SELECT o_orderkey, NULLIF(o_custkey % 5, 0) AS k FROM orders WHERE o_orderkey < 500),
             b AS (SELECT NULLIF(c_custkey % 5, 0) AS k, COUNT(*) AS n FROM customer GROUP BY 1)
        SELECT a.o_orderkey, a.k, b.n
        FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        ORDER BY a.o_orderkey
    """,
)
def join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=>): NULL keys match each other — still a hash
    join in Spark (EqualNullSafe is a supported join key), not a BNL."""
    t = Tables(spark, sf_dir)
    a = t.orders.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey", F.nullif(F.col("o_custkey") % 5, F.lit(0)).alias("k")
    )
    b = (
        t.customer.select(F.nullif(F.col("c_custkey") % 5, F.lit(0)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return a.join(b, a.k.eqNullSafe(b.k)).select(a.o_orderkey, a.k, b.n).orderBy("o_orderkey")


@query(
    "fn_greatest_least",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               GREATEST(l_quantity, l_discount * 100, 10.0) AS g,
               LEAST(l_quantity, l_tax * 100, 40.0) AS l,
               GREATEST(l_orderkey, l_partkey, l_suppkey) AS gkey
        FROM lineitem ORDER BY l_orderkey, l_linenumber, gkey
    """,
)
def fn_greatest_least(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-argument GREATEST/LEAST over mixed expressions."""
    t = Tables(spark, sf_dir)
    li = t.lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100, F.lit(10.0)).alias("g"),
        F.least(F.col("l_quantity"), F.col("l_tax") * 100, F.lit(40.0)).alias("l"),
        F.greatest("l_orderkey", "l_partkey", "l_suppkey").alias("gkey"),
    ).orderBy("l_orderkey", "l_linenumber", "gkey")


@query(
    "fn_array_setops",
    oracle="""
        WITH t AS (
            SELECT c_custkey,
                   regexp_split_to_array(lower(c_name), '0+') AS a,
                   regexp_split_to_array(lower(c_mktsegment), 'a') AS b
            FROM customer WHERE c_custkey < 200
        )
        SELECT c_custkey,
               COALESCE(array_to_string(list_sort(list_distinct(list_concat(a, b))), '|'), '') AS union_ab,
               COALESCE(array_to_string(list_sort(list_filter(list_distinct(a), x -> list_contains(b, x))), '|'), '') AS inter_ab,
               COALESCE(array_to_string(list_sort(list_filter(list_distinct(a), x -> NOT list_contains(b, x))), '|'), '') AS except_ab,
               CAST(len(list_distinct(a)) AS INTEGER) AS n_a
        FROM t ORDER BY c_custkey
    """,
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (union/intersect/except) with sorted outputs; results
    are emitted as joined strings because the driver's value hash cannot
    canonicalize array-typed columns."""
    t = Tables(spark, sf_dir)
    c = t.customer.filter(F.col("c_custkey") < 200)
    a = F.split(F.lower(F.col("c_name")), "0+")
    b = F.split(F.lower(F.col("c_mktsegment")), "a")
    return c.select(
        "c_custkey",
        F.array_join(F.sort_array(F.array_union(a, b)), "|").alias("union_ab"),
        F.array_join(F.sort_array(F.array_intersect(a, b)), "|").alias("inter_ab"),
        F.array_join(F.sort_array(F.array_except(a, b)), "|").alias("except_ab"),
        F.size(F.array_distinct(a)).alias("n_a"),
    ).orderBy("c_custkey")


@query(
    "fn_try_cast",
    oracle="""
        SELECT c_custkey,
               TRY_CAST(substring(c_name, 10, 20) AS BIGINT) AS tail_num,
               TRY_CAST(c_mktsegment AS BIGINT) AS seg_num,
               TRY_CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS roundtrip
        FROM customer ORDER BY c_custkey
    """,
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casts: TRY_CAST yields NULL instead of failing — the
    ingest-grade cast for dirty data (both engines agree on NULL results)."""
    t = Tables(spark, sf_dir)
    c = t.customer
    return c.select(
        "c_custkey",
        F.substring("c_name", 10, 20).try_cast("bigint").alias("tail_num"),
        F.col("c_mktsegment").try_cast("bigint").alias("seg_num"),
        F.col("c_custkey").cast("string").try_cast("bigint").alias("roundtrip"),
    ).orderBy("c_custkey")


@query(
    "fn_levenshtein",
    oracle="""
        SELECT p_partkey,
               CAST(levenshtein(p_brand, p_type) AS INTEGER) AS brand_type_dist,
               CAST(levenshtein(lower(substring(p_name, 1, 12)), lower(p_type)) AS INTEGER) AS name_type_dist,
               CAST(levenshtein(p_name, p_name) AS INTEGER) AS self_dist
        FROM part ORDER BY p_partkey
    """,
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance (the fuzzy-matching primitive for near-dup short
    strings); self-distance pins the zero case."""
    t = Tables(spark, sf_dir)
    p = t.part
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", "p_type").cast("int").alias("brand_type_dist"),
        F.levenshtein(F.lower(F.substring("p_name", 1, 12)), F.lower(F.col("p_type"))).cast("int").alias("name_type_dist"),
        F.levenshtein("p_name", "p_name").cast("int").alias("self_dist"),
    ).orderBy("p_partkey")


@query(
    "fn_format",
    oracle="""
        SELECT o_orderkey,
               printf('%08d', o_orderkey) AS key_padded,
               printf('%s/%s', o_orderstatus, o_orderpriority) AS status_pri,
               printf('%.2f', ROUND(CAST(CAST(o_totalprice AS DECIMAL(24,8)) AS DOUBLE), 2)) AS price_str
        FROM orders ORDER BY o_orderkey
    """,
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting; the float is routed through an exact DECIMAL
    round first so the rendered string is identical cross-engine."""
    t = Tables(spark, sf_dir)
    o = t.orders
    price = F.round(F.col("o_totalprice").cast("decimal(24,8)").cast("double"), 2)
    return o.select(
        "o_orderkey",
        F.format_string("%08d", F.col("o_orderkey")).alias("key_padded"),
        F.format_string("%s/%s", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("status_pri"),
        F.format_string("%.2f", price).alias("price_str"),
    ).orderBy("o_orderkey")


@query(
    "fn_pandas_udf",
    oracle="""
        SELECT doc_id,
               regexp_replace(lower(trim(text || '   MiXeD    Case  ')), '\\s+', ' ', 'g')
                   AS norm_text
        FROM documents ORDER BY doc_id
    """,
)
def fn_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-batched pandas-UDF path under the driver gate: a
    vectorized string normalizer (lower/trim/collapse whitespace) with
    exact cross-engine semantics, applied to text decorated with
    mixed-case padded suffixes so every rule fires. The query corpus keeps
    built-ins in every hot path (SURVEY §2B discipline); this entry exists
    to driver-verify the UDF plumbing itself — Arrow transfer, batch
    boundaries, null handling (functions/udfs.py:normalize_ws_pandas)."""
    from ..catalog import parallelized
    from ..functions.udfs import normalize_ws_pandas

    t = Tables(spark, sf_dir)
    decorated = parallelized(t.documents).select(
        "doc_id", F.concat(F.col("text"), F.lit("   MiXeD    Case  ")).alias("text")
    )
    return decorated.select(
        "doc_id", normalize_ws_pandas(F.col("text")).alias("norm_text")
    ).orderBy("doc_id")


@query(
    "fn_udtf_shingles",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS w
            FROM documents WHERE doc_id % 25 = 0
        ), e AS (
            SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
            FROM toks WHERE len(w) >= 2
        )
        SELECT doc_id,
               CAST(i - 1 AS INTEGER) AS pos,
               w[i] || ' ' || w[i + 1] AS shingle
        FROM e ORDER BY doc_id, pos
    """,
)
def fn_udtf_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Python-UDTF rung of the UDF ladder under the driver gate: word
    bigrams via ``LATERAL shingles(text)`` (functions/udfs.py:ShingleUDTF),
    the one SURVEY §2B UDF surface previously verified only in pytest. The
    UDTF's ``str.split()`` tokenization equals the oracle's
    whitespace-split + empty-filter; every (doc_id, pos) is unique so the
    ORDER BY is total. Scoped to every 25th document — the UDTF is the
    declared row-multiplying extension point, NOT a hot path (the
    production shingle pipeline is the codegen explode in operators/dedup).
    """
    from ..catalog import parallelized
    from ..functions import udfs

    udfs.register_all(spark)
    t = Tables(spark, sf_dir)
    docs = parallelized(t.documents).filter(F.col("doc_id") % 25 == 0).select(
        "doc_id", "text"
    )
    # the `shingles` UDTF name stays fixed: re-registration is idempotent
    # (same implementation every time), so unlike a data-bound temp view a
    # concurrent builder can never bind it to different behavior
    return sql_with_views(
        spark,
        """
        SELECT d.doc_id, s.pos, s.shingle
        FROM {docs} d, LATERAL shingles(d.text) s
        ORDER BY d.doc_id, s.pos
        """,
        docs=docs,
    )


@query(
    "fn_url_parse",
    oracle="""
        WITH u AS (
            SELECT doc_id,
                   'https://www.site' || CAST(doc_id % 5 AS VARCHAR)
                   || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
                   || CASE WHEN doc_id % 3 = 0 THEN '?q=' || lang || '&page=2'
                           WHEN doc_id % 3 = 1 THEN '?page=1'
                           ELSE '' END
                   || CASE WHEN doc_id % 4 = 0
                           THEN '#sec' || CAST(doc_id % 7 AS VARCHAR)
                           ELSE '' END AS url
            FROM documents
        )
        SELECT doc_id,
               regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
               regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
               regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
               NULLIF(regexp_extract(url, '\\?([^#]*)', 1), '') AS query,
               NULLIF(regexp_extract(url, '#(.*)$', 1), '') AS fragment,
               NULLIF(regexp_extract(url, '[?&]q=([^&#]*)', 1), '') AS q_param
        FROM u ORDER BY doc_id
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-parsing surface (parse_url PROTOCOL/HOST/PATH/QUERY/REF and
    keyed query-param extraction) over deterministically synthesized URLs
    covering query-less, fragment-less, and param-missing shapes — the
    oracle recomputes every component with independent regexes, so Spark's
    java.net.URI-based parser is checked against RE2 semantics."""
    t = Tables(spark, sf_dir)
    url = F.concat(
        F.lit("https://www.site"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("?q="), F.col("lang"), F.lit("&page=2")))
        .when(F.col("doc_id") % 3 == 1, F.lit("?page=1"))
        .otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("#sec"), (F.col("doc_id") % 7).cast("string")),
        ).otherwise(F.lit("")),
    )
    u = t.documents.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("REF")).alias("fragment"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("q")).alias("q_param"),
    ).orderBy("doc_id")


@query(
    "fn_map",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               2 AS n_entries,
               l_linenumber AS line_val,
               'line,order' AS keys_sorted,
               CAST(l_linenumber + l_orderkey AS BIGINT) AS vals_sum,
               l_partkey AS merged_val,
               CAST(CASE WHEN l_linenumber > 100 THEN 1 ELSE 0 END
                    + CASE WHEN l_orderkey > 100 THEN 1 ELSE 0 END
                    AS INTEGER) AS n_over_100
        FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-column surface: create_map, element_at, map_keys, map_values,
    map_concat, map_filter, aggregate-over-values. The oracle computes
    every extracted value from first principles (no map type on the DuckDB
    side), so the check is on SEMANTICS of the map operators, not their
    encoding."""
    t = Tables(spark, sf_dir)
    m = F.create_map(
        F.lit("line"),
        F.col("l_linenumber").cast("bigint"),
        F.lit("order"),
        F.col("l_orderkey").cast("bigint"),
    )
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.size(m).alias("n_entries"),
        F.element_at(m, F.lit("line")).alias("line_val"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.aggregate(
            F.map_values(m), F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("vals_sum"),
        F.element_at(
            F.map_concat(m, F.create_map(F.lit("extra"), F.col("l_partkey").cast("bigint"))),
            F.lit("extra"),
        ).alias("merged_val"),
        F.size(F.map_filter(m, lambda k, v: v > 100)).alias("n_over_100"),
    ).orderBy("l_orderkey", "l_linenumber", "merged_val")


@query(
    "fn_lambda_hof",
    oracle="""
        WITH arrs AS (
            SELECT l_orderkey, l_linenumber,
                   [l_quantity, l_discount * 100, l_tax * 100] AS a,
                   [l_tax, l_discount, CAST(1.0 AS DOUBLE)] AS b
            FROM lineitem
        )
        SELECT l_orderkey, l_linenumber,
               list_transform(a, x -> x * 2)[1] AS doubled_first,
               CAST(len(list_filter(a, x -> x > 10)) AS INTEGER) AS n_gt10,
               len(list_filter(a, x -> x > 40)) > 0 AS has_big,
               len(list_filter(a, x -> NOT (x >= 0))) = 0 AS all_nonneg,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE), a),
                           (acc, x) -> acc + x) AS arr_sum,
               list_transform(list_zip(a, b),
                              p -> struct_extract(p, 1) + struct_extract(p, 2))[1]
                   AS zip_first
        FROM arrs
        ORDER BY l_orderkey, l_linenumber, arr_sum
    """,
)
def fn_lambda_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function surface: transform / filter / exists /
    forall / aggregate (fixed-order fold, deterministic cross-engine) /
    zip_with — each verified against DuckDB's list_* lambda family. All
    JVM-side codegen lambdas; nothing leaves the row."""
    t = Tables(spark, sf_dir)
    arrs = t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.array(
            F.col("l_quantity"), F.col("l_discount") * 100, F.col("l_tax") * 100
        ).alias("a"),
        F.array(F.col("l_tax"), F.col("l_discount"), F.lit(1.0)).alias("b"),
    )
    return arrs.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(F.transform("a", lambda x: x * 2), 1).alias("doubled_first"),
        F.size(F.filter("a", lambda x: x > 10)).alias("n_gt10"),
        F.exists("a", lambda x: x > 40).alias("has_big"),
        F.forall("a", lambda x: x >= 0).alias("all_nonneg"),
        F.aggregate("a", F.lit(0.0), lambda acc, x: acc + x).alias("arr_sum"),
        F.element_at(F.zip_with("a", "b", lambda x, y: x + y), 1).alias("zip_first"),
    ).orderBy("l_orderkey", "l_linenumber", "arr_sum")


@query(
    "fn_variant_json",
    oracle="""
        WITH b AS (
            SELECT event_id,
                   printf('{"id": %d, "k": %s, "tags": ["%s", "t%s"], "m": {"v": %d}}',
                          COALESCE(event_id, -1),
                          COALESCE(json_extract_string(props, '$.k'), 'null'),
                          COALESCE(event_type, ''),
                          COALESCE(json_extract_string(props, '$.k'), 'null'),
                          COALESCE(user_id, -1)) AS j
            FROM events
        )
        SELECT event_id,
               TRY_CAST(CASE WHEN json_valid(j) THEN json_extract(j, '$.m.v') END AS BIGINT) AS m_v,
               CASE WHEN json_valid(j) THEN json_extract_string(j, '$.tags[1]') END AS tag1,
               TRY_CAST(CASE WHEN json_valid(j) THEN json_extract(j, '$.k') END AS INTEGER) AS k_int,
               TRY_CAST(CASE WHEN json_valid(j) THEN json_extract(j, '$.missing') END AS BIGINT) AS absent
        FROM b ORDER BY event_id
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's VARIANT semi-structured type as the JSON engine: a nested
    document (object + array + nested object) is synthesized per event row,
    parsed once with ``try_parse_json`` into a VARIANT, and fields come
    out through typed ``try_variant_get`` paths — nested object traversal
    (``$.m.v``), array index (``$.tags[1]``), typed scalar (``$.k`` as
    INT), and a missing path (NULL, not an error). The DuckDB oracle
    builds the identical document and walks the same JSONPaths with
    ``json_extract``. The try-variants on BOTH ends keep hostile corpora
    failure-soft: a ``props``/``event_type`` payload with embedded quotes
    or bad escapes makes the synthesized document malformed, which must
    be a NULL row, not an ANSI crash (edge-corpus catch).

    Scale note: VARIANT stores a parsed binary encoding, so the document
    is decoded ONCE per row and each ``variant_get`` is a cheap typed
    probe — the repeated-``get_json_object`` shape (``fn_json``) re-parses
    the string per extraction. For wide multi-field extraction over a
    100 TB raw-JSON events feed, parse-once-probe-many is the right plan;
    both stay whole-stage-codegen, no UDFs.
    """
    t = Tables(spark, sf_dir)
    # NULL formatting args diverge across engines (Spark format_string
    # prints "null", DuckDB printf returns NULL) — coalesce every nullable
    # argument identically on both sides; 'null' keeps the synthesized
    # field a valid JSON null
    k = F.coalesce(F.get_json_object("props", "$.k"), F.lit("null"))
    j = F.format_string(
        '{"id": %d, "k": %s, "tags": ["%s", "t%s"], "m": {"v": %d}}',
        F.coalesce(F.col("event_id"), F.lit(-1)),
        k,
        F.coalesce(F.col("event_type"), F.lit("")),
        k,
        F.coalesce(F.col("user_id"), F.lit(-1)),
    )
    v = F.try_parse_json(j)
    return t.events.select(
        "event_id",
        F.try_variant_get(v, "$.m.v", "bigint").alias("m_v"),
        F.try_variant_get(v, "$.tags[1]", "string").alias("tag1"),
        F.try_variant_get(v, "$.k", "int").alias("k_int"),
        F.try_variant_get(v, "$.missing", "bigint").alias("absent"),
    ).orderBy("event_id")


@query(
    "fn_unpivot",
    oracle="""
        WITH per_src AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   CAST(MAX(n_chars) AS BIGINT) AS max_chars
            FROM documents GROUP BY source
        )
        SELECT source, metric, metric_value
        FROM per_src
        UNPIVOT (metric_value FOR metric IN (n_docs, sum_chars, max_chars))
        ORDER BY source, metric
    """,
)
def fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long UNPIVOT (the melt/stack relational shape): per-source
    document stats rotated into (source, metric, value) rows —
    ``DataFrame.unpivot`` (Spark's ANSI UNPIVOT, compiled to an Expand
    node: each input row fans out map-side, no shuffle) against DuckDB's
    standard UNPIVOT clause."""
    t = Tables(spark, sf_dir)
    per_src = t.documents.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )
    return per_src.unpivot(
        ["source"], ["n_docs", "sum_chars", "max_chars"], "metric", "metric_value"
    ).orderBy("source", "metric")


@query(
    "agg_bitwise",
    oracle="""
        SELECT l_orderkey % 7 AS grp,
               CAST(BIT_AND(l_partkey) AS BIGINT) AS band,
               CAST(BIT_OR(l_partkey) AS BIGINT) AS bor,
               CAST(BIT_XOR(l_partkey) AS BIGINT) AS bxor,
               CAST(BIT_AND(l_linenumber) AS BIGINT) AS band_ln
        FROM lineitem
        GROUP BY l_orderkey % 7 ORDER BY grp
    """,
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (BIT_AND / BIT_OR / BIT_XOR) — flag-mask rollups
    and parity checks; associative+commutative, so map-side partials
    combine in any order with exact results (the bitwise analog of SUM's
    determinism problem NOT existing)."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.groupBy((F.col("l_orderkey") % 7).alias("grp"))
        .agg(
            F.bit_and("l_partkey").cast("bigint").alias("band"),
            F.bit_or("l_partkey").cast("bigint").alias("bor"),
            F.bit_xor("l_partkey").cast("bigint").alias("bxor"),
            F.bit_and("l_linenumber").cast("bigint").alias("band_ln"),
        )
        .orderBy("grp")
    )


@query(
    "fn_struct_ops",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(l_partkey AS BIGINT) AS s1_v,
               -- lexicographic struct ordering, from first principles
               CAST(CASE WHEN l_linenumber < l_linenumber % 3
                          OR (l_linenumber = l_linenumber % 3
                              AND l_partkey <= l_orderkey)
                    THEN l_linenumber ELSE l_linenumber % 3 END AS BIGINT)
                   AS first_k,
               CAST(CASE WHEN l_linenumber < l_linenumber % 3
                          OR (l_linenumber = l_linenumber % 3
                              AND l_partkey <= l_orderkey)
                    THEN l_partkey ELSE l_orderkey END AS BIGINT) AS first_v,
               (l_linenumber = l_linenumber % 3 AND l_partkey = l_orderkey)
                   AS s_eq,
               (l_linenumber < l_linenumber % 3
                OR (l_linenumber = l_linenumber % 3 AND l_partkey < l_orderkey))
                   AS s_lt
        FROM lineitem ORDER BY l_orderkey, l_linenumber, s1_v
    """,
)
def fn_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-column surface: named construction, field access, struct
    EQUALITY and ORDERING (lexicographic by field position — what makes
    array_sort over array<struct> deterministic), and sorting an array of
    structs. The oracle computes every extracted value from first
    principles (manual lexicographic compare), so the check is on the
    SEMANTICS of Spark's struct operators, not their encoding."""
    t = Tables(spark, sf_dir)
    s1 = F.struct(
        F.col("l_linenumber").cast("bigint").alias("k"),
        F.col("l_partkey").cast("bigint").alias("v"),
    )
    s2 = F.struct(
        (F.col("l_linenumber") % 3).cast("bigint").alias("k"),
        F.col("l_orderkey").cast("bigint").alias("v"),
    )
    arr = F.array_sort(F.array(s1, s2))
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        s1.getField("v").alias("s1_v"),
        arr[0].getField("k").alias("first_k"),
        arr[0].getField("v").alias("first_v"),
        (s1 == s2).alias("s_eq"),
        (s1 < s2).alias("s_lt"),
    ).orderBy("l_orderkey", "l_linenumber", "s1_v")
