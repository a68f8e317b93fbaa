"""Count-min sketch as pure DataFrame aggregation.

A CMS is d hash rows x w counters; every key increments one counter per
row, and a key's estimate is the MIN of its d counters — an upper bound on
the true count that tightens as w grows. Expressed relationally the build
is one groupBy over (row, bucket) pairs — map-side combinable, shuffle
bounded by d*w regardless of input size — and the probe is a join against
the (at most d*w)-row sketch relation, which always broadcasts.

This is the streaming-telemetry shape ("how often did key X appear in a
100 TB log") where an exact per-key groupBy would shuffle billions of
distinct keys: the sketch costs a constant-size state no matter the key
cardinality. Hashes are the engine-portable md5 family
(functions.hashing), so DuckDB can run the identical algorithm as the
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hashing

CMS_DEPTH = 4  # hash rows
CMS_WIDTH = 256  # counters per row


def _bucket(key: Column, i: int) -> Column:
    """Row-i bucket of a key: first 32 md5 bits of 'i:key' mod width."""
    return (
        hashing.md5_int32(F.concat(F.lit(f"{i}:"), key.cast("string"))) % CMS_WIDTH
    )


def _bucket_sql(key_expr: str, i: int) -> str:
    """DuckDB fragment equivalent to :func:`_bucket`."""
    inner = f"'{i}:' || CAST({key_expr} AS VARCHAR)"
    return f"({hashing.md5_int32_sql(inner)} % {CMS_WIDTH})"


def count_min_build(rows: DataFrame, key_col: str) -> DataFrame:
    """(row i, bucket, c): the sketch counters for a key stream."""
    pairs = rows.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), _bucket(F.col(key_col), i).alias("bucket")
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("ib")
    ).select("ib.i", "ib.bucket")
    return pairs.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("c"))


def count_min_estimate(sketch: DataFrame, probes: DataFrame, key_col: str) -> DataFrame:
    """min-of-d-counters estimate for every probe key.

    The sketch is <= d*w rows and broadcasts; each probe key expands to d
    (i, bucket) lookups and collapses back with MIN. The join is LEFT so
    a key whose counters were never touched estimates 0 (an unseen key
    must not vanish from the output, and min over only the *colliding*
    counters would overshoot the CMS bound).
    """
    lookups = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), _bucket(F.col(key_col), i).alias("bucket")
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("ib"),
    ).select(key_col, "ib.i", "ib.bucket")
    return (
        lookups.join(F.broadcast(sketch), ["i", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce("c", F.lit(0))).cast("bigint").alias("cms_count")
        )
    )


BLOOM_BITS = 2048
BLOOM_HASHES = 3


def _bloom_bit(key: Column, i: int) -> Column:
    return (
        hashing.md5_int32(F.concat(F.lit(f"b{i}:"), key.cast("string"))) % BLOOM_BITS
    )


def _bloom_bit_sql(key_expr: str, i: int) -> str:
    inner = f"'b{i}:' || CAST({key_expr} AS VARCHAR)"
    return f"({hashing.md5_int32_sql(inner)} % {BLOOM_BITS})"


def bloom_build(rows: DataFrame, key_col: str) -> DataFrame:
    """One-column (bit) relation: the set bits of an m-bit / k-hash bloom
    filter over the key stream. At most BLOOM_BITS rows regardless of
    input size — the membership analog of the count-min build."""
    return (
        rows.select(
            F.explode(
                F.array(*[_bloom_bit(F.col(key_col), i) for i in range(BLOOM_HASHES)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(bloom: DataFrame, probes: DataFrame, key_col: str) -> DataFrame:
    """(key, maybe_present): true iff all k bits are set. No false
    negatives by construction; false-positive rate ~ (set_bits/m)^k. The
    bloom relation (<= m rows) always broadcasts — the probe side never
    shuffles."""
    lookups = probes.select(
        F.col(key_col),
        F.explode(
            F.array(*[_bloom_bit(F.col(key_col), i) for i in range(BLOOM_HASHES)])
        ).alias("bit"),
    )
    marked = lookups.join(
        F.broadcast(bloom.withColumn("_set", F.lit(1))), "bit", "left"
    )
    # all-lookup-rows-matched, not == BLOOM_HASHES: a key repeated in the
    # probes relation contributes k rows per occurrence, and a literal-k
    # comparison would turn a genuinely-seen duplicate key into a false
    # negative — the one failure the operator guarantees away.
    return marked.groupBy(key_col).agg(
        (F.count("_set") == F.count(F.lit(1))).alias("maybe_present")
    )


HLL_M = 64  # registers (2^6)
HLL_ALPHA = 0.709  # standard alpha for m = 64
HLL_MAX_RHO = 55  # 60-bit hash minus 6 bucket bits, +1


def hll_registers(rows: DataFrame, key_col: str) -> DataFrame:
    """(bucket, rho): the m max-rank registers of a HyperLogLog sketch.

    bucket = low 6 hash bits; rho = 1 + trailing zeros of the remaining
    54 bits, computed portably as the binary-string length of the lowest
    set bit (v & -v) — no log2/pow, so DuckDB reproduces the exact
    registers. The build is one groupBy(bucket).max — constant 64-row
    state for any key cardinality, and the shuffle carries at most m rows
    per map task (map-side partial MAX).
    """
    h = hashing.md5_int60(F.col(key_col).cast("string"))
    # integer shift, not h/64: double division drops bits above 2^53
    b = rows.select((h % HLL_M).alias("bucket"), F.shiftright(h, 6).alias("v"))
    low = F.col("v").bitwiseAND(-F.col("v"))
    rho = F.when(F.col("v") == 0, F.lit(HLL_MAX_RHO)).otherwise(
        F.length(F.conv(low.cast("string"), 10, 2))
    )
    return b.select("bucket", rho.alias("rho")).groupBy("bucket").agg(
        F.max("rho").alias("rho")
    )


def hll_estimate(registers: DataFrame, *, exact_hashes: bool = True) -> DataFrame:
    """One-row (hll_estimate) from the registers.

    The harmonic sum folds in bucket order over exact dyadic terms
    (1.0 / (1 << rho)) — a fixed-order IEEE fold, bit-identical in any
    engine; empty buckets contribute 2^0 = 1. Raw estimator only (no
    small/large-range correction): the oracle runs the identical formula,
    so the verdict pins the full pipeline, not a bias table.

    ``exact_hashes=False`` is the production mode: a plain ``F.sum`` over
    the 64 register terms (partial-aggregatable, no array). The register
    array is fixed-width so there is no skew hazard either way — the flag
    exists for the determinism-tax A/B and API symmetry with
    ``graph.pagerank``; results differ from the exact fold only by float
    reassociation in the last ulps (tolerance test in
    ``tests/test_operators.py``).
    """
    spark = registers.sparkSession
    all_buckets = spark.range(HLL_M).select(F.col("id").cast("bigint").alias("bucket"))
    regs = all_buckets.join(F.broadcast(registers), "bucket", "left").select(
        "bucket",
        # exact dyadic 2^-rho: integer shift then divide (pow() is not
        # guaranteed exact cross-engine; 1.0 / 2^k is)
        F.expr(
            "CAST(1.0 AS DOUBLE) / shiftleft(CAST(1 AS BIGINT),"
            " CAST(COALESCE(rho, 0) AS INT))"
        ).alias("term"),
    )
    if exact_hashes:
        folded = regs.agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bucket", "term"))),
                    lambda s: s["term"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("s")
        )
    else:
        folded = regs.agg(F.sum("term").alias("s"))
    return folded.select(
        (F.lit(HLL_ALPHA) * HLL_M * HLL_M / F.col("s")).alias("hll_estimate")
    )


def hll_sql(table: str, key_expr: str) -> str:
    """DuckDB query computing the identical registers + estimate."""
    h = hashing.md5_int60_sql(f"CAST({key_expr} AS VARCHAR)")
    return f"""
        WITH b AS (
            SELECT {h} % {HLL_M} AS bucket, {h} // {HLL_M} AS v FROM {table}
        ), r AS (
            SELECT bucket,
                   MAX(CASE WHEN v = 0 THEN {HLL_MAX_RHO}
                            ELSE length(bin(v & -v)) END) AS rho
            FROM b GROUP BY bucket
        ), regs AS (
            SELECT m.bucket, COALESCE(r.rho, 0) AS rho
            FROM (SELECT unnest(generate_series(0, {HLL_M - 1})) AS bucket) m
            LEFT JOIN r USING (bucket)
        )
        SELECT {HLL_ALPHA} * {HLL_M} * {HLL_M}
               / list_reduce(
                     list_prepend(CAST(0.0 AS DOUBLE),
                                  list(1.0 / (1::BIGINT << rho) ORDER BY bucket)),
                     (a, x) -> a + x) AS hll_estimate
        FROM regs
    """


def count_min_join_size(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """One-row (est_join_size) estimate of |A join B| on the sketched key:
    min over the d rows of the counter dot-product — the classic
    AMS/CM join-cardinality estimate (upper bound in expectation per row;
    the min tightens it). Both sketches are <= d*w rows, so this costs a
    broadcast join of two constant-size relations — the pre-flight that
    predicts a shuffle join's output volume without running it.

    The dot products are integer arithmetic (exact, order-insensitive) —
    no FP ordering concerns.
    """
    a = sketch_a.select("i", "bucket", F.col("c").alias("ca"))
    b = sketch_b.select("i", "bucket", F.col("c").alias("cb"))
    per_row = (
        a.join(F.broadcast(b), ["i", "bucket"])
        .groupBy("i")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    return per_row.agg(F.min("dot").cast("bigint").alias("est_join_size"))


QH_BUCKETS = 256


def quantile_histogram(rows: DataFrame, value_col: str) -> DataFrame:
    """(bucket, c, lo, w): an equi-width histogram sketch of a value
    stream — <= QH_BUCKETS counter rows plus the (lo, w) frame, built in
    one bounded groupBy after a 1-row min/max broadcast. The quantile
    analog of the CMS/bloom/HLL bounded-state family.
    """
    # w floored at 1e-9: a constant-valued (or single-row) stream has
    # max == min, and floor(0/0) is NaN in Spark vs NULL in DuckDB — with
    # the floor every value lands deterministically in bucket 0.
    stats = rows.agg(
        F.min(value_col).alias("lo"),
        F.greatest(
            (F.max(value_col) - F.min(value_col)) / F.lit(float(QH_BUCKETS)),
            F.lit(1e-9),
        ).alias("w"),
    )
    b = F.least(
        F.lit(QH_BUCKETS - 1),
        F.greatest(
            F.lit(0).cast("bigint"),
            F.floor((F.col(value_col) - F.col("lo")) / F.col("w")),
        ),
    )
    return (
        rows.crossJoin(F.broadcast(stats))
        .select(b.alias("bucket"), "lo", "w")
        .groupBy("bucket", "lo", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def quantile_estimates(hist: DataFrame, qs: list[float]) -> DataFrame:
    """(q, est): upper-bucket-edge quantile estimates from the histogram.

    For each q, the estimate is the upper edge of the first bucket whose
    running count reaches ceil(q * N) — error bounded by one bucket width.
    Everything runs on the <= QH_BUCKETS-row histogram: the window and the
    per-q argmin are constant-size work whatever the input was.
    """
    from pyspark.sql.window import Window

    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bucket",
        "lo",
        "w",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    qdf = hist.sparkSession.createDataFrame([(q,) for q in qs], "q double")
    hits = cum.crossJoin(F.broadcast(qdf)).filter(
        F.col("cum") >= F.ceil(F.col("q") * F.col("n"))
    )
    return (
        hits.groupBy("q")
        .agg(
            F.min(F.struct("bucket", "lo", "w")).alias("first_hit"),
        )
        .select(
            "q",
            (
                F.col("first_hit.lo")
                + (F.col("first_hit.bucket") + 1) * F.col("first_hit.w")
            ).alias("est"),
        )
    )


def quantile_histogram_sql(table: str, value_expr: str, qs: list[float]) -> str:
    """DuckDB query matching build + estimate, with exact rank-based truth."""
    q_values = ", ".join(f"({q})" for q in qs)
    return f"""
        WITH stats AS (
            SELECT MIN({value_expr}) AS lo,
                   GREATEST((MAX({value_expr}) - MIN({value_expr}))
                            / {float(QH_BUCKETS)}, 1e-9) AS w
            FROM {table}
        ), hist AS (
            SELECT LEAST({QH_BUCKETS - 1},
                         GREATEST(0, CAST(FLOOR(({value_expr} - lo) / w) AS BIGINT)))
                       AS bucket,
                   lo, w, COUNT(*) AS c
            FROM {table} CROSS JOIN stats
            GROUP BY 1, 2, 3
        ), cum AS (
            SELECT bucket, lo, w,
                   SUM(c) OVER (ORDER BY bucket
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(c) OVER () AS n
            FROM hist
        ), qs(q) AS (VALUES {q_values}),
        hits AS (
            SELECT q, MIN(struct_pack(bucket := bucket, lo := lo, w := w)) AS fh
            FROM cum CROSS JOIN qs
            WHERE cum >= CEIL(q * n)
            GROUP BY q
        ), ranked AS (
            SELECT {value_expr} AS v,
                   ROW_NUMBER() OVER (ORDER BY {value_expr}) AS rn,
                   COUNT(*) OVER () AS n
            FROM {table}
        )
        SELECT h.q,
               struct_extract(fh, 'lo')
               + (struct_extract(fh, 'bucket') + 1) * struct_extract(fh, 'w') AS est,
               (SELECT v FROM ranked WHERE rn = CEIL(h.q * n) LIMIT 1) AS exact
        FROM hits h, (SELECT MAX(n) AS n FROM ranked)
        ORDER BY q
    """
