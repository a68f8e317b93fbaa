"""Training-corpus preparation operators: PII scrubbing, token-budget
sequence packing, and deterministic dataset splits.

All three are JVM-built-in expressions (no Python in the hot path) with
exact DuckDB oracle equivalents:

- **PII scrub**: regex redaction of emails/phone numbers + match counts.
  Patterns avoid lookaround so the same regex runs under Java regex (Spark)
  and RE2 (DuckDB).
- **Sequence packing**: documents are hash-sharded, then greedily packed
  into fixed token-budget bins via a per-shard running token total —
  ``seq_id = shard * 2^32 + floor(cum_before / budget)``. At 100 TB the
  window runs per shard (thousands of independent partitions), never as a
  single global sort.
- **Split assignment**: md5-derived bucket in [0, 100) -> train/val/test.
  Salted with a literal so the split is independent of other md5-keyed
  sampling in the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import parallelized
from ..functions import hashing, text
from . import textstats

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"

PACK_BUDGET = 512  # tokens per packed training sequence
PACK_SHARDS = 8  # independent packing shards (scale: one window per shard)
SPLIT_SALT = "::split"  # decorrelates the split hash from other md5 keys


def scrub_pii(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact emails and phone numbers; emit per-document match counts."""
    col = F.col(text_col)
    return parallelized(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(col, F.lit(PHONE_RE), 0)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(col, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
        ).alias("clean_text"),
    )


def scrub_pii_sql(text_expr: str, id_expr: str = "doc_id") -> str:
    """DuckDB SELECT-list fragment matching :func:`scrub_pii`."""
    return f"""
        {id_expr} AS doc_id,
        CAST(len(regexp_extract_all({text_expr}, '{EMAIL_RE}')) AS INTEGER) AS n_emails,
        CAST(len(regexp_extract_all({text_expr}, '{PHONE_RE}')) AS INTEGER) AS n_phones,
        regexp_replace(regexp_replace({text_expr}, '{EMAIL_RE}', '[EMAIL]', 'g'),
                       '{PHONE_RE}', '[PHONE]', 'g') AS clean_text
    """


def pack_sequences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    budget: int = PACK_BUDGET,
    shards: int = PACK_SHARDS,
) -> DataFrame:
    """Assign each document to a fixed-token-budget training sequence.

    Greedy running-total packing inside md5-derived shards: the cumulative
    token count *before* each document, integer-divided by the budget, is
    its bin. Documents larger than the budget occupy their own bin(s).
    Shards are independent — the Window partitions by shard, so the plan is
    N parallel windows, not one global sort.
    """
    n_tokens = text.token_count(F.col(text_col))
    shard = (hashing.md5_int32(F.col(id_col).cast("string")) % shards).cast("int")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
        shard.alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.col("shard").cast("bigint") * F.lit(1 << 32) + F.floor(cum_before / budget))
        .cast("bigint")
        .alias("seq_id"),
    )


def pack_sequences_sql(
    table: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    *,
    budget: int = PACK_BUDGET,
    shards: int = PACK_SHARDS,
) -> str:
    """DuckDB query matching :func:`pack_sequences` (same constants)."""
    return f"""
        WITH base AS (
            SELECT {id_expr} AS doc_id,
                   {text.token_count_sql(text_expr)} AS n_tokens,
                   CAST({hashing.md5_int32_sql(f"CAST({id_expr} AS VARCHAR)")} % {shards} AS INTEGER) AS shard
            FROM {table}
        )
        SELECT doc_id, shard, n_tokens,
               CAST(shard * {1 << 32} + CAST(floor(
                   COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   / {budget}) AS BIGINT) AS BIGINT) AS seq_id
        FROM base
    """


def assign_split(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """train/val/test split from a salted md5 bucket (80/10/10)."""
    bucket = hashing.md5_int32(F.concat(F.col(id_col).cast("string"), F.lit(SPLIT_SALT))) % 100
    return docs.withColumn(
        "split",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"),
    )


def split_bucket_sql(id_expr: str = "doc_id") -> str:
    """DuckDB fragment for the salted split bucket in [0, 100)."""
    return hashing.md5_int32_sql(f"CAST({id_expr} AS VARCHAR) || '{SPLIT_SALT}'") + " % 100"


def domain_mixture(docs: DataFrame, source_col: str = "source") -> DataFrame:
    """Per-domain sampling weights toward a uniform target mixture.

    ``share = n_domain / n_total``; ``weight = (1 / n_domains) / share`` — the
    resampling factor that flattens the corpus mixture. The corpus stats are
    one aggregate row broadcast onto a domain-sized relation, so cost is a
    single pass regardless of corpus size.
    """
    per_domain = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    totals = per_domain.agg(
        F.sum("n_docs").cast("double").alias("n_total"),
        F.count(F.lit(1)).cast("double").alias("n_domains"),
    )
    share = F.col("n_docs").cast("double") / F.col("n_total")
    return (
        per_domain.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            share.alias("share"),
            ((F.lit(1.0) / F.col("n_domains")) / share).alias("weight"),
        )
        .orderBy("source")
    )


def domain_mixture_sql(table: str, source_expr: str = "source") -> str:
    """DuckDB query matching :func:`domain_mixture`."""
    return f"""
        WITH per_domain AS (
            SELECT {source_expr} AS source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM {table} GROUP BY 1
        ), totals AS (
            SELECT CAST(SUM(n_docs) AS DOUBLE) AS n_total,
                   CAST(COUNT(*) AS DOUBLE) AS n_domains
            FROM per_domain
        )
        SELECT source, n_docs,
               CAST(n_docs AS DOUBLE) / n_total AS share,
               (1.0 / n_domains) / (CAST(n_docs AS DOUBLE) / n_total) AS weight
        FROM per_domain CROSS JOIN totals
        ORDER BY source
    """


def sqrt_mixture(docs: DataFrame, source_col: str = "source") -> DataFrame:
    """Temperature-scaled (T=1/2) domain mixture: target shares proportional
    to ``sqrt(n_domain)`` — the square-root sampling compromise between the
    natural mixture (over-weights giant sources) and uniform (over-weights
    tiny ones), standard for multilingual/source balancing.

    T=1/2 is chosen deliberately for determinism: ``n^T`` needs libm
    ``pow``/``exp`` (last-ulp differs across engines) except at T=1/2,
    where sqrt is IEEE exact-rounded — so the scaled shares are
    bit-identical cross-engine. The sqrt-sum is a FIXED-ORDER fold over
    the domains sorted by name (float sums are not associative; a groupBy
    sum would be partition-order-dependent), fine at any scale because the
    domain relation is tiny.
    """
    per_domain = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    sqrt_n = F.sqrt(F.col("n_docs").cast("double"))
    totals = per_domain.agg(
        F.sum("n_docs").cast("double").alias("n_total"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("source"), sqrt_n.alias("s")))),
            F.lit(0.0),
            lambda a, x: a + x["s"],
        ).alias("sum_sqrt"),
    )
    share = F.col("n_docs").cast("double") / F.col("n_total")
    share_t = F.sqrt(F.col("n_docs").cast("double")) / F.col("sum_sqrt")
    return (
        per_domain.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            share.alias("share"),
            share_t.alias("share_sqrt"),
            (share_t / share).alias("weight"),
        )
        .orderBy("source")
    )


def sqrt_mixture_sql(table: str, source_expr: str = "source") -> str:
    """DuckDB mirror of :func:`sqrt_mixture` (same fixed-order fold)."""
    return f"""
        WITH per_domain AS (
            SELECT {source_expr} AS source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM {table} GROUP BY 1
        ), totals AS (
            SELECT CAST(SUM(n_docs) AS DOUBLE) AS n_total,
                   list_reduce(
                       list_prepend(CAST(0 AS DOUBLE),
                                    list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY source)),
                       (a, b) -> a + b) AS sum_sqrt
            FROM per_domain
        )
        SELECT source, n_docs,
               CAST(n_docs AS DOUBLE) / n_total AS share,
               sqrt(CAST(n_docs AS DOUBLE)) / sum_sqrt AS share_sqrt,
               (sqrt(CAST(n_docs AS DOUBLE)) / sum_sqrt)
                   / (CAST(n_docs AS DOUBLE) / n_total) AS weight
        FROM per_domain CROSS JOIN totals
        ORDER BY source
    """


def sample_stratified(
    docs: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    *,
    default_rate: float = 1.0,
    salt: str = "::stratum",
) -> DataFrame:
    """Deterministic per-stratum downsampling (domain rebalancing execution).

    A row survives iff its salted md5 bucket (0..9999) falls under its
    stratum's rate — reproducible across runs/engines, no rand(). The rates
    relation is a literal map compiled into a CASE expression, so the plan
    is scan -> filter with zero joins.
    """
    bucket = hashing.md5_int32(F.concat(F.col(id_col).cast("string"), F.lit(salt))) % 10000
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(source_col) == stratum, F.lit(float(r))).otherwise(rate)
    return docs.filter(bucket < rate * 10000)


def sample_stratified_sql(
    table: str,
    rates: dict[str, float],
    source_expr: str = "source",
    id_expr: str = "doc_id",
    *,
    default_rate: float = 1.0,
    salt: str = "::stratum",
) -> str:
    bucket = hashing.md5_int32_sql(f"CAST({id_expr} AS VARCHAR) || '{salt}'") + " % 10000"
    rate = str(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = f"CASE WHEN {source_expr} = '{stratum}' THEN {float(r)} ELSE {rate} END"
    return f"SELECT * FROM {table} WHERE {bucket} < ({rate}) * 10000"


def contaminated_test_docs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Train/test contamination: test-split documents whose exact content
    hash also appears in the train split.

    Composition of the split assignment and exact-dedup keys: one md5
    projection + one semi join on the hash — at 100 TB both sides shuffle
    only (hash, id) pairs. (Near-dup contamination = swap the md5 key for
    the MinHash band keys; same join shape.)
    """
    hashed = assign_split(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("content_hash"),
        "split",
    )
    train = hashed.filter(F.col("split") == "train").select("content_hash")
    test = hashed.filter(F.col("split") == "test")
    return (
        test.join(train, "content_hash", "left_semi")
        .select("doc_id", "content_hash")
        .orderBy("doc_id")
    )


def contaminated_test_docs_sql(table: str, text_expr: str = "text", id_expr: str = "doc_id") -> str:
    bucket = split_bucket_sql(id_expr)
    return f"""
        WITH hashed AS (
            SELECT {id_expr} AS doc_id, md5({text_expr}) AS content_hash,
                   CASE WHEN {bucket} < 80 THEN 'train'
                        WHEN {bucket} < 90 THEN 'val' ELSE 'test' END AS split
            FROM {table}
        )
        SELECT doc_id, content_hash FROM hashed
        WHERE split = 'test'
          AND content_hash IN (SELECT content_hash FROM hashed WHERE split = 'train')
        ORDER BY doc_id
    """


GOPHER_MIN_WORDS = 20  # calibrated to the fixture (docs run 10-99 tokens;
GOPHER_MAX_WORDS = 100000  # Gopher's own 50 would reject half the corpus)
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_RATIO = 0.9
GOPHER_STOPWORDS = ("the", "a")  # fixture vocabulary's function words


def gopher_rules(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher/MassiveText-style composite quality rules (Rae et al., 2021,
    arXiv:2112.11446 §A.1.1), each emitted per document with the final
    ``keep`` conjunction: word-count band, mean-word-length band,
    symbol-to-word ratio (``#``), bullet-line share, and a minimum
    function-word presence.

    Every measure is exact integer arithmetic plus ONE double division, so
    rule booleans are bit-identical cross-engine. One narrow pass, no
    shuffle, no Python — at 100 TB this is a scan-speed filter.
    """
    tok = text.tokens(F.col(text_col))
    n_words = F.size(tok)
    sum_len = F.aggregate(
        F.transform(tok, lambda w: F.length(w).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    mean_len = sum_len.cast("double") / n_words
    n_hash = F.length(F.col(text_col)) - F.length(F.regexp_replace(F.col(text_col), "#", ""))
    symbol_ratio = n_hash.cast("double") / n_words
    lines = F.split(F.col(text_col), "\n")
    bullet_ratio = (
        F.size(F.filter(lines, lambda l: l.startswith("- "))).cast("double") / F.size(lines)
    )
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.filter(tok, lambda w: F.array_contains(stop_arr, w)))
    r_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    r_meanlen = (mean_len >= GOPHER_MIN_MEAN_LEN) & (mean_len <= GOPHER_MAX_MEAN_LEN)
    r_symbol = symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO
    r_bullet = bullet_ratio <= GOPHER_MAX_BULLET_RATIO
    r_stop = n_stop >= 2
    return parallelized(docs).select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("int").alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        r_words.cast("int").alias("rule_word_count"),
        r_meanlen.cast("int").alias("rule_mean_len"),
        r_symbol.cast("int").alias("rule_symbol"),
        r_bullet.cast("int").alias("rule_bullet"),
        r_stop.cast("int").alias("rule_stopword"),
        (r_words & r_meanlen & r_symbol & r_bullet & r_stop).cast("int").alias("keep"),
    )


def gopher_rules_sql(table: str, text_expr: str = "text", id_expr: str = "doc_id") -> str:
    """DuckDB mirror of :func:`gopher_rules` measure-for-measure."""
    tok = text.tokens_sql(text_expr)
    return f"""
        WITH m AS (
            SELECT {id_expr} AS doc_id,
                   len({tok}) AS n_words,
                   CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform({tok}, w -> CAST(len(w) AS BIGINT))),
                        (a, b) -> a + b) AS DOUBLE) / len({tok}) AS mean_word_len,
                   CAST(len({text_expr}) - len(replace({text_expr}, '#', '')) AS DOUBLE)
                       / len({tok}) AS symbol_ratio,
                   CAST(len(list_filter(string_split({text_expr}, chr(10)),
                                        l -> l LIKE '- %')) AS DOUBLE)
                       / len(string_split({text_expr}, chr(10))) AS bullet_ratio,
                   len(list_filter({tok}, w -> w IN {GOPHER_STOPWORDS})) AS n_stop
            FROM {table}
        )
        SELECT doc_id,
               CAST(n_words AS INTEGER) AS n_words,
               mean_word_len, symbol_ratio, bullet_ratio,
               CAST(n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS} AS INTEGER) AS rule_word_count,
               CAST(mean_word_len >= {GOPHER_MIN_MEAN_LEN} AND mean_word_len <= {GOPHER_MAX_MEAN_LEN} AS INTEGER) AS rule_mean_len,
               CAST(symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO} AS INTEGER) AS rule_symbol,
               CAST(bullet_ratio <= {GOPHER_MAX_BULLET_RATIO} AS INTEGER) AS rule_bullet,
               CAST(n_stop >= 2 AS INTEGER) AS rule_stopword,
               CAST(n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
                    AND mean_word_len >= {GOPHER_MIN_MEAN_LEN} AND mean_word_len <= {GOPHER_MAX_MEAN_LEN}
                    AND symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO}
                    AND bullet_ratio <= {GOPHER_MAX_BULLET_RATIO}
                    AND n_stop >= 2 AS INTEGER) AS keep
        FROM m
    """


def filter_length_outliers(
    docs: DataFrame,
    lo_pct: int = 5,
    hi_pct: int = 95,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents whose token length lies inside the corpus
    [lo_pct, hi_pct] percentile band (length-outlier trimming).

    Percentiles are computed over the LENGTH HISTOGRAM, not the corpus: the
    per-length counts aggregate map-side to a distinct-lengths-sized
    relation, the cumulative window runs on that tiny relation (the one
    global window, documented reporting-shape), and the kept-lengths set
    broadcasts back for a semi join. No global sort of the corpus, no
    percentile interpolation — the band test is all-integer
    (100*cum_le > lo*total AND 100*cum_lt < hi*total), so Spark and DuckDB
    agree exactly even at tie-heavy boundaries.
    """
    tok_len = F.size(text.tokens(F.col(text_col)))
    lens = parallelized(docs).select(
        F.col(id_col).alias("doc_id"), tok_len.cast("int").alias("n_tokens")
    )
    hist = lens.groupBy("n_tokens").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("n_tokens").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "n_tokens",
        F.sum("c").over(w).alias("cum_le"),
        (F.sum("c").over(w) - F.col("c")).alias("cum_lt"),
    )
    total = hist.agg(F.sum("c").alias("total"))
    kept = (
        cum.crossJoin(F.broadcast(total))
        .filter(
            (100 * F.col("cum_le") > lo_pct * F.col("total"))
            & (100 * F.col("cum_lt") < hi_pct * F.col("total"))
        )
        .select("n_tokens")
    )
    return lens.join(F.broadcast(kept), "n_tokens", "left_semi").select(
        "doc_id", "n_tokens"
    )


def filter_length_outliers_sql(
    table: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    tok = text.tokens_sql(text_expr)
    return f"""
        WITH lens AS (
            SELECT {id_expr} AS doc_id, CAST(len({tok}) AS INTEGER) AS n_tokens
            FROM {table}
        ),
        hist AS (SELECT n_tokens, COUNT(*) AS c FROM lens GROUP BY n_tokens),
        cum AS (
            SELECT n_tokens,
                   SUM(c) OVER (ORDER BY n_tokens) AS cum_le,
                   SUM(c) OVER (ORDER BY n_tokens) - c AS cum_lt
            FROM hist
        ),
        total AS (SELECT SUM(c) AS total FROM hist),
        kept AS (
            SELECT n_tokens FROM cum CROSS JOIN total
            WHERE 100 * cum_le > {lo_pct} * total AND 100 * cum_lt < {hi_pct} * total
        )
        SELECT doc_id, n_tokens FROM lens
        WHERE n_tokens IN (SELECT n_tokens FROM kept)
    """


def ngram_overlap_contamination(
    docs: DataFrame,
    n: int = 3,
    min_overlap_pct: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup train/test contamination via n-gram overlap: for each
    test-split document, the share of its distinct word n-grams that also
    appear anywhere in the train split (the standard eval-decontamination
    method; exact-hash contamination is ``contaminated_test_docs``).

    The train shingle set is corpus-sized, so the probe is a keyed
    shuffle join on the shingle — never a broadcast — and the per-doc
    roll-up is a map-side-combinable count. The flag test is all-integer
    (100*matched >= pct*total), bit-identical cross-engine.
    """
    tok = text.tokens(F.col(text_col))
    sh = assign_split(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        "split",
        F.explode(text.word_shingles(tok, n)).alias("shingle"),
    )
    train = sh.filter(F.col("split") == "train").select("shingle").distinct()
    test = sh.filter(F.col("split") == "test").select("doc_id", "shingle")
    per_doc = (
        test.join(train.withColumn("hit", F.lit(1)), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("hit").isNull(), 0).otherwise(1))
            .cast("bigint")
            .alias("n_matched"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_matched",
        (100 * F.col("n_matched") >= min_overlap_pct * F.col("n_shingles"))
        .cast("int")
        .alias("contaminated"),
    )


def ngram_overlap_contamination_sql(
    table: str,
    n: int = 3,
    min_overlap_pct: int = 50,
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    bucket = split_bucket_sql(id_expr)
    sh_expr = text.word_shingles_sql(text.tokens_sql(text_expr), n)
    return f"""
        WITH sh AS (
            SELECT {id_expr} AS doc_id,
                   CASE WHEN {bucket} < 80 THEN 'train'
                        WHEN {bucket} < 90 THEN 'val' ELSE 'test' END AS split,
                   unnest({sh_expr}) AS shingle
            FROM {table}
        ),
        train AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train'),
        test AS (SELECT doc_id, shingle FROM sh WHERE split = 'test')
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN tr.shingle IS NULL THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_matched,
               CAST(100 * SUM(CASE WHEN tr.shingle IS NULL THEN 0 ELSE 1 END)
                    >= {min_overlap_pct} * COUNT(*) AS INTEGER) AS contaminated
        FROM test t LEFT JOIN train tr ON t.shingle = tr.shingle
        GROUP BY t.doc_id
    """


def pack_sequences_text(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    budget: int = PACK_BUDGET,
    shards: int = PACK_SHARDS,
    sep: str = "\n\n",
) -> DataFrame:
    """Materialize packed training sequences: the documents of each
    token-budget bin concatenated in doc_id order (the write-side half of
    ``pack_sequences``).

    One extra shuffle on seq_id after the per-shard packing window; the
    collected per-bin array is bounded by the token budget (plus at most
    one overflowing document), so collect_list never accumulates more than
    a sequence's worth of text regardless of corpus size.
    """
    assigned = pack_sequences(docs, text_col, id_col, budget=budget, shards=shards)
    with_text = assigned.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("t")),
        "doc_id",
    )
    parts = F.transform(
        F.sort_array(F.collect_list(F.struct("doc_id", "t"))), lambda s: s["t"]
    )
    return with_text.groupBy("seq_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.array_join(parts, sep).alias("sequence_text"),
    )


def pack_sequences_text_sql(
    table: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    *,
    budget: int = PACK_BUDGET,
    shards: int = PACK_SHARDS,
    sep: str = "\n\n",
) -> str:
    packed = pack_sequences_sql(table, text_expr, id_expr, budget=budget, shards=shards)
    return f"""
        WITH packed AS ({packed})
        SELECT packed.seq_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(packed.n_tokens) AS BIGINT) AS n_tokens,
               string_agg(src.{text_expr}, '{sep}' ORDER BY packed.doc_id)
                   AS sequence_text
        FROM packed JOIN {table} src ON packed.doc_id = src.{id_expr}
        GROUP BY packed.seq_id
    """


BOILERPLATE_N = 2  # span width (word n-gram) for boilerplate detection
BOILERPLATE_DF_PCT = 8  # span is boilerplate when present in >= 8% of docs


def remove_boilerplate(
    docs: DataFrame,
    n: int = BOILERPLATE_N,
    min_df_pct: int = BOILERPLATE_DF_PCT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-frequency boilerplate removal (the C4/RefinedWeb step): word
    n-gram spans that appear in at least ``min_df_pct`` percent of documents
    are dropped from every document, and the cleaned text is reassembled in
    token order.

    Every pairwise step is keyed — positional spans shuffle on the shingle
    string to meet the document-frequency set (which is corpus-derived, so
    a keyed join, never a broadcast), covered token positions are an
    anti-join on (doc, pos), and reconstruction is a per-doc aggregate whose
    state is bounded by document length. The frequency test is all-integer
    (``100*df >= pct*n_docs``), bit-identical cross-engine, and the
    threshold is relative so the operator behaves the same at any corpus
    scale.
    """
    tok = text.tokens(F.col(text_col))
    base = parallelized(docs).select(F.col(id_col).alias("doc_id"), tok.alias("tok"))
    n_spans = F.size("tok") - (n - 1)
    spans = base.select(
        "doc_id",
        F.explode(
            F.when(n_spans >= 1, F.sequence(F.lit(1), n_spans)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("start"),
        "tok",
    ).select(
        "doc_id",
        "start",
        F.array_join(F.slice("tok", F.col("start"), n), " ").alias("shingle"),
    )
    ndocs = base.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    frequent = (
        spans.select("doc_id", "shingle")
        .distinct()
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .crossJoin(F.broadcast(ndocs))
        .filter(100 * F.col("df") >= min_df_pct * F.col("n_docs"))
        .select("shingle")
    )
    covered = (
        spans.join(frequent, "shingle")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("start"), F.col("start") + (n - 1))).alias("pos"),
        )
        .distinct()
    )
    toks = base.select("doc_id", F.posexplode("tok").alias("p0", "token")).select(
        "doc_id", (F.col("p0") + 1).alias("pos"), "token"
    )
    rebuilt = (
        toks.join(covered, ["doc_id", "pos"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    return (
        base.select("doc_id", F.size("tok").cast("int").alias("n_tokens"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("int")
            .alias("n_removed"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def remove_boilerplate_sql(
    table: str,
    n: int = BOILERPLATE_N,
    min_df_pct: int = BOILERPLATE_DF_PCT,
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB query matching :func:`remove_boilerplate`."""
    tok = text.tokens_sql(text_expr)
    return f"""
        WITH base AS (
            SELECT {id_expr} AS doc_id, {tok} AS tok FROM {table}
        ),
        starts AS (
            SELECT doc_id, unnest(generate_series(1, greatest(len(tok) - {n - 1}, 0)))
                       AS start, tok
            FROM base
        ),
        sh AS (
            SELECT doc_id, start,
                   array_to_string(list_slice(tok, start, start + {n - 1}), ' ') AS shingle
            FROM starts
        ),
        ndocs AS (SELECT COUNT(*) AS n_docs FROM base),
        dfc AS (
            SELECT shingle, COUNT(*) AS df
            FROM (SELECT DISTINCT doc_id, shingle FROM sh) GROUP BY shingle
        ),
        frequent AS (
            SELECT shingle FROM dfc CROSS JOIN ndocs
            WHERE 100 * df >= {min_df_pct} * n_docs
        ),
        covered AS (
            SELECT DISTINCT doc_id, pos FROM (
                SELECT doc_id, unnest(generate_series(start, start + {n - 1})) AS pos
                FROM sh WHERE shingle IN (SELECT shingle FROM frequent)
            )
        ),
        tk AS (
            SELECT doc_id, pos, tok[pos] AS token FROM (
                SELECT doc_id, unnest(generate_series(1, len(tok))) AS pos, tok
                FROM base
            )
        ),
        rebuilt AS (
            SELECT t.doc_id,
                   CAST(COUNT(*) AS INTEGER) AS n_kept,
                   string_agg(t.token, ' ' ORDER BY t.pos) AS clean_text
            FROM tk t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
            WHERE c.pos IS NULL
            GROUP BY t.doc_id
        )
        SELECT b.doc_id,
               CAST(len(b.tok) AS INTEGER) AS n_tokens,
               CAST(len(b.tok) - COALESCE(r.n_kept, 0) AS INTEGER) AS n_removed,
               COALESCE(r.clean_text, '') AS clean_text
        FROM base b LEFT JOIN rebuilt r ON b.doc_id = r.doc_id
    """


QSAMPLE_SALT = "::qsample"  # decorrelates quality sampling from other md5 keys


def sample_quality_weighted(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    salt: str = QSAMPLE_SALT,
) -> DataFrame:
    """Quality-proportional deterministic sampling: a document survives iff
    its salted md5 bucket (0..9999) falls below ``quality * 10000`` — keep
    probability equals the quality score, reproducible across runs and
    engines (no ``rand()``).

    The score is the same exact arithmetic on int-derived doubles as
    :func:`textstats.quality_score` (identical expression tree on both
    engines, so the double compare is bit-identical); the plan is a single
    scan -> project -> filter with zero joins.
    """
    scored = textstats.quality_score(docs, text_col, id_col)
    bucket = hashing.md5_int32(F.concat(F.col("doc_id").cast("string"), F.lit(salt))) % 10000
    return scored.filter(bucket.cast("double") < F.col("quality") * 10000.0)


def sample_quality_weighted_sql(
    quality_query: str, *, salt: str = QSAMPLE_SALT
) -> str:
    """DuckDB query matching :func:`sample_quality_weighted`; wraps a query
    producing (doc_id, n_tokens, quality)."""
    bucket = hashing.md5_int32_sql(f"CAST(doc_id AS VARCHAR) || '{salt}'") + " % 10000"
    return f"""
        SELECT doc_id, n_tokens, quality FROM ({quality_query})
        WHERE CAST({bucket} AS DOUBLE) < quality * 10000.0
    """


SHORT_DOC_TOKENS = 20  # health report: docs under this token count are "short"


def corpus_health(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    lang_col: str = "lang",
    *,
    short_tokens: int = SHORT_DOC_TOKENS,
) -> DataFrame:
    """Per-source corpus health report: doc/token counts, language spread,
    exact-duplicate pressure, and short-doc share — the aggregate a pipeline
    operator watches to catch a broken source before training on it.

    One corpus-wide md5 aggregate finds duplicated content hashes; the flag
    joins back on the hash (keyed, corpus-sized — a source holding copies of
    another source's documents is charged for them), then everything rolls
    up into a single source-keyed aggregate. All counters are exact
    integers; the one double (avg_tokens) is a single exact division.
    """
    base = parallelized(docs).select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        F.md5(F.col(text_col)).alias("h"),
        text.token_count(F.col(text_col)).alias("n_tokens"),
    )
    dup_hashes = (
        base.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("h", F.lit(1).alias("is_dup"))
    )
    return (
        base.join(dup_hashes, "h", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("bigint").alias("n_dup_docs"),
            F.sum((F.col("n_tokens") < short_tokens).cast("int"))
            .cast("bigint")
            .alias("n_short_docs"),
        )
        .withColumn("avg_tokens", F.col("total_tokens").cast("double") / F.col("n_docs"))
    )


def corpus_health_sql(
    table: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    source_expr: str = "source",
    lang_expr: str = "lang",
    *,
    short_tokens: int = SHORT_DOC_TOKENS,
) -> str:
    """DuckDB query matching :func:`corpus_health`."""
    return f"""
        WITH base AS (
            SELECT {id_expr} AS doc_id, {source_expr} AS source, {lang_expr} AS lang,
                   md5({text_expr}) AS h,
                   {text.token_count_sql(text_expr)} AS n_tokens
            FROM {table}
        ),
        dup_hashes AS (
            SELECT h, 1 AS is_dup FROM base GROUP BY h HAVING COUNT(*) > 1
        )
        SELECT b.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(b.n_tokens) AS BIGINT) AS total_tokens,
               CAST(COUNT(DISTINCT b.lang) AS BIGINT) AS n_langs,
               CAST(SUM(COALESCE(d.is_dup, 0)) AS BIGINT) AS n_dup_docs,
               CAST(SUM(CASE WHEN b.n_tokens < {short_tokens} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_short_docs,
               CAST(SUM(b.n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens
        FROM base b LEFT JOIN dup_hashes d ON b.h = d.h
        GROUP BY b.source
    """


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    *,
    files_per_split: int = PACK_SHARDS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Export the corpus as training shards: parquet partitioned by split
    (train/val/test directories), a deterministic number of files per
    split, rows hash-routed so the layout is reproducible across runs.

    ``repartition(files_per_split, shard)`` routes by the salted md5 shard
    — not round-robin — so a retried/speculated write produces bit-identical
    shards. Readers prune on the split directory (partition pruning), and
    files_per_split is the knob that matches shard count to the training
    job's data-loader parallelism.
    """
    shard = (hashing.md5_int32(F.col(id_col).cast("string")) % files_per_split).cast("int")
    (
        assign_split(docs, id_col)
        .withColumn("shard", shard)
        .repartition(files_per_split, "shard")
        .sortWithinPartitions(id_col)
        .write.mode("overwrite")
        .partitionBy("split")
        .parquet(out_dir)
    )


# ---------------------------------------------------------------------------
# Document chunking with overlap (RAG / context-window prep)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 64  # tokens per chunk
CHUNK_STRIDE = 48  # tokens between chunk starts (overlap = SIZE - STRIDE)


def chunk_documents(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap.

    ``n_chunks = 1 + ceil(max(n_tokens - size, 0) / stride)`` — every token
    lands in at least one chunk and a short document still yields exactly
    one chunk (never zero, so no document silently disappears from the
    retrieval index).

    The whole operator is narrow (tokenize -> sequence -> explode -> slice):
    no shuffle, no Python, fully pipelined inside one codegen stage. At
    100 TB the chunk explosion multiplies rows ~n_tokens/stride x, but each
    output row is bounded (``size`` tokens), so downstream embedding /
    indexing stages see uniformly-sized units — this is what makes the
    operator preferable to shipping whole documents to an embedder.
    """
    toks = text.tokens(F.col(text_col))
    d = parallelized(docs).select(
        F.col(id_col),
        toks.alias("toks"),
    )
    n_extra = F.greatest(F.size("toks") - F.lit(size), F.lit(0))
    n_chunks = (F.lit(1) + F.floor((n_extra + F.lit(stride - 1)) / F.lit(stride))).cast("int")
    e = d.select(
        F.col(id_col),
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_id"),
    )
    start = (F.col("chunk_id") * stride + 1).cast("int")
    piece = F.slice(F.col("toks"), start, size)
    return e.select(
        F.col(id_col),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(piece).cast("bigint").alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    ).orderBy(id_col, "chunk_id")


def chunk_documents_sql(
    table: str,
    *,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
) -> str:
    tok = text.tokens_sql(text_expr)
    lo = "chunk_id * {s} + 1".format(s=stride)
    hi = "chunk_id * {s} + {z}".format(s=stride, z=size)
    return f"""
        WITH d AS (
            SELECT {id_expr} AS doc_id, {tok} AS toks FROM {table}
        ), n AS (
            SELECT doc_id, toks,
                   1 + ((greatest(len(toks) - {size}, 0) + {stride - 1}) // {stride}) AS n_chunks
            FROM d
        ), e AS (
            SELECT doc_id, toks,
                   unnest(generate_series(0, n_chunks - 1)) AS chunk_id
            FROM n
        )
        SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
               CAST(len(toks[{lo} : {hi}]) AS BIGINT) AS n_chunk_tokens,
               array_to_string(toks[{lo} : {hi}], ' ') AS chunk_text
        FROM e
    """


# ---------------------------------------------------------------------------
# URL canonicalization + per-domain dedup (RefinedWeb/CCNet-style)
# ---------------------------------------------------------------------------

URL_SCHEME_RE = r"^[a-z]+://"
URL_WWW_RE = r"^www\."
URL_FRAGMENT_RE = r"#.*$"
URL_QUERY_RE = r"\?.*$"
URL_TRAILING_SLASH_RE = r"/+$"

# One shared strip order for BOTH engines (Spark + DuckDB oracle), so the
# two normalizers can never diverge. Fragment strips before query: in
# 'a?x#y' the fragment is the trailing part. Neither engine's '.' crosses
# a newline (Java regex and RE2 agree), so a literal newline inside a URL
# — degenerate input — truncates both sides identically.
URL_STRIP_RES = (URL_SCHEME_RE, URL_WWW_RE, URL_FRAGMENT_RE, URL_QUERY_RE, URL_TRAILING_SLASH_RE)


def normalize_url(col):
    """Canonicalize a URL: lowercase, strip scheme, leading ``www.``,
    fragment, query string, and trailing slashes. Pure regex chain —
    identical semantics under Java regex and RE2, no Python."""
    out = F.lower(col)
    for pat in URL_STRIP_RES:
        out = F.regexp_replace(out, pat, "")
    return out


def normalize_url_sql(expr: str) -> str:
    out = f"lower({expr})"
    for pat in URL_STRIP_RES:
        out = f"regexp_replace({out}, '{pat}', '')"
    return out


def url_dedup_domain_summary(
    docs: DataFrame,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonical-URL dedup rolled up per domain.

    Two map-side-combinable aggregations: URLs normalize row-wise, the
    keep-one-per-URL rule is ``min(doc_id)`` per canonical URL (one
    groupBy), and the domain rollup is a second, much smaller groupBy.
    At 100 TB the first shuffle is keyed on the canonical URL — high
    cardinality, naturally uniform; hot domains do NOT hot-spot it because
    the key is the full URL, not the domain.
    """
    norm = normalize_url(F.col(url_col))
    per_url = (
        parallelized(docs)
        .select(F.col(id_col), norm.alias("norm_url"))
        .withColumn("domain", F.regexp_extract("norm_url", r"^([^/]+)", 1))
        .groupBy("domain", "norm_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    return (
        per_url.groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_unique_urls"),
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            (F.sum("n_docs") - F.count(F.lit(1))).cast("bigint").alias("n_dropped"),
            F.min("keep_id").cast("bigint").alias("first_keep_id"),
        )
        .orderBy("domain")
    )


def url_dedup_domain_summary_sql(seeded_cte: str, *, url_expr: str = "url") -> str:
    """Oracle mirror of :func:`url_dedup_domain_summary` over a seeded CTE."""
    norm = normalize_url_sql(url_expr)
    return f"""
        WITH seeded AS ({seeded_cte}),
        per_url AS (
            SELECT regexp_extract(norm_url, '^([^/]+)', 1) AS domain,
                   norm_url,
                   MIN(doc_id) AS keep_id,
                   COUNT(*) AS n_docs
            FROM (SELECT doc_id, {norm} AS norm_url FROM seeded)
            GROUP BY 1, 2
        )
        SELECT domain,
               CAST(COUNT(*) AS BIGINT) AS n_unique_urls,
               CAST(SUM(n_docs) AS BIGINT) AS n_docs,
               CAST(SUM(n_docs) - COUNT(*) AS BIGINT) AS n_dropped,
               CAST(MIN(keep_id) AS BIGINT) AS first_keep_id
        FROM per_url
        GROUP BY domain
    """


# ---------------------------------------------------------------------------
# Per-domain document quota (RefinedWeb-style source balancing)
# ---------------------------------------------------------------------------

DOMAIN_CAP = 10


def sample_domain_cap(
    docs: DataFrame,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
    cap: int = DOMAIN_CAP,
) -> DataFrame:
    """Keep at most ``cap`` documents per domain, best-quality first.

    Ranking is a per-domain window (quality desc, id asc for determinism);
    the rank<=cap filter is recognized by Spark as a group limit, so each
    partition keeps only ``cap`` rows per key before the shuffle merges
    them (WindowGroupLimit — pinned in test_plans). A hot domain therefore
    contributes ``cap`` rows per map partition, not its full row count:
    the quota itself is what defuses domain skew at 100 TB.
    """
    w = Window.partitionBy(source_col).orderBy(F.col(quality_col).desc(), F.col(id_col))
    return (
        parallelized(docs)
        .select(F.col(source_col), F.col(id_col), F.col(quality_col))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= cap)
        .orderBy(source_col, "rnk")
    )


def sample_domain_cap_sql(
    table: str,
    *,
    source_expr: str = "source",
    id_expr: str = "doc_id",
    quality_expr: str = "n_chars",
    cap: int = DOMAIN_CAP,
) -> str:
    return f"""
        SELECT {source_expr} AS source, {id_expr} AS doc_id,
               {quality_expr} AS n_chars, CAST(rnk AS INTEGER) AS rnk
        FROM (
            SELECT {source_expr}, {id_expr}, {quality_expr},
                   ROW_NUMBER() OVER (
                       PARTITION BY {source_expr}
                       ORDER BY {quality_expr} DESC, {id_expr}
                   ) AS rnk
            FROM {table}
        )
        WHERE rnk <= {cap}
    """


def write_jsonl_shards(
    docs: DataFrame,
    out_dir: str,
    *,
    n_shards: int = PACK_SHARDS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Export the corpus as JSONL shards — the interchange format most LLM
    training loaders consume ({"id": ..., "text": ...} per line).

    Rows hash-route to a deterministic shard (never round-robin: retried
    and speculated tasks must produce bit-identical files) and sort by id
    within each shard, so the export is byte-reproducible. The layout is
    ``out_dir/shard=K/part-*`` with exactly one file per shard:
    ``repartition(n, shard)`` colocates each shard value in one task and
    ``partitionBy`` names the directory by value (hash collisions between
    shard values only co-task them, never merge files). ``to_json`` of an
    explicit struct pins field order; the write is Spark's text sink —
    one pass, no driver involvement, scales with the cluster.
    """
    shard = (hashing.md5_int32(F.col(id_col).cast("string")) % n_shards).cast("int")
    (
        parallelized(docs)
        .select(
            F.col(id_col),
            F.to_json(
                F.struct(
                    F.col(id_col).alias("id"), F.col(text_col).alias("text")
                )
            ).alias("value"),
            shard.alias("shard"),
        )
        .repartition(n_shards, "shard")
        .sortWithinPartitions(id_col)
        .select("value", "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .text(out_dir)
    )


CHUNK_SIZE = 32  # tokens per overlapping chunk
CHUNK_STRIDE = 24  # tokens between consecutive chunk starts (overlap = 8)


def chunk_overlap(
    docs: DataFrame,
    *,
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token chunks with overlapping stride
    — the context-window / RAG chunking prep step (each chunk carries
    ``size`` tokens, consecutive chunks share ``size - stride``).

    Returns ``(doc_id, chunk_id, n_tokens, chunk_text)``; every document
    yields at least one chunk (a short doc is its own single chunk), and
    the final chunk may run short rather than padding past the end.

    Scale shape: entirely map-side — tokenize, compute the start count in
    exact integer arithmetic, explode a per-doc ``sequence``, slice. No
    join, no aggregate, no window; the only exchange in the plan is the
    rangepartitioning for the result's ORDER BY contract, so the operator
    is embarrassingly parallel at any corpus size. The start-count
    division ``(dl - size + stride - 1) / stride`` keeps both operands
    positive (guarded by the ``dl <= size`` branch), so floor == truncate
    and Spark's FLOOR matches DuckDB's ``//`` exactly.
    """
    toks = text.tokens(F.col(text_col))
    d = parallelized(docs).select(
        F.col(id_col).alias("doc_id"), toks.alias("toks"), F.size(toks).alias("dl")
    )
    n_starts = F.when(F.col("dl") <= size, F.lit(1)).otherwise(
        (F.lit(1) + F.floor((F.col("dl") - size + stride - 1) / stride)).cast("int")
    )
    e = d.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_starts - F.lit(1))).alias("chunk_id"),
    )
    piece = F.slice(F.col("toks"), (F.col("chunk_id") * stride + 1).cast("int"), size)
    return e.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(piece).cast("int").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_id")


def chunk_overlap_sql(
    table: str,
    *,
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB query matching :func:`chunk_overlap`."""
    tok = text.tokens_sql(text_expr)
    return f"""
        WITH base AS (
            SELECT {id_expr} AS doc_id, {tok} AS toks, len({tok}) AS dl
            FROM {table}
        ), starts AS (
            SELECT doc_id, toks,
                   unnest(generate_series(0,
                       CASE WHEN dl <= {size} THEN 0
                            ELSE (dl - {size} + {stride} - 1) // {stride} END)) AS chunk_id
            FROM base
        )
        SELECT doc_id,
               CAST(chunk_id AS INTEGER) AS chunk_id,
               CAST(len(list_slice(toks, chunk_id * {stride} + 1,
                                   chunk_id * {stride} + {size})) AS INTEGER) AS n_tokens,
               array_to_string(list_slice(toks, chunk_id * {stride} + 1,
                                          chunk_id * {stride} + {size}), ' ') AS chunk_text
        FROM starts
        ORDER BY doc_id, chunk_id
    """


# --- DSIR-style importance resampling ---------------------------------------

DSIR_BUCKETS = 4096  # hashed-ngram feature width (Xie et al. use 10k-ish)
DSIR_SALT = "dsir1"
DSIR_SCALE = 1000  # acceptance threshold resolution


def importance_resample(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023) —
    the hashed-ngram importance-weighting shape: each document is scored
    by the log-likelihood RATIO of a target-domain model vs the raw-corpus
    model over hashed unigram features, then resampled with probability
    proportional to its (min-max normalized) importance.

    Both "models" here are deterministic per-bucket integer scores derived
    from md5 of the bucket id (a production run drops in the two trained
    hashed-ngram bigram models — O(buckets) integers, broadcast-sized or
    inlined, identical plan); the per-occurrence contribution
    ``t(b) - s(b)`` stands in for ``log p_target(b) - log p_source(b)``,
    keeping every sum BIGINT so the oracle matches bit-for-bit. The
    acceptance draw is a salted md5 of the doc id — reproducible across
    runs, engines, and retries, unlike ``rand()``.

    Scale shape: importance is ONE map-side projection with a per-row
    fold (zero shuffles); normalization needs the global (min, max) — a
    single 1-row aggregate broadcast back; acceptance is a pure filter.
    Nothing here grows with corpus size except the scan itself.
    """
    tok = text.tokens(F.col(text_col))
    contribs = F.transform(
        tok,
        lambda x: (
            F.pmod(
                hashing.md5_int32(
                    F.concat(
                        F.pmod(
                            hashing.md5_int32(F.concat(x, F.lit("|" + DSIR_SALT))),
                            F.lit(DSIR_BUCKETS),
                        ).cast("string"),
                        F.lit("|t" + DSIR_SALT),
                    )
                ),
                F.lit(7),
            )
            - F.pmod(
                hashing.md5_int32(
                    F.concat(
                        F.pmod(
                            hashing.md5_int32(F.concat(x, F.lit("|" + DSIR_SALT))),
                            F.lit(DSIR_BUCKETS),
                        ).cast("string"),
                        F.lit("|s" + DSIR_SALT),
                    )
                ),
                F.lit(7),
            )
        ).cast("bigint"),
    )
    importance = F.aggregate(
        contribs, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    scored = parallelized(docs).select(
        F.col(id_col).alias("doc_id"), importance.alias("importance")
    )
    bounds = scored.agg(
        F.min("importance").alias("min_imp"), F.max("importance").alias("max_imp")
    )
    accept = F.when(
        F.col("max_imp") > F.col("min_imp"),
        F.expr(
            f"(importance - min_imp) * {DSIR_SCALE} div (max_imp - min_imp)"
        ),
    ).otherwise(F.lit(DSIR_SCALE // 2)).cast("bigint")
    draw = F.pmod(
        hashing.md5_int32(
            F.concat(F.col("doc_id").cast("string"), F.lit("|u" + DSIR_SALT))
        ),
        F.lit(DSIR_SCALE + 1),
    )
    return (
        scored.crossJoin(F.broadcast(bounds))
        .select(
            "doc_id",
            "importance",
            accept.alias("accept_scaled"),
        )
        .filter(draw <= F.col("accept_scaled"))
    )


def importance_resample_sql(
    table: str, *, text_expr: str = "text", id_expr: str = "doc_id"
) -> str:
    """DuckDB query matching :func:`importance_resample`."""
    tok = text.tokens_sql(text_expr)
    bucket = (
        hashing.md5_int32_sql(f"x || '|{DSIR_SALT}'") + f" % {DSIR_BUCKETS}"
    )
    t_m = (
        hashing.md5_int32_sql(f"CAST(({bucket}) AS VARCHAR) || '|t{DSIR_SALT}'")
        + " % 7"
    )
    s_m = (
        hashing.md5_int32_sql(f"CAST(({bucket}) AS VARCHAR) || '|s{DSIR_SALT}'")
        + " % 7"
    )
    draw = (
        hashing.md5_int32_sql(f"CAST(doc_id AS VARCHAR) || '|u{DSIR_SALT}'")
        + f" % {DSIR_SCALE + 1}"
    )
    return f"""
        WITH scored AS (
            SELECT {id_expr} AS doc_id,
                   CAST(list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                           list_transform({tok},
                               x -> CAST(({t_m}) - ({s_m}) AS BIGINT))),
                       (acc, v) -> acc + v) AS BIGINT) AS importance
            FROM {table}
        ), bounds AS (
            SELECT MIN(importance) AS min_imp, MAX(importance) AS max_imp
            FROM scored
        )
        SELECT doc_id, importance, accept_scaled
        FROM (
            SELECT doc_id, importance,
                   CAST(CASE WHEN max_imp > min_imp
                             THEN (importance - min_imp) * {DSIR_SCALE}
                                  // (max_imp - min_imp)
                             ELSE {DSIR_SCALE // 2} END AS BIGINT)
                       AS accept_scaled
            FROM scored CROSS JOIN bounds
        )
        WHERE ({draw}) <= accept_scaled
    """


# --- weighted sampling without replacement (A-ES) ----------------------------

AES_SALT = "aes1"


def weighted_sample_topk(
    docs: DataFrame,
    k: int,
    *,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = AES_SALT,
) -> DataFrame:
    """Weighted random sampling WITHOUT replacement via exponential keys
    (Efraimidis & Spirakis 2006, algorithm A-ES): each row draws a
    deterministic uniform u from a salted md5 of its id and scores
    ``u^(1/w)``; the k largest keys are exactly a weight-proportional
    without-replacement sample. The md5-derived u makes the sample
    reproducible across runs, partitionings, and retries — no ``rand()``,
    no seed-per-partition drift.

    Scale shape: one map-side projection + a TakeOrdered top-k — no
    shuffle of the corpus, driver receives k rows' worth of keys only
    (inside the engine as a reduction, not a collect). This is the
    one-pass distributed form of weighted reservoir sampling. pow() keeps
    this utility OUTSIDE the oracle-gated registry (libm last-ulp
    variance — the no-libm discipline); correctness is pinned by the
    pytest distribution test instead.

    Rows with non-positive weight are excluded (A-ES precondition).
    """
    u = (
        F.pmod(
            hashing.md5_int32(
                F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))
            ),
            F.lit(1 << 30),
        ).cast("double")
        + 0.5
    ) / float(1 << 30)
    key = F.pow(u, 1.0 / F.col(weight_col).cast("double"))
    return (
        docs.filter(F.col(weight_col) > 0)
        .withColumn("aes_key", key)
        .orderBy(F.col("aes_key").desc(), F.col(id_col))
        .limit(k)
    )
