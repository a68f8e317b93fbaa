"""Text analysis operators: stats, quality scoring, language ID heuristic,
document fingerprinting.

All expressions are JVM built-ins (no Python UDFs) and have exact DuckDB
oracle equivalents. The rolling fingerprint folds token hashes left-to-right
modulo 2^31-1, so it is order-sensitive (detects reorderings that set-based
dedup misses) yet overflow-free in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..catalog import parallelized
from ..functions import hashing, text

FINGERPRINT_MOD = 2147483647  # 2^31 - 1
FINGERPRINT_MUL = 31


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats: chars, tokens, distinct tokens, avg token length,
    stopword ratio, BPE-ish token estimate."""
    tok = text.tokens(F.col(text_col))
    n_tok = F.size(tok)
    total_len = F.aggregate(
        F.transform(tok, lambda w: F.length(w).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    stop_arr = F.array(*[F.lit(s) for s in text.STOPWORDS])
    n_stop = F.size(F.filter(tok, lambda w: F.array_contains(stop_arr, w)))
    return parallelized(docs).select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("bigint").alias("n_chars_calc"),
        n_tok.cast("int").alias("n_tokens"),
        F.size(F.array_distinct(tok)).cast("int").alias("n_distinct_tokens"),
        (total_len.cast("double") / n_tok).alias("avg_token_len"),
        (n_stop.cast("double") / n_tok).alias("stopword_ratio"),
        text.bpe_token_estimate(F.col(text_col)).alias("bpe_tokens"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality score in [0, 1]: favors mid-length documents, high
    lexical diversity, low stopword saturation. Deterministic arithmetic
    (single divisions/multiplications of exact-int-derived doubles)."""
    stats = text_stats(docs, text_col, id_col)
    length_score = F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0))
    diversity = F.col("n_distinct_tokens").cast("double") / F.col("n_tokens")
    stop_penalty = F.lit(1.0) - F.col("stopword_ratio")
    return stats.select(
        "doc_id",
        "n_tokens",
        (length_score * 0.4 + diversity * 0.4 + stop_penalty * 0.2).alias("quality"),
    )


def quality_score_sql(table: str, text_expr: str = "text", id_expr: str = "doc_id") -> str:
    """DuckDB query matching :func:`quality_score` (doc_id, n_tokens, quality)."""
    tok = text.tokens_sql(text_expr)
    stop_list = "[" + ", ".join(f"'{s}'" for s in text.STOPWORDS) + "]"
    return f"""
    WITH t AS (SELECT {id_expr} AS doc_id, {tok} AS tok FROM {table}),
    s AS (
        SELECT doc_id,
               CAST(len(tok) AS INTEGER) AS n_tokens,
               CAST(len(list_distinct(tok)) AS DOUBLE) / len(tok) AS diversity,
               CAST(len(list_filter(tok, w -> list_contains({stop_list}, w))) AS DOUBLE)
                   / len(tok) AS stopword_ratio
        FROM t
    )
    SELECT doc_id, n_tokens,
           LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
             + diversity * 0.4
             + (1.0 - stopword_ratio) * 0.2 AS quality
    FROM s
    """


# Marker tokens per language for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "de", "los", "es"),
}


def _marker_hits(tok: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tok, lambda w: F.array_contains(arr, w)))


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-token language ID: argmax of per-language stopword hit counts,
    'und' (undetermined) when nothing matches. A real system would use
    character n-gram profiles; the operator shape (wide CASE over aggregate
    hit counts, one pass) is the same."""
    tok = text.tokens(F.col(text_col))
    hit_cols = {lang: _marker_hits(tok, m) for lang, m in LANG_MARKERS.items()}
    best = F.lit("und")
    best_hits = F.lit(0)
    # iterate deterministically; strictly-greater keeps first-wins tie policy
    for lang in LANG_MARKERS:
        is_better = hit_cols[lang] > best_hits
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_hits = F.when(is_better, hit_cols[lang]).otherwise(best_hits)
    return parallelized(docs).select(
        F.col(id_col).alias("doc_id"),
        best.alias("lang_pred"),
        best_hits.cast("int").alias("marker_hits"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive rolling document fingerprint.

    fp = fold(tokens, 0, (acc, w) -> (acc*31 + h32(w)) mod (2^31-1)) — a
    Rabin-Karp-style polynomial hash; intermediate values stay < 2^37 so
    int64 never overflows (DuckDB would raise, Spark would wrap).
    """
    tok = text.tokens(F.col(text_col))
    hashes = F.transform(tok, lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("bigint"))
    fp = F.aggregate(
        hashes,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * FINGERPRINT_MUL + h) % FINGERPRINT_MOD,
    )
    return parallelized(docs).select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))


def fingerprint_sql(text_expr: str) -> str:
    """DuckDB oracle fragment for :func:`fingerprint`.

    DuckDB's list_reduce has no init accumulator (first element seeds the
    fold), so a literal 0 is prepended to replicate Spark's aggregate(0,..).
    """
    hashes = f"list_transform({text.tokens_sql(text_expr)}, w -> {hashing.md5_int32_sql('w')})"
    return (
        f"list_reduce(list_concat([CAST(0 AS BIGINT)], {hashes}), "
        f"(acc, h) -> (acc * {FINGERPRINT_MUL} + h) % {FINGERPRINT_MOD})"
    )


def repetition_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", *, ngram_n: int = 2) -> DataFrame:
    """Intra-document repetition: share of the text's n-grams taken by its
    single most frequent n-gram (the boilerplate/spam signal used by corpus
    quality filters).

    One explode + (doc, gram) count + per-doc max/sum — all map-side
    combinable aggregates; nothing pairwise.
    """
    tok = text.tokens(F.col(text_col))
    count = F.size(tok) - (ngram_n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.array_join(F.slice(tok, i, ngram_n), " "),
    )
    safe = F.when(count >= 1, grams).otherwise(F.array().cast("array<string>"))
    per_gram = (
        parallelized(docs)
        .select(F.col(id_col).alias("doc_id"), F.explode(safe).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_gram.groupBy("doc_id").agg(
        F.max("c").cast("int").alias("top_ngram_count"),
        F.sum("c").cast("bigint").alias("n_ngrams"),
        (F.max("c").cast("double") / F.sum("c")).alias("repetition_ratio"),
    )


def repetition_score_sql(table: str, text_expr: str = "text", id_expr: str = "doc_id", *, ngram_n: int = 2) -> str:
    tok = text.tokens_sql(text_expr)
    grams = (
        f"CASE WHEN len({tok}) - {ngram_n - 1} >= 1 THEN "
        f"list_transform(generate_series(1, len({tok}) - {ngram_n - 1}), "
        f"i -> array_to_string(list_slice({tok}, i, i + {ngram_n - 1}), ' ')) "
        f"ELSE [] END"
    )
    return f"""
        WITH per_gram AS (
            SELECT doc_id, g, COUNT(*) AS c FROM (
                SELECT {id_expr} AS doc_id, unnest({grams}) AS g FROM {table}
            ) GROUP BY doc_id, g
        )
        SELECT doc_id,
               CAST(MAX(c) AS INTEGER) AS top_ngram_count,
               CAST(SUM(c) AS BIGINT) AS n_ngrams,
               CAST(MAX(c) AS DOUBLE) / SUM(c) AS repetition_ratio
        FROM per_gram GROUP BY doc_id
    """
