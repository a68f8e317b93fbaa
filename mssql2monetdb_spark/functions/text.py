"""Text-analysis column expressions (tokenize / shingles / quality / lang).

All built-ins; the DuckDB-equivalent fragments used by oracles are defined
alongside. Tokenization is whitespace-based over lowercased, trimmed text —
the same regex class works in Java regex (Spark) and RE2 (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"

#: Tiny english-ish stopword list used by quality scoring / lang heuristics.
STOPWORDS = ("the", "a", "of", "and", "to")


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(F.trim(col)), TOKEN_SPLIT_RE)


def tokens_sql(expr: str) -> str:
    return f"regexp_split_to_array(lower(trim({expr})), '\\s+')"


def word_shingles(tok: Column, n: int) -> Column:
    """Distinct word n-gram shingles; empty array when fewer than n tokens.

    The size guard matters: Spark ``sequence(1, 0)`` yields a *descending*
    [1, 0] rather than an empty array (DuckDB's generate_series is empty).
    """
    if n == 1:
        return F.array_distinct(tok)
    count = F.size(tok) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.array_join(F.slice(tok, i, n), " "),
    )
    return F.array_distinct(F.when(count >= 1, grams).otherwise(F.array().cast("array<string>")))


def word_shingles_sql(tok_expr: str, n: int) -> str:
    if n == 1:
        return f"list_distinct({tok_expr})"
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, len({tok_expr}) - {n - 1}), "
        f"i -> array_to_string(list_slice({tok_expr}, i, i + {n - 1}), ' ')))"
    )


def token_count(col: Column) -> Column:
    """Whitespace token count (the baseline tokenizer)."""
    return F.size(tokens(col)).cast("int")


def token_count_sql(expr: str) -> str:
    return f"CAST(len({tokens_sql(expr)}) AS INTEGER)"


#: BPE-ish subword segmentation: split on word boundaries AND every 4 chars
#: inside long words — a cheap, deterministic stand-in for a real tokenizer's
#: piece count, expressible in both engines.
BPE_CHARS_PER_PIECE = 4


def bpe_token_estimate(col: Column) -> Column:
    """Estimated BPE piece count: ceil(len(word)/4) summed over words."""
    tok = tokens(col)
    pieces = F.transform(tok, lambda w: F.ceil(F.length(w) / F.lit(BPE_CHARS_PER_PIECE)))
    return F.aggregate(pieces, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("bpe_tokens")


def bpe_token_estimate_sql(expr: str) -> str:
    return (
        f"list_reduce(list_transform({tokens_sql(expr)}, "
        f"w -> CAST(ceil(length(w) / {BPE_CHARS_PER_PIECE}.0) AS BIGINT)), (a, b) -> a + b)"
    )
