"""Corpus ranking / statistics operators: BM25-style retrieval scoring and
corpus-level n-gram counting.

Cross-engine determinism: the BM25 variant here uses a *rational* idf,
``(N - df + 0.5) / (df + 0.5)``, instead of the usual log — log/ln are libm
calls whose last ulp differs between the JVM and DuckDB, while +,-,*,/ are
IEEE-exact-rounded and bit-identical in both engines when the expression
tree is identical. Ranking behavior is preserved (the transform is monotone
per term); only the score scale differs from textbook BM25. Per-document
term sums are written as a FIXED-ORDER expression over pivoted tf columns,
never a float groupBy-sum, so partition order cannot change the result.

At 100 TB: term stats are one explode + two map-side-combined aggregates;
the per-term document-frequency relation is tiny (vocabulary-sized) and
broadcasts; nothing pairwise exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import parallelized
from ..engine import caches
from ..functions import hashing, text

BM25_K1 = 1.2
BM25_B = 0.75


def _grams(tok, n: int):
    """Non-distinct word n-grams (counting, unlike text.word_shingles)."""
    if n == 1:
        return tok
    count = F.size(tok) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.array_join(F.slice(tok, i, n), " "),
    )
    return F.when(count >= 1, grams).otherwise(F.array().cast("array<string>"))


def _grams_sql(tok_expr: str, n: int) -> str:
    if n == 1:
        return tok_expr
    return (
        f"CASE WHEN len({tok_expr}) - {n - 1} >= 1 THEN "
        f"list_transform(generate_series(1, len({tok_expr}) - {n - 1}), "
        f"i -> array_to_string(list_slice({tok_expr}, i, i + {n - 1}), ' ')) "
        f"ELSE [] END"
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top: int = 20,
) -> DataFrame:
    """Top documents for a bag of query terms under rational-idf BM25.

    Plan shape: one explode -> per-(doc, term-of-interest) counts via
    conditional aggregation (exact ints), corpus stats (N, avgdl, per-term
    df) reduced to scalars/broadcast rows, then a fixed-order double
    expression per document. One shuffle on doc_id; the stats join is a
    broadcast of one row.
    """
    tok = text.tokens(F.col(text_col))
    base = parallelized(docs).select(
        F.col(id_col).alias("doc_id"), tok.alias("tok"), F.size(tok).alias("dl")
    )
    # pivoted per-doc term frequencies: exact ints from one pass.
    # (closure factory, NOT a default-arg lambda: F.filter treats a 2-arg
    # lambda as (element, index) and would bind the index to the default)
    def term_eq(term: str):
        return lambda w: w == F.lit(term)

    tf_cols = [
        F.size(F.filter(F.col("tok"), term_eq(t))).alias(f"tf_{i}") for i, t in enumerate(terms)
    ]
    per_doc = base.select("doc_id", F.col("dl").cast("double").alias("dl"), *tf_cols)
    # corpus stats: N, avgdl, df per term — one aggregate row, broadcast
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).cast("double").alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    joined = per_doc.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl") / F.col("n_docs")
    score = F.lit(0.0)
    for i in range(len(terms)):  # fixed term order -> deterministic fold
        tf = F.col(f"tf_{i}").cast("double")
        idf = (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        score = score + idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    return (
        joined.select("doc_id", score.alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(top)
    )


def bm25_scores_sql(
    table: str,
    terms: list[str],
    text_expr: str = "text",
    id_expr: str = "doc_id",
    *,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top: int = 20,
) -> str:
    """DuckDB query matching :func:`bm25_scores` term-for-term."""
    tok = text.tokens_sql(text_expr)
    tf_exprs = ", ".join(
        f"CAST(len(list_filter(tok, w -> w = '{t}')) AS INTEGER) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_exprs = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}"
        for i in range(len(terms))
    )
    score = "0.0"
    for i in range(len(terms)):
        tf = f"CAST(tf_{i} AS DOUBLE)"
        idf = f"((n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        score = (
            f"{score} + {idf} * ({tf} * ({k1} + 1.0)) / "
            f"({tf} + {k1} * (1.0 - {b} + {b} * dl / (sum_dl / n_docs)))"
        )
    return f"""
        WITH base AS (
            SELECT {id_expr} AS doc_id, {tok} AS tok
            FROM {table}
        ), per_doc AS (
            SELECT doc_id, CAST(len(tok) AS DOUBLE) AS dl, {tf_exprs} FROM base
        ), stats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, SUM(dl) AS sum_dl, {df_exprs}
            FROM per_doc
        )
        SELECT doc_id, ({score}) AS bm25
        FROM per_doc CROSS JOIN stats
        ORDER BY bm25 DESC, doc_id LIMIT {top}
    """


def ngram_topk(
    docs: DataFrame,
    n: int = 2,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level top-k n-grams by occurrence count (non-distinct grams).

    One explode + one map-side-combined count; top-k is
    TakeOrderedAndProject, never a full sort.
    """
    tok = text.tokens(F.col(text_col))
    return (
        parallelized(docs)
        .select(F.explode(_grams(tok, n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "ngram")
        .limit(k)
    )


def ngram_topk_sql(table: str, n: int = 2, k: int = 50, text_expr: str = "text") -> str:
    tok = text.tokens_sql(text_expr)
    return f"""
        SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM (SELECT unnest({_grams_sql(tok, n)}) AS ngram FROM {table})
        GROUP BY ngram ORDER BY n_occurrences DESC, ngram LIMIT {k}
    """


def oov_rate(
    docs: DataFrame,
    k: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-k vocabulary
    (the tokenizer-coverage signal used to spot mis-languaged or garbage docs).

    Two scans of the corpus: one to build the vocabulary (explode + map-side
    count + TakeOrderedAndProject top-k — never a full sort), one to score
    documents against it. The vocabulary is k rows and broadcasts, so the
    scoring pass is scan -> broadcast-join -> per-doc agg with zero wide
    shuffles. Ties at the vocabulary boundary break by token ASC in both
    engines, and oov_ratio divides the same bigint operands, so the double
    is bit-identical cross-engine.
    """
    tok = text.tokens(F.col(text_col))
    toks = parallelized(docs).select(
        F.col(id_col).alias("doc_id"), F.explode(tok).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(k)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .withColumn("oov_ratio", F.col("n_oov").cast("double") / F.col("n_tokens"))
    )


def token_freq_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document corpus-frequency profile: how common this document's
    tokens are across the whole corpus — the unigram-LM-style signal that
    flags rare-token garbage (low mean frequency, many hapaxes) without
    libm logs (sums stay exact BIGINTs; the one double is a single
    division, so results are bit-identical cross-engine — the same
    rational-arithmetic discipline as the BM25 idf above).

    Scale shape: explode -> map-side-combined token counts (vocabulary-
    sized, NOT broadcast — at 100 TB the vocabulary is large, so the
    probe is a keyed join on token; hot tokens like 'the' are exactly the
    AQE skew-join case) -> per-doc aggregate keyed on doc id. Two keyed
    shuffles, no pairwise anything.
    """
    toks = parallelized(docs).select(
        F.col(id_col).alias("doc_id"), F.explode(text.tokens(F.col(text_col))).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("tok_freq"))
    return (
        toks.join(counts, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("tok_freq").cast("bigint").alias("sum_freq"),
            F.min("tok_freq").cast("bigint").alias("min_freq"),
            F.max("tok_freq").cast("bigint").alias("max_freq"),
            F.sum((F.col("tok_freq") == 1).cast("bigint")).cast("bigint").alias("n_hapax"),
        )
        .withColumn("mean_freq", F.col("sum_freq").cast("double") / F.col("n_tokens"))
    )


def token_freq_stats_sql(table: str, text_expr: str = "text", id_expr: str = "doc_id") -> str:
    tok = text.tokens_sql(text_expr)
    return f"""
        WITH toks AS (
            SELECT {id_expr} AS doc_id, unnest({tok}) AS tok FROM {table}
        ),
        counts AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS tok_freq FROM toks GROUP BY tok
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(tok_freq) AS BIGINT) AS sum_freq,
               CAST(MIN(tok_freq) AS BIGINT) AS min_freq,
               CAST(MAX(tok_freq) AS BIGINT) AS max_freq,
               CAST(SUM(CASE WHEN tok_freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
               CAST(SUM(tok_freq) AS DOUBLE) / COUNT(*) AS mean_freq
        FROM toks JOIN counts USING (tok)
        GROUP BY doc_id
    """


def oov_rate_sql(table: str, k: int = 30, text_expr: str = "text", id_expr: str = "doc_id") -> str:
    tok = text.tokens_sql(text_expr)
    return f"""
        WITH toks AS (
            SELECT {id_expr} AS doc_id, unnest({tok}) AS tok FROM {table}
        ),
        vocab AS (
            SELECT tok FROM toks GROUP BY tok ORDER BY COUNT(*) DESC, tok LIMIT {k}
        )
        SELECT toks.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN vocab.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
               CAST(SUM(CASE WHEN vocab.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS oov_ratio
        FROM toks LEFT JOIN vocab ON toks.tok = vocab.tok
        GROUP BY toks.doc_id
    """


RARITY_HEAD_MAX = 29.3  # mean inverse-frequency below this -> 'head'
RARITY_MIDDLE_MAX = 30.5  # ... below this -> 'middle', else 'tail'


def unigram_rarity(
    docs: DataFrame,
    *,
    head_max: float = RARITY_HEAD_MAX,
    middle_max: float = RARITY_MIDDLE_MAX,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unigram-LM perplexity proxy (CCNet-style head/middle/tail corpus
    partition): each document scores the mean INVERSE corpus probability of
    its tokens — ``rarity = avg(total_tokens // tok_freq)`` — and is
    bucketed by fixed thresholds. Low rarity = common-token text (head),
    high = rare-token/garbage text (tail).

    A real CCNet deployment scores with a pretrained KenLM; this operator
    is the self-trained surrogate with the identical pipeline shape, kept
    exact instead of floating: the per-token surprisal stands in as the
    integer-floored inverse relative frequency, so every sum is a BIGINT
    and the one double division is bit-identical cross-engine (the same
    no-libm discipline as the BM25 idf above).

    Scale shape: token counts are a map-side-combined aggregate; the
    frequency probe is a keyed join on token (AQE handles 'the'-style hot
    keys); the corpus total is a 1-row broadcast; per-doc scoring is one
    keyed aggregate. No pairwise step anywhere.
    """
    toks = parallelized(docs).select(
        F.col(id_col).alias("doc_id"), F.explode(text.tokens(F.col(text_col))).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("tok_freq"))
    total = toks.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    scored = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            # `div` is exact integer division (a double `/`+floor would
            # drift from DuckDB's `//` once totals pass 2^53 tokens)
            F.sum(F.expr("n_total div tok_freq")).cast("bigint").alias("sum_inv_freq"),
        )
        .withColumn("rarity", F.col("sum_inv_freq").cast("double") / F.col("n_tokens"))
    )
    return scored.withColumn(
        "bucket",
        F.when(F.col("rarity") < head_max, "head")
        .when(F.col("rarity") < middle_max, "middle")
        .otherwise("tail"),
    )


def unigram_rarity_sql(
    table: str,
    *,
    head_max: float = RARITY_HEAD_MAX,
    middle_max: float = RARITY_MIDDLE_MAX,
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB query matching :func:`unigram_rarity`."""
    tok = text.tokens_sql(text_expr)
    return f"""
        WITH toks AS (
            SELECT {id_expr} AS doc_id, unnest({tok}) AS tok FROM {table}
        ), counts AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS tok_freq FROM toks GROUP BY tok
        ), total AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks
        ), scored AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(total.n_total // counts.tok_freq) AS BIGINT)
                       AS sum_inv_freq
            FROM toks JOIN counts USING (tok) CROSS JOIN total
            GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, sum_inv_freq,
               CAST(sum_inv_freq AS DOUBLE) / n_tokens AS rarity,
               CASE WHEN CAST(sum_inv_freq AS DOUBLE) / n_tokens < {head_max}
                    THEN 'head'
                    WHEN CAST(sum_inv_freq AS DOUBLE) / n_tokens < {middle_max}
                    THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM scored
    """


BIGRAM_HEAD_MAX = 29.5  # mean inverse conditional freq below -> 'head'
BIGRAM_MIDDLE_MAX = 30.5  # ... below -> 'middle', else 'tail'


def bigram_conditional_rarity(
    docs: DataFrame,
    *,
    head_max: float = BIGRAM_HEAD_MAX,
    middle_max: float = BIGRAM_MIDDLE_MAX,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bigram-LM perplexity proxy — the conditional upgrade of
    :func:`unigram_rarity` (CCNet scores documents with a real LM; the
    unigram operator uses marginal token probability, this one uses
    P(w_i | w_{i-1}), which is what separates fluent text from
    bag-of-common-words spam that unigram scoring cannot see).

    Per bigram occurrence the surprisal surrogate is the integer-floored
    inverse CONDITIONAL frequency ``count(w1 •) // count(w1 w2)`` — both
    counts from the same corpus pass, all-BIGINT until the single final
    division (the same no-libm discipline as unigram_rarity: no log(),
    so DuckDB reproduces every value bit-for-bit).

    Scale shape: bigram construction is per-row array work (zero
    shuffles); bigram and prefix counts are two map-side-combined
    aggregates; scoring is two keyed joins (AQE splits hot prefixes like
    'the') and one per-doc aggregate. Nothing pairwise, no driver state.
    """
    tok = text.tokens(F.col(text_col))
    cnt = F.size(tok) - 1
    pairs = F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.struct(
            F.element_at(tok, i).alias("w1"), F.element_at(tok, i + 1).alias("w2")
        ),
    )
    safe = F.when(cnt >= 1, pairs).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )
    bi = (
        parallelized(docs)
        .select(F.col(id_col).alias("doc_id"), F.explode(safe).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    pc = bi.groupBy("w1").agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    scored = (
        bi.join(bc, ["w1", "w2"])
        .join(pc, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(F.expr("c1 div c2")).cast("bigint").alias("sum_inv_cond"),
        )
        .withColumn(
            "cond_rarity", F.col("sum_inv_cond").cast("double") / F.col("n_bigrams")
        )
    )
    return scored.withColumn(
        "bucket",
        F.when(F.col("cond_rarity") < head_max, "head")
        .when(F.col("cond_rarity") < middle_max, "middle")
        .otherwise("tail"),
    )


def bigram_conditional_rarity_sql(
    table: str,
    *,
    head_max: float = BIGRAM_HEAD_MAX,
    middle_max: float = BIGRAM_MIDDLE_MAX,
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB query matching :func:`bigram_conditional_rarity`."""
    tok = text.tokens_sql(text_expr)
    pairs = (
        f"CASE WHEN len({tok}) - 1 >= 1 THEN "
        f"list_transform(generate_series(1, len({tok}) - 1), "
        f"i -> struct_pack(w1 := {tok}[i], w2 := {tok}[i + 1])) "
        f"ELSE [] END"
    )
    return f"""
        WITH bi AS (
            SELECT doc_id, struct_extract(p, 'w1') AS w1,
                   struct_extract(p, 'w2') AS w2
            FROM (SELECT {id_expr} AS doc_id, unnest({pairs}) AS p FROM {table})
        ), bc AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bi GROUP BY w1, w2
        ), pc AS (
            SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bi GROUP BY w1
        ), scored AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(pc.c1 // bc.c2) AS BIGINT) AS sum_inv_cond
            FROM bi JOIN bc USING (w1, w2) JOIN pc USING (w1)
            GROUP BY doc_id
        )
        SELECT doc_id, n_bigrams, sum_inv_cond,
               CAST(sum_inv_cond AS DOUBLE) / n_bigrams AS cond_rarity,
               CASE WHEN CAST(sum_inv_cond AS DOUBLE) / n_bigrams < {head_max}
                    THEN 'head'
                    WHEN CAST(sum_inv_cond AS DOUBLE) / n_bigrams < {middle_max}
                    THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM scored
    """


POSTINGS_DF_CAP = 20  # materialize posting lists only for grams with df <= cap


def inverted_index(
    docs: DataFrame,
    *,
    n: int = 2,
    df_cap: int = POSTINGS_DF_CAP,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Phrase (word n-gram) inverted index: ``(gram, df, postings)`` where
    ``postings`` is the comma-joined sorted doc-id list — materialized ONLY
    for grams with ``df <= df_cap`` (rare enough to be selective), NULL for
    hot grams.

    The cap is the 100 TB survival property: a stopword bigram's posting
    list would be a billions-entry string gathered onto one reducer. The
    df pass is a map-side-combined count; hot grams are filtered out
    BEFORE any ``collect_list`` runs, so the gather only ever sees
    bounded-length (<= df_cap) groups. Query-time lookups for hot grams
    fall back to scanning with the df as the cost estimate — exactly how
    search engines tier their postings.
    """
    grams = parallelized(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(text.word_shingles(text.tokens(F.col(text_col)), n)).alias("gram"),
    )
    dfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    rare = dfreq.filter(F.col("df") <= df_cap).select("gram")
    postings = (
        grams.join(rare, "gram")
        .groupBy("gram")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
    return dfreq.join(postings, "gram", "left").select("gram", "df", "postings")


def inverted_index_sql(
    table: str,
    *,
    n: int = 2,
    df_cap: int = POSTINGS_DF_CAP,
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB query matching :func:`inverted_index`."""
    tok = text.tokens_sql(text_expr)
    sh = text.word_shingles_sql("tok", n)
    return f"""
        WITH toks AS (
            SELECT {id_expr} AS doc_id, {tok} AS tok FROM {table}
        ), grams AS (
            SELECT doc_id, unnest({sh}) AS gram FROM toks
        ), dfreq AS (
            SELECT gram, CAST(COUNT(*) AS BIGINT) AS df FROM grams GROUP BY gram
        ), postings AS (
            SELECT gram,
                   string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                       AS postings
            FROM grams
            WHERE gram IN (SELECT gram FROM dfreq WHERE df <= {df_cap})
            GROUP BY gram
        )
        SELECT d.gram AS gram, d.df AS df, p.postings AS postings
        FROM dfreq d LEFT JOIN postings p ON d.gram = p.gram
    """


def bpe_pair_counts(
    docs: DataFrame,
    *,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """First BPE merge-step statistics: corpus-weighted adjacent
    character-pair frequencies (with an explicit ``</w>`` end-of-word
    symbol), the quantity a BPE/WordPiece tokenizer trainer maximizes on
    every merge. Returns the top ``k`` pairs.

    Scale shape: the corpus collapses to its VOCABULARY first (one
    map-side-combined count per distinct token), and pairs explode from
    the vocabulary weighted by token frequency — at 100 TB that's the
    difference between exploding ~10^6 distinct-token rows and ~10^14
    running tokens. Top-k is TakeOrderedAndProject, never a full sort.
    """
    toks = parallelized(docs).select(
        F.explode(text.tokens(F.col(text_col))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("tok_n"))
    sym = F.concat(F.split(F.col("tok"), ""), F.array(F.lit("</w>")))
    pairs = vocab.select(
        "tok_n",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(sym) - 1),
                lambda i: F.concat(
                    F.element_at(sym, i), F.lit(" "), F.element_at(sym, i + 1)
                ),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("tok_n").cast("bigint").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(k)
    )


def bpe_pair_counts_sql(table: str, *, k: int = 50, text_expr: str = "text") -> str:
    """DuckDB query matching :func:`bpe_pair_counts`."""
    tok = text.tokens_sql(text_expr)
    return f"""
        WITH toks AS (
            SELECT unnest({tok}) AS tok FROM {table}
        ), vocab AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS tok_n FROM toks GROUP BY tok
        ), sym AS (
            SELECT tok_n,
                   list_append(string_split(tok, ''), '</w>') AS s
            FROM vocab
        ), pairs AS (
            SELECT tok_n,
                   unnest(list_transform(generate_series(1, len(s) - 1),
                          i -> s[i] || ' ' || s[i + 1])) AS pair
            FROM sym
        )
        SELECT pair, CAST(SUM(tok_n) AS BIGINT) AS n_occurrences
        FROM pairs GROUP BY pair
        ORDER BY n_occurrences DESC, pair LIMIT {k}
    """


def bpe_apply_first_merge(docs: DataFrame, *, k: int = 20, text_col: str = "text") -> DataFrame:
    """One BPE training iteration, end to end: pick the top pair from
    :func:`bpe_pair_counts`, merge it greedily left-to-right in every
    vocabulary entry, and recount pairs over the merged symbols — the top
    ``k`` pairs that would feed merge #2.

    The merge runs as a string replace on the leading-space symbol
    encoding (' a b' -> ' ab'): exact greedy BPE for the first step, since
    base symbols are single characters (plus '</w>', which never starts a
    pair and is no symbol's prefix), and forward-scan replace() gives
    identical non-overlapping semantics in Spark and DuckDB — including
    the a==b self-overlap case ('l l l l' merges to 'll ll').

    Scale shape: everything after tokenization runs on the VOCABULARY
    (distinct tokens), and the chosen pair is a 1-row broadcast — the
    per-iteration cost of a distributed BPE trainer, which at 100 TB is
    dominated by the one-off vocabulary count, not the merge loop.
    """
    toks = parallelized(docs).select(
        F.explode(text.tokens(F.col(text_col))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("tok_n"))
    top1 = (
        bpe_pair_counts(docs, k=1, text_col=text_col)
        .select(
            F.split(F.col("pair"), " ").getItem(0).alias("ma"),
            F.split(F.col("pair"), " ").getItem(1).alias("mb"),
        )
    )
    sym = F.concat(F.split(F.col("tok"), ""), F.array(F.lit("</w>")))
    sym_str = F.concat(F.lit(" "), F.array_join(sym, " "))
    merged_str = F.replace(
        sym_str,
        F.concat(F.lit(" "), F.col("ma"), F.lit(" "), F.col("mb")),
        F.concat(F.lit(" "), F.col("ma"), F.col("mb")),
    )
    merged_sym = F.split(F.substring(merged_str, 2, 1 << 30), " ")
    # A 2-symbol token whose whole body IS the top pair (e.g. 'a' + '</w>')
    # merges down to ONE symbol and contributes no pairs to the recount.
    # The guard is load-bearing: Spark's sequence(1, 0) is a DESCENDING
    # [1, 0] (DuckDB's generate_series(1, 0) is empty), so the unguarded
    # transform indexes element 2 of a 1-element array — an ANSI crash
    # (pre-ANSI: a spurious NULL pair row the oracle never produces).
    # Found by scripts/edge_corpus_probe.py.
    recount = F.when(
        F.size("s") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("s") - 1),
            lambda i: F.concat(
                F.element_at("s", i), F.lit(" "), F.element_at("s", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = (
        vocab.crossJoin(F.broadcast(top1))
        .select("tok_n", merged_sym.alias("s"))
        .select("tok_n", F.explode(recount).alias("pair"))
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("tok_n").cast("bigint").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(k)
    )


def bpe_apply_first_merge_sql(table: str, *, k: int = 20, text_expr: str = "text") -> str:
    """DuckDB query matching :func:`bpe_apply_first_merge`."""
    tok = text.tokens_sql(text_expr)
    return f"""
        WITH toks AS (
            SELECT unnest({tok}) AS tok FROM {table}
        ), vocab AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS tok_n FROM toks GROUP BY tok
        ), sym0 AS (
            SELECT tok_n, list_append(string_split(tok, ''), '</w>') AS s
            FROM vocab
        ), pairs0 AS (
            SELECT tok_n,
                   unnest(list_transform(generate_series(1, len(s) - 1),
                          i -> s[i] || ' ' || s[i + 1])) AS pair
            FROM sym0
        ), top1 AS (
            SELECT string_split(pair, ' ')[1] AS ma,
                   string_split(pair, ' ')[2] AS mb
            FROM (
                SELECT pair, SUM(tok_n) AS n FROM pairs0 GROUP BY pair
                ORDER BY n DESC, pair LIMIT 1
            )
        ), merged AS (
            SELECT tok_n,
                   string_split(
                       substring(
                           replace(' ' || array_to_string(s, ' '),
                                   ' ' || ma || ' ' || mb,
                                   ' ' || ma || mb),
                           2),
                       ' ') AS s
            FROM sym0 CROSS JOIN top1
        ), pairs1 AS (
            SELECT tok_n,
                   unnest(list_transform(generate_series(1, len(s) - 1),
                          i -> s[i] || ' ' || s[i + 1])) AS pair
            FROM merged
        )
        SELECT pair, CAST(SUM(tok_n) AS BIGINT) AS n_occurrences
        FROM pairs1 GROUP BY pair
        ORDER BY n_occurrences DESC, pair LIMIT {k}
    """


TFIDF_TOP_TERMS = 3  # keyword terms kept per document


#: vocabulary-cardinality ceiling for broadcasting the (term, df) relation.
#: Natural-language vocabularies sit well under this even at 100 TB (~1e7
#: distinct terms is tens of MB); a tokenizer-free / high-entropy corpus can
#: blow past it, and broadcasting such a relation would OOM the driver — the
#: guard measures instead of assuming.
TFIDF_BROADCAST_MAX_TERMS = 10_000_000


def tfidf_top_terms(
    docs: DataFrame,
    *,
    k: int = TFIDF_TOP_TERMS,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_df_max_terms: int | None = TFIDF_BROADCAST_MAX_TERMS,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by rational-idf TF-IDF —
    the classic keyword-extraction signal (and the per-doc counterpart of
    :func:`bm25_scores`, which scores docs for a *fixed* query bag; here
    every corpus term is scored and ranked per doc).

    Determinism follows the module convention: idf is the *rational* BM25
    form ``(N - df + 0.5) / (df + 0.5)`` (no libm log — +,-,*,/ are
    IEEE-exact-rounded and bit-identical across the JVM and DuckDB), and
    rank ties break by term ASC.

    Scale shape: ONE exploded pass builds the map-side-combined
    (doc_id, term) counts (the only corpus-sized shuffle), cached so the
    tf consumer and the df reduction share it instead of re-scanning;
    document frequency reduces it to a vocabulary-sized (term, df) table
    that BROADCASTS when it fits (natural-language vocabularies are ~1e7
    rows / tens of MB even at 100 TB) — the choice is MEASURED, not
    assumed: an ``approx_count_distinct`` probe over the cached exploded
    relation (one cheap job that also materializes the cache the scoring
    pass reuses) drops the hint past ``broadcast_df_max_terms`` so a
    tokenizer-free corpus degrades to a keyed shuffle join on ``term``
    instead of OOMing the driver (identical output either way; pass
    ``None`` to skip the probe and let AQE decide); the corpus doc count
    is a plain un-exploded
    row count (doc_id is the table key, and tokenization never yields an
    empty array, so COUNT(*) == COUNT(DISTINCT doc_id) over the exploded
    relation — the cheap form is semantically identical) riding a 1-row
    broadcast; and the per-doc top-k is a doc_id-keyed window
    (WindowGroupLimit prunes to k per group map-side; no global sort
    before the final ORDER BY contract).
    """
    tok = text.tokens(F.col(text_col))
    d = parallelized(docs)
    per_dt = caches.tracked(
        d.select(F.col(id_col).alias("doc_id"), F.explode(tok).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df_rel = per_dt.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    if broadcast_df_max_terms is not None:
        n_terms = per_dt.agg(F.approx_count_distinct("term").alias("n")).first()["n"]
        if n_terms <= broadcast_df_max_terms:
            df_rel = F.broadcast(df_rel)
    stats = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    idf = (F.col("n_docs") - F.col("df").cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    scored = (
        per_dt.join(df_rel, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("tf").cast("double") * idf).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .orderBy("doc_id", "rank")
    )


def tfidf_top_terms_sql(
    table: str,
    *,
    k: int = TFIDF_TOP_TERMS,
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB query matching :func:`tfidf_top_terms` term-for-term."""
    tok = text.tokens_sql(text_expr)
    return f"""
        WITH toks AS (
            SELECT {id_expr} AS doc_id, unnest({tok}) AS term FROM {table}
        ), per_dt AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks GROUP BY doc_id, term
        ), df_rel AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM per_dt GROUP BY term
        ), stats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM {table}
        ), scored AS (
            SELECT p.doc_id, p.term, p.tf, d.df,
                   CAST(p.tf AS DOUBLE)
                   * ((s.n_docs - CAST(d.df AS DOUBLE) + 0.5)
                      / (CAST(d.df AS DOUBLE) + 0.5)) AS tfidf
            FROM per_dt p JOIN df_rel d USING (term) CROSS JOIN stats s
        )
        SELECT doc_id, term, tf, df, tfidf, CAST(rank AS INTEGER) AS rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, term
            ) AS rank
            FROM scored
        )
        WHERE rank <= {k}
        ORDER BY doc_id, rank
    """


# -- hybrid retrieval: reciprocal rank fusion ------------------------------

RRF_K = 60  # the canonical RRF constant (Cormack et al.)


def hybrid_rrf(
    docs: DataFrame,
    emb: DataFrame,
    terms: list[str],
    query_vec_id: int,
    *,
    depth: int = 50,
    top: int = 20,
    k0: int = RRF_K,
) -> DataFrame:
    """Hybrid lexical+semantic retrieval fused by Reciprocal Rank Fusion:
    ``rrf(d) = Σ_source 1/(k0 + rank_source(d))`` over a BM25 rank list
    and an embedding-cosine rank list (query = the corpus vector
    ``query_vec_id``), full-outer-joined on doc id so a document ranked by
    only one retriever still scores.

    Every arithmetic step is cross-engine exact: ranks are ints from
    deterministic (score DESC, id) orderings, each term is one IEEE
    division, and the fusion sum is a two-term fixed-order add — no
    float-sum reordering anywhere.

    Plan shape at scale: each retriever is independently bounded (top
    ``depth``), so the fusion join is depth×depth at most — driver-light,
    broadcast-size by construction; the expensive parts are the retrievers
    themselves (BM25: one shuffle; cosine: broadcast query, map-side score,
    one top-k window over a single partition of ``depth`` candidates).
    """
    from ..functions import vectors

    lex = (
        bm25_scores(docs, terms, top=depth)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
            .alias("rank_lex"),
        )
    )
    qv = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    sem = (
        parallelized(emb)
        .crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != query_vec_id)
        .select(
            F.col("vec_id").alias("doc_id"),
            vectors.cosine(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "doc_id")
        .limit(depth)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("cos_sim").desc(), "doc_id"))
            .alias("rank_sem"),
        )
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        F.col("rank_lex").cast("int").alias("rank_lex"),
        F.col("rank_sem").cast("int").alias("rank_sem"),
        (
            F.coalesce(1.0 / (F.lit(k0) + F.col("rank_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k0) + F.col("rank_sem")), F.lit(0.0))
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(top)


def hybrid_rrf_sql(
    docs_table: str,
    emb_table: str,
    terms: list[str],
    query_vec_id: int,
    *,
    depth: int = 50,
    top: int = 20,
    k0: int = RRF_K,
) -> str:
    """DuckDB query matching :func:`hybrid_rrf` step-for-step."""
    from ..functions import vectors

    bm25 = bm25_scores_sql(docs_table, terms, top=depth)
    cos = vectors.cosine_sql("q.q_emb", "e.embedding")
    return f"""
        WITH lex_scored AS ({bm25}),
        lex AS (
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER)
                   AS rank_lex
            FROM lex_scored
        ),
        q AS (
            SELECT embedding AS q_emb FROM {emb_table}
            WHERE vec_id = {query_vec_id}
        ),
        sem_scored AS (
            SELECT e.vec_id AS doc_id, {cos} AS cos_sim
            FROM {emb_table} e CROSS JOIN q
            WHERE e.vec_id <> {query_vec_id}
            ORDER BY cos_sim DESC, doc_id LIMIT {depth}
        ),
        sem AS (
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS INTEGER)
                   AS rank_sem
            FROM sem_scored
        )
        SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
               rank_lex, rank_sem,
               COALESCE(1.0 / ({k0} + rank_lex), 0.0)
               + COALESCE(1.0 / ({k0} + rank_sem), 0.0) AS rrf
        FROM lex FULL OUTER JOIN sem USING (doc_id)
        ORDER BY rrf DESC, doc_id LIMIT {top}
    """


# --- hashed linear quality classifier ---------------------------------------

CLS_BUCKETS = 4096  # feature-hashing width (the fastText default ballpark)
CLS_WEIGHT_SPAN = 1000  # pseudo-weights live in [-1000, 1000]
CLS_SALT = "qclf1"


def _cls_bucket(feat: Column) -> Column:
    return F.pmod(
        hashing.md5_int32(F.concat(feat, F.lit("|" + CLS_SALT))), F.lit(CLS_BUCKETS)
    )


def _cls_weight(bucket: Column) -> Column:
    return (
        F.pmod(
            hashing.md5_int32(F.concat(bucket.cast("string"), F.lit("|w" + CLS_SALT))),
            F.lit(2 * CLS_WEIGHT_SPAN + 1),
        )
        - CLS_WEIGHT_SPAN
    )




def linear_classifier_scores(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Hashed bag-of-ngrams linear classifier inference — the fastText /
    CCNet quality-filter shape every pretraining pipeline runs: word
    unigram + bigram features hashed into ``CLS_BUCKETS`` buckets, a
    per-bucket weight, a per-document linear sum, a keep decision at the
    zero threshold.

    The weights here are derived deterministically from the bucket id
    (md5 → [-span, span]) so the DuckDB oracle reproduces every score
    bit-for-bit; a production deployment swaps ``_cls_weight`` for a
    TRAINED weight table joined via broadcast (O(buckets) rows — tiny) or,
    better, compiled into the same inline expression. Either way the
    scale shape is identical and is the whole point: features, buckets,
    weights, and the document sum are ONE map-side projection with a
    per-row higher-order fold — zero shuffles, zero joins, all-BIGINT
    arithmetic. At 100 TB this is embarrassingly parallel and
    whole-stage-codegen'd end to end.
    """
    tok = text.tokens(F.col(text_col))
    cnt = F.size(tok) - 1
    bigrams = F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.concat(F.element_at(tok, i), F.lit(" "), F.element_at(tok, i + 1)),
    )
    feats = F.concat(
        tok, F.when(cnt >= 1, bigrams).otherwise(F.array().cast("array<string>"))
    )
    # NOT a precomputed weight-table lookup (round-11 A/B): replacing the
    # second md5 with element_at(<4096-int array literal>, bucket) measured
    # 2.68 s -> 4.71 s min-of-5 at sf0.1 — the giant literal de-optimizes
    # the fold (codegen fallback), losing far more than the saved hash.
    score = F.aggregate(
        feats,
        F.lit(0).cast("bigint"),
        lambda acc, f: acc + _cls_weight(_cls_bucket(f)).cast("bigint"),
    )
    return parallelized(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(feats).cast("bigint").alias("n_features"),
        score.alias("score_sum"),
        (score > 0).alias("keep"),
    )


def linear_classifier_scores_sql(
    table: str, *, text_expr: str = "text", id_expr: str = "doc_id"
) -> str:
    """DuckDB query matching :func:`linear_classifier_scores`."""
    tok = text.tokens_sql(text_expr)
    bigrams = (
        f"CASE WHEN len({tok}) - 1 >= 1 THEN "
        f"list_transform(generate_series(1, len({tok}) - 1), "
        f"i -> {tok}[i] || ' ' || {tok}[i + 1]) ELSE [] END"
    )
    feats = f"list_concat({tok}, {bigrams})"
    bucket = hashing.md5_int32_sql(f"f || '|{CLS_SALT}'") + f" % {CLS_BUCKETS}"
    weight = (
        hashing.md5_int32_sql(f"CAST(({bucket}) AS VARCHAR) || '|w{CLS_SALT}'")
        + f" % {2 * CLS_WEIGHT_SPAN + 1} - {CLS_WEIGHT_SPAN}"
    )
    # fold computed ONCE in the inner select (review catch: inlining it
    # for both score_sum and keep doubled the per-feature md5 work in the
    # oracle path)
    return f"""
        SELECT doc_id, n_features, score_sum, score_sum > 0 AS keep
        FROM (
            SELECT {id_expr} AS doc_id,
                   CAST(len({feats}) AS BIGINT) AS n_features,
                   CAST(list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                           list_transform({feats}, f -> CAST({weight} AS BIGINT))),
                       (acc, x) -> acc + x) AS BIGINT) AS score_sum
            FROM {table}
        )
    """
