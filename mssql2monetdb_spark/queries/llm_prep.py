"""Training-corpus preparation queries (§2C extensions, round 2): PII
scrubbing, token-budget sequence packing, and deterministic dataset splits.

The documents fixture is synthetic word-soup with no PII, so the scrub
query *synthesizes* deterministic PII inline (same expression on both
engines) — otherwise the verdict would be vacuous (zero matches proves
nothing, the round-1 ``join_anti`` lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..functions import hashing
from ..functions import text as text_fns
from ..operators import corpus_prep, ranking, similarity, textstats
from .registry import query


@query(
    "text_pii_scrub",
    oracle=f"""
        WITH seeded AS (
            SELECT doc_id,
                   substr(text, 1, 80)
                   || CASE WHEN doc_id % 3 = 0
                           THEN ' contact user' || doc_id || '@example.com now'
                           ELSE '' END
                   || CASE WHEN doc_id % 4 = 0
                           THEN ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           ELSE '' END AS text
            FROM documents
        )
        SELECT {corpus_prep.scrub_pii_sql("text")}
        FROM seeded ORDER BY doc_id
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over a corpus seeded with deterministic synthetic
    emails/phones (1/3 and 1/4 of documents respectively), so both the
    match-count and redaction paths are genuinely exercised."""
    t = Tables(spark, sf_dir)
    email = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com now")),
    ).otherwise("")
    phone = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(F.lit(" call 555-867-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
    ).otherwise("")
    seeded = t.documents.select(
        "doc_id",
        F.concat(F.substring("text", 1, 80), email, phone).alias("text"),
    )
    return corpus_prep.scrub_pii(seeded).orderBy("doc_id")


@query(
    "pack_sequences",
    oracle=corpus_prep.pack_sequences_sql("documents") + " ORDER BY doc_id",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: md5-sharded greedy running-total bins
    (one independent window per shard — the 100 TB-safe plan shape)."""
    t = Tables(spark, sf_dir)
    return corpus_prep.pack_sequences(t.documents).orderBy("doc_id")


@query(
    "split_train_val_test",
    oracle=f"""
        SELECT split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM (
            SELECT n_chars,
                   CASE WHEN {corpus_prep.split_bucket_sql()} < 80 THEN 'train'
                        WHEN {corpus_prep.split_bucket_sql()} < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        )
        GROUP BY split ORDER BY split
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment from a salted md5
    bucket, summarized per split (counts + char mass)."""
    t = Tables(spark, sf_dir)
    return (
        corpus_prep.assign_split(t.documents)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("split")
    )


BM25_TERMS = ["spark", "join", "data"]


@query(
    "rank_bm25",
    oracle=ranking.bm25_scores_sql("documents", BM25_TERMS),
)
def rank_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rational-idf BM25 retrieval over the corpus for a fixed term bag
    (idf kept rational — no log — so both engines produce identical bits;
    see operators/ranking.py)."""
    t = Tables(spark, sf_dir)
    return ranking.bm25_scores(t.documents, BM25_TERMS)


@query(
    "ngram_topk",
    oracle=ranking.ngram_topk_sql("documents"),
)
def ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-50 bigrams by occurrence (non-distinct counting —
    the CCNet-style corpus statistic, one explode + one combined count)."""
    t = Tables(spark, sf_dir)
    return ranking.ngram_topk(t.documents)


@query(
    "embed_quantize_int8",
    oracle=similarity.quantize_int8_sql("embeddings") + " ORDER BY vec_id",
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization summary (floor(x/scale + 0.5)
    instead of round — exact cross-engine, no half-tie ambiguity)."""
    t = Tables(spark, sf_dir)
    return similarity.quantize_int8(t.embeddings).orderBy("vec_id")


@query(
    "mix_domain_weights",
    oracle=corpus_prep.domain_mixture_sql("documents"),
)
def mix_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain resampling weights toward a uniform source mixture."""
    t = Tables(spark, sf_dir)
    return corpus_prep.domain_mixture(t.documents)


# the fixture's sources are perfectly balanced (uniform weights would make
# the verdict vacuous), so the corpus is seeded with deterministic clones:
# src0 tripled, src1 doubled — three distinct weight levels
_SQRT_MIX_SEED_SQL = """
    SELECT doc_id, source FROM documents
    UNION ALL
    SELECT doc_id + 200000, source FROM documents WHERE source = 'src0'
    UNION ALL
    SELECT doc_id + 400000, source FROM documents WHERE source IN ('src0', 'src1')
"""


@query(
    "mix_sqrt_temperature",
    oracle=corpus_prep.sqrt_mixture_sql(f"({_SQRT_MIX_SEED_SQL})"),
)
def mix_sqrt_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Square-root (T=1/2) temperature mixture over sources — the
    multilingual-balancing middle ground between natural and uniform;
    sqrt keeps it bit-deterministic where pow() could not be
    (operators/corpus_prep.py:sqrt_mixture). Corpus seeded imbalanced
    (src0 3x, src1 2x) so the weights genuinely differ. Round-3 addition
    queued in NEXT_WINDOW_QUEUE."""
    t = Tables(spark, sf_dir)
    base = t.documents.select("doc_id", "source")
    seeded = base.unionAll(
        base.filter(F.col("source") == "src0").select(
            (F.col("doc_id") + 200000).alias("doc_id"), "source"
        )
    ).unionAll(
        base.filter(F.col("source").isin("src0", "src1")).select(
            (F.col("doc_id") + 400000).alias("doc_id"), "source"
        )
    )
    return corpus_prep.sqrt_mixture(seeded)


# strata named after the fixture's actual source values (src0..src19) so
# the downsampling genuinely drops rows — rates over absent strata would
# fall through to the default and make the verdict vacuous
STRATIFIED_RATES = {"src0": 0.5, "src1": 0.25, "src2": 0.1, "src3": 0.0}


@query(
    "sample_stratified",
    oracle=corpus_prep.sample_stratified_sql(
        "(SELECT doc_id, source FROM documents)", STRATIFIED_RATES
    )
    + " ORDER BY doc_id",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum downsampling by salted hash bucket —
    the execution half of domain reweighting (mix_domain_weights computes
    the targets; this applies them without rand())."""
    t = Tables(spark, sf_dir)
    return corpus_prep.sample_stratified(
        t.documents.select("doc_id", "source"), STRATIFIED_RATES
    ).orderBy("doc_id")


@query(
    "decontaminate_test_split",
    oracle=corpus_prep.contaminated_test_docs_sql(
        """(SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0)"""
    ),
)
def decontaminate_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination check: exact-hash semi join between the
    test and train splits. The fixture has no natural exact duplicates, so
    the corpus is seeded with deterministic clones (every 5th doc, shifted
    id) — the clone's split hash differs from its original's, so some
    clones land in test with their twin in train and the verdict is
    non-vacuous."""
    t = Tables(spark, sf_dir)
    base = t.documents.select("doc_id", "text")
    clones = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return corpus_prep.contaminated_test_docs(base.unionAll(clones))


@query(
    "text_repetition",
    oracle=textstats.repetition_score_sql("documents") + " ORDER BY doc_id",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition ratio (top bigram share) — the
    boilerplate/spam quality signal."""
    t = Tables(spark, sf_dir)
    return textstats.repetition_score(t.documents).orderBy("doc_id")


# k=20 against the fixture's 31 distinct tokens so ~1/3 of token types are
# genuinely OOV — k=30 would leave a single OOV type and a near-vacuous verdict
@query(
    "vocab_oov_rate",
    oracle=ranking.oov_rate_sql("documents", k=20) + " ORDER BY doc_id",
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc out-of-vocabulary rate against the corpus top-k vocabulary
    — tokenizer-coverage signal for spotting mis-languaged/garbage docs."""
    t = Tables(spark, sf_dir)
    return ranking.oov_rate(t.documents, k=20).orderBy("doc_id")


@query(
    "vocab_token_freq_stats",
    oracle=ranking.token_freq_stats_sql("documents") + " ORDER BY doc_id",
)
def vocab_token_freq_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc corpus token-frequency profile (mean/min/max corpus
    frequency, hapax count) — the unigram-LM-flavored rarity signal in
    exact rational arithmetic (operators/ranking.py:token_freq_stats).
    Round-3 addition, registered behind the window; queued for a round-4
    verification slot."""
    t = Tables(spark, sf_dir)
    return ranking.token_freq_stats(t.documents).orderBy("doc_id")


# Thresholds 29.3/30.5 split the sf0.01 fixture 38 head / 437 middle /
# 25 tail, so all three buckets carry real rows and the verdict is
# non-vacuous (measured, see operators/ranking.py:unigram_rarity).
@query(
    "quality_unigram_rarity",
    oracle=ranking.unigram_rarity_sql("documents") + " ORDER BY doc_id",
)
def quality_unigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail corpus partition by a unigram-LM
    perplexity proxy (mean inverse corpus token probability), all-integer
    arithmetic until one final division — the self-trained surrogate for
    KenLM scoring with the identical pipeline shape."""
    t = Tables(spark, sf_dir)
    return ranking.unigram_rarity(t.documents).orderBy("doc_id")


# Thresholds 29.5/30.5 split the sf0.01 fixture 215 head / 190 middle /
# 95 tail (measured) — all three buckets carry real rows.
@query(
    "quality_lm_bigram",
    oracle=ranking.bigram_conditional_rarity_sql("documents") + " ORDER BY doc_id",
)
def quality_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality partition — the CONDITIONAL upgrade of
    quality_unigram_rarity: per-token surprisal surrogate is the integer
    inverse of P(w_i | w_{i-1}) (count(w1 *) // count(w1 w2)), so fluent
    common-word text scores head while bag-of-common-words spam (which
    unigram scoring cannot distinguish) falls to tail. All-BIGINT until
    one final division; two map-side-combined count passes + two keyed
    joins, nothing pairwise (operators/ranking.py)."""
    t = Tables(spark, sf_dir)
    return ranking.bigram_conditional_rarity(t.documents).orderBy("doc_id")


# Hash-derived weights split the sf0.01 fixture 241 keep / 259 reject
# (measured) — both decision outcomes carry real rows.
@query(
    "quality_classifier_linear",
    oracle=ranking.linear_classifier_scores_sql("documents") + " ORDER BY doc_id",
    bench=True,
)
def quality_classifier_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed bag-of-ngrams linear classifier inference — the
    fastText/CCNet-style TRAINED-quality-filter shape (vs the heuristic
    text_quality_score and the self-trained LM surrogates): unigram +
    bigram features hashed into 4096 buckets, per-bucket weight,
    per-document linear sum, keep decision at zero. Weights derive
    deterministically from the bucket id so the oracle reproduces every
    score bit-for-bit; production swaps in a trained weight table
    (broadcast-sized) with the identical plan shape. ONE map-side
    projection with a per-row fold — zero shuffles, zero joins
    (operators/ranking.py:linear_classifier_scores)."""
    t = Tables(spark, sf_dir)
    return ranking.linear_classifier_scores(t.documents).orderBy("doc_id")


# df_cap=20 against the sf0.01 fixture's 916 distinct bigrams (df 1..46)
# materializes 80 posting lists and leaves 836 df-only rows — both tiers
# of the index carry real rows.
@query(
    "index_inverted_postings",
    oracle=ranking.inverted_index_sql("documents") + " ORDER BY gram",
)
def index_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiered phrase inverted index (word bigrams): df for every gram,
    sorted posting lists materialized only below the df cap — the gather
    never sees a group longer than the cap, so a stopword gram can't
    funnel a 100 TB corpus through one reducer."""
    t = Tables(spark, sf_dir)
    return ranking.inverted_index(t.documents).orderBy("gram")


_LONG_TOKEN_TEXT = ("pneumonoultramicroscopicsilicovolcanoconiosis " * 5).strip()

_GOPHER_SEED_SQL = f"""
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN '- one' || chr(10) || '- two' || chr(10) || '- three'
                WHEN doc_id % 11 = 0 THEN text || ' # # # # # # # # # # # #'
                WHEN doc_id % 13 = 0 THEN '{_LONG_TOKEN_TEXT}'
                ELSE text END AS text
    FROM documents
"""


@query(
    "filter_gopher_rules",
    oracle="SELECT * FROM ("
    + corpus_prep.gopher_rules_sql(f"({_GOPHER_SEED_SQL})")
    + ") ORDER BY doc_id",
)
def filter_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite quality rules over a deterministically
    decorated corpus: every 7th doc becomes all-bullet lines (fails the
    bullet + word-count rules), every 11th gains a '#' token run (fails
    symbol ratio), every 13th becomes five 45-char tokens (fails mean word
    length), the rest exercise the word-count/stopword bands naturally —
    so each rule's verdict is non-vacuous (operators/corpus_prep.py:
    gopher_rules). Round-3 addition queued in NEXT_WINDOW_QUEUE."""
    t = Tables(spark, sf_dir)
    doc_id = F.col("doc_id")
    seeded = t.documents.select(
        "doc_id",
        F.when(doc_id % 7 == 0, F.lit("- one\n- two\n- three"))
        .when(doc_id % 11 == 0, F.concat(F.col("text"), F.lit(" # # # # # # # # # # # #")))
        .when(doc_id % 13 == 0, F.lit(_LONG_TOKEN_TEXT))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return corpus_prep.gopher_rules(seeded).orderBy("doc_id")


@query(
    "filter_length_outliers",
    oracle=corpus_prep.filter_length_outliers_sql("documents") + " ORDER BY doc_id",
)
def filter_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs inside the [p5, p95] token-length band — histogram-based
    percentile trim with all-integer boundary tests."""
    t = Tables(spark, sf_dir)
    return corpus_prep.filter_length_outliers(t.documents).orderBy("doc_id")


# trigrams against the 31-token fixture vocabulary: overlaps span 30-100%
# (avg ~58%), so the 50% threshold splits the test docs non-vacuously both
# ways; bigrams saturate at 100% and would make the flag constant
@query(
    "decontaminate_ngram_overlap",
    oracle=corpus_prep.ngram_overlap_contamination_sql("documents") + " ORDER BY doc_id",
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup contamination: share of each test doc's distinct trigrams
    that appear anywhere in the train split, flagged at 50% overlap."""
    t = Tables(spark, sf_dir)
    return corpus_prep.ngram_overlap_contamination(t.documents).orderBy("doc_id")


@query(
    "pack_sequences_text",
    oracle=corpus_prep.pack_sequences_text_sql("documents") + " ORDER BY seq_id",
)
def pack_sequences_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized packed training sequences: per-bin doc count, token sum,
    and the concatenated text in doc_id order — the write-side half of
    pack_sequences."""
    t = Tables(spark, sf_dir)
    return corpus_prep.pack_sequences_text(t.documents).orderBy("seq_id")


@query(
    "boilerplate_span_removal",
    oracle="SELECT * FROM ("
    + corpus_prep.remove_boilerplate_sql("documents")
    + ") ORDER BY doc_id",
)
def boilerplate_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate removal (C4-style): bigram spans present
    in >= 8% of documents are dropped everywhere and the cleaned text is
    reassembled in token order. At sf0.01 the threshold removes ~4.5% of
    spans — non-vacuous in both directions (some text removed, most kept)."""
    t = Tables(spark, sf_dir)
    return corpus_prep.remove_boilerplate(t.documents).orderBy("doc_id")


@query(
    "sample_quality_weighted",
    oracle=corpus_prep.sample_quality_weighted_sql(
        textstats.quality_score_sql("documents")
    )
    + " ORDER BY doc_id",
)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-proportional deterministic sampling: keep probability equals
    the document's quality score, decided by a salted md5 bucket rather
    than rand(). The fixture's score distribution (~0.5-0.7) drops roughly
    a third of the corpus, so the verdict exercises both outcomes."""
    t = Tables(spark, sf_dir)
    return corpus_prep.sample_quality_weighted(t.documents).orderBy("doc_id")


# 264/500 docs survive the sf0.01 resample (measured) — acceptance spans
# the full threshold range, so both outcomes carry real rows.
@query(
    "sample_importance_dsir",
    oracle=corpus_prep.importance_resample_sql("documents") + " ORDER BY doc_id",
)
def sample_importance_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling (Xie et al. 2023): documents are
    scored by a hashed-unigram target-vs-source log-likelihood-ratio
    surrogate, min-max normalized against the GLOBAL importance bounds
    (one 1-row aggregate, broadcast back), and kept with probability
    proportional to normalized importance via a salted-md5 acceptance
    draw — reproducible across runs/engines/retries, unlike rand().
    Distinct from sample_quality_weighted (per-doc heuristic probability,
    no global pass): this is the published importance-resampling shape
    with feature-model scoring + corpus-level normalization. Map-side
    fold + broadcast bounds + pure filter — zero data-sized shuffles
    (operators/corpus_prep.py:importance_resample)."""
    t = Tables(spark, sf_dir)
    return corpus_prep.importance_resample(t.documents).orderBy("doc_id")


def _pretraining_pipeline_oracle() -> str:
    """Composed CTE chain mirroring corpus_pretraining_pipeline: clone-seeded
    corpus -> boilerplate removal -> quality re-score on cleaned text ->
    split -> cross-split exact decontamination -> sequence packing."""
    seeded = """(SELECT doc_id, text FROM documents
                 UNION ALL
                 SELECT doc_id + 300000 AS doc_id, text FROM documents WHERE doc_id % 9 = 0)"""
    bp = corpus_prep.remove_boilerplate_sql(seeded)
    quality = textstats.quality_score_sql("(SELECT doc_id, clean_text AS text FROM cleaned)")
    bucket = corpus_prep.split_bucket_sql("doc_id")
    packed = corpus_prep.pack_sequences_sql(
        "(SELECT doc_id, clean_text AS text FROM decon)", "text"
    )
    return f"""
        WITH cleaned AS ({bp}),
        q AS ({quality}),
        kept AS (SELECT doc_id FROM q WHERE quality >= 0.5 AND n_tokens >= 10),
        split AS (
            SELECT doc_id, clean_text,
                   CASE WHEN {bucket} < 80 THEN 'train'
                        WHEN {bucket} < 90 THEN 'val' ELSE 'test' END AS split
            FROM cleaned
        ),
        train AS (
            SELECT s.doc_id, s.clean_text FROM split s
            WHERE s.split = 'train' AND s.doc_id IN (SELECT doc_id FROM kept)
        ),
        decon AS (
            SELECT t.doc_id, t.clean_text FROM train t
            WHERE md5(t.clean_text) NOT IN
                  (SELECT md5(clean_text) FROM split WHERE split = 'test')
        ),
        packed AS ({packed})
        SELECT seq_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM packed GROUP BY seq_id ORDER BY seq_id
    """


@query("corpus_pretraining_pipeline", oracle=_pretraining_pipeline_oracle())
def corpus_pretraining_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pretraining-corpus materialization: boilerplate-clean the
    (clone-seeded) corpus, re-score quality on the cleaned text, keep the
    train split passing the quality bar, drop train docs whose cleaned
    content hash appears in the test split, and pack survivors into
    token-budget sequences. One composition of four verified operators;
    every stage is keyed (no broadcast of corpus-sized state)."""
    t = Tables(spark, sf_dir)
    base = t.documents.select("doc_id", "text")
    clones = base.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"), "text"
    )
    cleaned = corpus_prep.remove_boilerplate(base.unionAll(clones))
    cdocs = cleaned.select("doc_id", F.col("clean_text").alias("text"))
    q = textstats.quality_score(cdocs)
    kept = q.filter((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 10)).select("doc_id")
    split = corpus_prep.assign_split(cdocs)
    train = split.filter(F.col("split") == "train").join(kept, "doc_id").select("doc_id", "text")
    test_hashes = (
        split.filter(F.col("split") == "test").select(F.md5("text").alias("h")).distinct()
    )
    decon = train.join(
        test_hashes, F.md5(F.col("text")) == F.col("h"), "left_anti"
    )
    packed = corpus_prep.pack_sequences(decon)
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .orderBy("seq_id")
    )


@query(
    "report_corpus_health",
    oracle="SELECT * FROM ("
    + corpus_prep.corpus_health_sql(
        """(SELECT doc_id, text, lang, source FROM documents
            UNION ALL
            SELECT doc_id + 200000 AS doc_id, text, lang, source
            FROM documents WHERE doc_id % 7 = 0)"""
    )
    + ") ORDER BY source",
)
def report_corpus_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health report (docs, tokens, language spread,
    exact-dup pressure, short-doc share). The fixture has no natural exact
    duplicates, so the corpus is seeded with deterministic clones (every
    7th doc, shifted id) to exercise the dup counter non-vacuously."""
    t = Tables(spark, sf_dir)
    base = t.documents.select("doc_id", "text", "lang", "source")
    clones = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text", "lang", "source"
    )
    return corpus_prep.corpus_health(base.unionAll(clones)).orderBy("source")


@query(
    "doc_chunk_overlap",
    oracle=corpus_prep.chunk_documents_sql("documents") + " ORDER BY doc_id, chunk_id",
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap (64-token windows, stride 48)
    — the retrieval/context-window prep step of a RAG or embedding
    pipeline. Narrow tokenize->sequence->explode->slice, no shuffle."""
    t = Tables(spark, sf_dir)
    return corpus_prep.chunk_documents(t.documents)


_URL_SEED_SQL = """
    SELECT doc_id,
           (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'http://' END)
           || source || '.example.com/page/' || CAST(doc_id % 40 AS VARCHAR)
           || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END)
           || (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed' ELSE '' END) AS url
    FROM documents
"""


@query(
    "dedup_url_normalized",
    oracle=corpus_prep.url_dedup_domain_summary_sql(_URL_SEED_SQL) + " ORDER BY domain",
)
def dedup_url_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + keep-first-per-URL dedup, rolled up per
    domain (RefinedWeb-style). URLs are seeded deterministically from the
    fixture (mixed-case schemes, www prefixes, utm query strings, trailing
    slashes) so the normalizer's every rule is genuinely exercised."""
    t = Tables(spark, sf_dir)
    scheme = F.when(F.col("doc_id") % 2 == 0, F.lit("HTTPS://WWW.")).otherwise(F.lit("http://"))
    url = F.concat(
        scheme,
        F.col("source"),
        F.lit(".example.com/page/"),
        (F.col("doc_id") % 40).cast("string"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("?utm_source=feed")).otherwise(F.lit("")),
    )
    seeded = t.documents.select("doc_id", url.alias("url"))
    return corpus_prep.url_dedup_domain_summary(seeded)


@query(
    "sample_domain_cap",
    oracle=corpus_prep.sample_domain_cap_sql("documents") + " ORDER BY source, rnk",
)
def sample_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document quota (keep the 10 highest-quality docs per
    source) — RefinedWeb-style source balancing via a group-limited window."""
    t = Tables(spark, sf_dir)
    return corpus_prep.sample_domain_cap(t.documents)


def _semantic_contamination_oracle(threshold: float) -> str:
    from ..functions import vectors
    from ..operators import similarity as sim

    dist2 = vectors.l2sq_sql("e.embedding", "c.cvec")
    cos = vectors.cosine_sql("t.emb_t", "q.emb_q")
    bucket = corpus_prep.split_bucket_sql("vec_id")
    return f"""
    WITH seed AS (
        SELECT CAST(vec_id AS INTEGER) AS cid, embedding AS cvec
        FROM embeddings WHERE vec_id < {sim.IVF_K}
    ), scored0 AS (
        SELECT e.vec_id, e.embedding, c.cid, {dist2} AS dist2
        FROM embeddings e CROSS JOIN seed c
    ), assigned AS (
        SELECT vec_id, embedding, cell,
               CASE WHEN ({bucket}) < 80 THEN 'train'
                    WHEN ({bucket}) < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT vec_id, embedding, cid AS cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
            FROM scored0
        ) WHERE rn = 1
    ), t AS (
        SELECT cell, vec_id AS train_id, embedding AS emb_t FROM assigned
        WHERE split = 'train'
    ), q AS (
        SELECT cell, vec_id AS test_id, embedding AS emb_q FROM assigned
        WHERE split = 'test'
    ), pairs AS (
        SELECT t.train_id, q.test_id, {cos} AS cos_sim
        FROM t JOIN q ON t.cell = q.cell
        WHERE {cos} >= {threshold}
    ), ranked AS (
        SELECT train_id, test_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY train_id ORDER BY cos_sim DESC, test_id) AS rn
        FROM pairs
    )
    SELECT train_id, test_id, cos_sim FROM ranked WHERE rn = 1 ORDER BY train_id
    """


@query("decontaminate_semantic", oracle=_semantic_contamination_oracle(0.4))
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paraphrase-level train/test contamination: train vectors whose
    cosine to a test-split vector (within the same centroid cell) exceeds
    0.4, each reporting its most-similar test vector. Complements the
    verbatim n-gram decontamination pass."""
    t = Tables(spark, sf_dir)
    return similarity.cross_split_contamination(t.embeddings, threshold=0.4)


@query(
    "vocab_bpe_pair_counts",
    oracle=ranking.bpe_pair_counts_sql("documents"),
)
def vocab_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training prep: corpus-weighted adjacent character-pair
    frequencies with an explicit </w> end-of-word symbol — the statistic a
    BPE trainer maximizes on its first merge. The corpus collapses to its
    vocabulary BEFORE the pair explode (10^6 distinct tokens vs 10^14
    running tokens at 100 TB); top-k is TakeOrderedAndProject."""
    t = Tables(spark, sf_dir)
    return ranking.bpe_pair_counts(t.documents)


@query(
    "report_packing_efficiency",
    oracle="""
        WITH lens AS (
            SELECT CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+'))
                        AS BIGINT) AS n_tok
            FROM documents
        ), seqs AS (
            SELECT unnest([128, 512, 2048]) AS seq_len
        )
        SELECT seq_len,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
               CAST(SUM(((n_tok + seq_len - 1) // seq_len) * seq_len) AS BIGINT)
                   AS padded_tokens,
               CAST(SUM(((n_tok + seq_len - 1) // seq_len) * seq_len) - SUM(n_tok)
                    AS DOUBLE)
                   / CAST(SUM(((n_tok + seq_len - 1) // seq_len) * seq_len)
                          AS DOUBLE) AS waste_ratio
        FROM lens CROSS JOIN seqs
        GROUP BY seq_len ORDER BY seq_len
    """,
)
def report_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing report: for each candidate sequence length,
    the padding waste of one-doc-per-sequence batching — the number that
    justifies sequence packing (pack_sequences) to the training job. Pure
    integer arithmetic until one final division; the seq-length relation
    is 3 rows and broadcasts."""
    t = Tables(spark, sf_dir)
    lens = t.documents.select(
        text_fns.token_count(F.col("text")).cast("bigint").alias("n_tok")
    )
    seqs = spark.range(0, 1).select(
        F.explode(F.array(F.lit(128), F.lit(512), F.lit(2048))).alias("seq_len")
    )
    padded = F.sum(
        F.expr("((n_tok + seq_len - 1) div seq_len) * seq_len")
    ).cast("bigint")
    return (
        lens.crossJoin(F.broadcast(seqs))
        .groupBy("seq_len")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            padded.alias("padded_tokens"),
        )
        .withColumn(
            "waste_ratio",
            (F.col("padded_tokens") - F.col("total_tokens")).cast("double")
            / F.col("padded_tokens").cast("double"),
        )
        .orderBy("seq_len")
    )


@query(
    "report_dedup_by_source",
    oracle="""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
               CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE)
                   / COUNT(*) AS dup_ratio
        FROM documents GROUP BY source ORDER BY source
    """,
)
def report_dedup_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rate — the triage report that tells a
    pipeline operator WHICH ingest feed is flooding the corpus with
    copies. One hash + count-distinct aggregate keyed on source."""
    t = Tables(spark, sf_dir)
    return (
        t.documents.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct(F.md5(F.col("text"))).cast("bigint").alias("n_unique"),
        )
        .withColumn(
            "dup_ratio",
            (F.col("n_docs") - F.col("n_unique")).cast("double") / F.col("n_docs"),
        )
        .orderBy("source")
    )


@query(
    "order_curriculum_stages",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id,
                   CAST({text_fns.token_count_sql('text')} AS BIGINT) AS difficulty
            FROM documents
        ), stats AS (
            SELECT MIN(difficulty) AS lo, MAX(difficulty) AS hi FROM scored
        )
        SELECT doc_id, difficulty,
               CAST(LEAST(3, ((difficulty - lo) * 4) // (hi - lo + 1)) AS INTEGER) AS stage,
               ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS order_key
        FROM scored CROSS JOIN stats
        ORDER BY stage, order_key, doc_id
    """,
)
def order_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for training: bucket documents into difficulty
    stages (token count as the difficulty proxy), shuffled deterministically
    within each stage by a doc-id hash. The (stage, order_key) sort IS the
    training order: easy stages stream first, and within a stage documents
    arrive in hash order — reproducible across runs, no rand().

    Scale shape: stage thresholds come from a 1-row min/max broadcast (no
    global sort, unlike ntile); the bucket arithmetic is integer-exact so
    both engines agree bit-for-bit. The final ORDER BY is the result
    contract; a real export would repartitionByRange on (stage, order_key)
    into shards instead of a single global sort.
    """
    t = Tables(spark, sf_dir)
    scored = t.documents.select(
        "doc_id", text_fns.token_count(F.col("text")).cast("bigint").alias("difficulty")
    )
    stats = scored.agg(F.min("difficulty").alias("lo"), F.max("difficulty").alias("hi"))
    return (
        scored.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "difficulty",
            F.least(
                F.lit(3),
                F.expr("((difficulty - lo) * 4) DIV (hi - lo + 1)"),
            ).cast("int").alias("stage"),
            hashing.md5_int60(F.col("doc_id").cast("string")).alias("order_key"),
        )
        .orderBy("stage", "order_key", "doc_id")
    )


@query(
    "mix_epoch_repeat",
    oracle="""
        WITH planned AS (
            SELECT doc_id, source,
                   0.5 + (TRY_CAST(substr(source, 4) AS INTEGER) % 4) * 0.75 AS epochs,
                   ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 AS h
            FROM documents
        ), sized AS (
            SELECT doc_id, source,
                   CAST(FLOOR(epochs) AS BIGINT)
                   + CASE WHEN h < (epochs - FLOOR(epochs)) * 1000 THEN 1 ELSE 0 END AS n_copies
            FROM planned
        )
        SELECT doc_id, source, CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy_idx
        FROM sized
        ORDER BY doc_id, copy_idx
    """,
)
def mix_epoch_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source upsampling by fractional epoch counts — the materialization
    step of a data-mixing recipe ("books x2.75, web x0.5"). Every document
    repeats floor(e) times, plus one extra copy for the deterministic
    hash-selected fraction (h % 1000 < frac*1000), so realized source
    proportions hit the target in expectation with zero rand() — retries
    and speculative tasks reproduce byte-identical output.

    Epochs here derive from the source-name suffix (0.5 .. 2.75 across the
    20 fixture feeds) so under-sampling (e < 1 drops docs), exact-integer,
    and fractional repeat paths all carry rows. The explode is per-row
    (narrow, no shuffle); frac*1000 stays integer-exact because fractions
    are multiples of 1/4. At 100 TB this runs as a map-only stage feeding
    the shard writer — repeated copies of a document land in the same task
    unless a downstream repartition spreads them, which is what you want
    for copy-aware shard interleaving anyway.
    """
    t = Tables(spark, sf_dir)
    planned = t.documents.select(
        "doc_id",
        "source",
        # try_cast: a source name without a numeric suffix has no epoch plan
        # — NULL epochs means the doc is dropped by the n_copies >= 1 filter
        # (and the oracle's generate_series(1, NULL) unnests to zero rows),
        # identically in both engines, instead of an ANSI cast crash
        (F.lit(0.5) + (F.expr("TRY_CAST(substring(source, 4) AS INT)") % 4) * F.lit(0.75)).alias("epochs"),
        (hashing.md5_int60(F.col("doc_id").cast("string")) % 1000).alias("h"),
    )
    sized = planned.select(
        "doc_id",
        "source",
        (
            F.floor("epochs").cast("bigint")
            + F.when(F.col("h") < (F.col("epochs") - F.floor("epochs")) * 1000, 1).otherwise(0)
        ).alias("n_copies"),
    )
    return (
        sized.filter(F.col("n_copies") >= 1)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("n_copies"))).alias("copy_idx"),
        )
        .orderBy("doc_id", "copy_idx")
    )


@query(
    "vocab_bpe_merge_apply",
    oracle=ranking.bpe_apply_first_merge_sql("documents"),
)
def vocab_bpe_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full BPE training iteration (operators/ranking.py
    bpe_apply_first_merge): choose the corpus-best pair, merge it greedily
    across the vocabulary via the leading-space replace encoding, and
    recount — the post-merge top-20 pair statistics that drive merge #2.
    Companion to vocab_bpe_pair_counts (which stops at the counts)."""
    t = Tables(spark, sf_dir)
    return ranking.bpe_apply_first_merge(t.documents)


@query(
    "text_tfidf_topk",
    oracle=ranking.tfidf_top_terms_sql("documents"),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by rational-idf TF-IDF
    (operators/ranking.py:tfidf_top_terms) — keyword extraction over the
    whole vocabulary, the per-doc counterpart of rank_bm25_terms' fixed
    query bag. One corpus-sized (doc, term) count shuffle; document
    frequency and the doc-count scalar both broadcast; per-doc top-k is a
    WindowGroupLimit-pruned window, never a global sort. Round-4
    addition, registered behind the window; NEXT_WINDOW_QUEUE slot for
    the round-5 gate."""
    t = Tables(spark, sf_dir)
    return ranking.tfidf_top_terms(t.documents)


@query(
    "prep_chunk_overlap",
    oracle=corpus_prep.chunk_overlap_sql("documents"),
)
def prep_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size token chunking (32-token chunks, stride 24)
    — the context-window / RAG prep step
    (operators/corpus_prep.py:chunk_overlap). Entirely map-side (explode
    of a per-doc integer sequence + slice): the only exchange is the
    result's ORDER BY contract, so the operator scales embarrassingly.
    Round-4 addition, registered behind the window; NEXT_WINDOW_QUEUE
    slot for the round-5 gate."""
    t = Tables(spark, sf_dir)
    return corpus_prep.chunk_overlap(t.documents)


RRF_TERMS = ["shuffle", "partition", "broadcast"]
RRF_QUERY_VEC = 7


@query(
    "rank_hybrid_rrf",
    oracle=ranking.hybrid_rrf_sql("documents", "embeddings", RRF_TERMS, RRF_QUERY_VEC),
)
def rank_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 (lexical) and embedding-cosine (semantic)
    rank lists fused by Reciprocal Rank Fusion — the standard two-tower
    retrieval shape for RAG/training-data curation. Ranks are ints from
    deterministic orderings and the fusion is a two-term fixed-order IEEE
    sum, so the score hashes identically cross-engine. Both retrievers are
    depth-bounded before the full-outer fusion join (depth x depth max),
    which keeps fusion broadcast-sized at any corpus scale."""
    t = Tables(spark, sf_dir)
    return ranking.hybrid_rrf(t.documents, t.embeddings, RRF_TERMS, RRF_QUERY_VEC)
