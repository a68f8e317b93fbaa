"""Declared query corpus (SURVEY.md §2B relational surface + §2C extensions).

Importing this package populates the registry; ``__spark_entry__.py`` and
``bench.py`` read from it.

The driver's correctness gate verifies only the FIRST 50 entries of
``queries()`` in registration order, so registration order is curated below:
``GATE_PRIORITY`` pins slots 0-49 to the queries that most need a fresh
driver verdict (every §2C/LLM-pipeline operator, the functions corpus,
streaming batch-equivalents, queries changed this round, plus one
representative per core relational capability). Redundant variants of
already-verified capabilities rotate behind slot 50.
"""

from .registry import REGISTRY, Query, oracle_sql, queries, query  # noqa: F401

# Import for side effect: each module registers its queries.
from . import relational  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
from . import functions_corpus  # noqa: E402,F401
from . import extensions  # noqa: E402,F401
from . import streaming_batch  # noqa: E402,F401
from . import llm_prep  # noqa: E402,F401
from . import tpch_full  # noqa: E402,F401

# ROTATION — round 3: CORRECTNESS_r02 landed 50/50 green, so every round-2
# window entry now holds a verdict on record and rotates behind the window
# (protected by tests/test_registry_hygiene.py: green-on-record + local
# conformance). This window holds the 49 queries that have never had a
# driver verdict (every remaining round-2 addition: 6 relational-ext
# aggregates, window_first_last_nth/join_nullsafe, 7 fn variants, 21
# LLM-prep/corpus operators, 13 TPC-H shapes) plus ann_ivf_topk, whose
# round-3 refactor (build-once/probe-many IVF index) re-opens its verdict.
#
# Two queries wait for round 4 — the window is exactly 50:
# - subquery_correlated_min: its family is twice-verified
#   (subquery_correlated r1, subquery_not_in_nulls r1+r2) and the query is
#   unchanged, so it's the lowest-risk deferral;
# - fn_udtf_shingles (new this round): locally conformant, queued.
#
# Vacuity audit (round 3, sf0.01): every window oracle returns >0 rows;
# all >1 distinct rows except the four genuinely single-row TPC-H shapes
# (q2 top-1 supplier, q15 top supplier, q17/q19 scalar aggregates) whose
# verdicts rest on the exact value-hash of computed aggregates — none is
# a constant-true/tolerance column.
#
# ROUND-4 PLAN — machine-readable as NEXT_WINDOW_QUEUE below: slots for
# the two deferrals + round-3 additions, the round-3 changed-code
# re-verifies (fn_pandas_udf — exact null/trim semantics;
# dedup_url_normalized — fragment strip; dedup_semantic_cells +
# dedup_connected_components — k-param/checkpoint refactors; all
# behavior-identical at sf0.01, verified by local conformance, but per the
# no-stale-verdict bar they should re-earn driver rows), and ~5 long-green
# canaries, one per family. The hygiene gate accepts a queued query as
# holding a (future) verification slot.
GATE_PRIORITY = [
    # Relational-ext aggregates (round-2 additions).
    "agg_filter_clause",
    "agg_histogram_bins",
    "agg_approx_quantile",
    "agg_corr_regression",
    "agg_boolean",
    "agg_unpivot",
    # Window / join / subquery variants.
    "window_first_last_nth",
    "join_nullsafe",
    # Functions-corpus variants.
    "fn_conditional",
    "fn_string2",
    "fn_bitwise",
    "fn_datetime2",
    "fn_greatest_least",
    "fn_levenshtein",
    "fn_format",
    # LLM-prep / corpus operators (round-2 additions).
    "rank_bm25",
    "ngram_topk",
    "vocab_oov_rate",
    "embed_quantize_int8",
    "embed_random_projection",
    "mix_domain_weights",
    "sample_stratified",
    "sample_quality_weighted",
    "sample_domain_cap",
    "decontaminate_test_split",
    "decontaminate_ngram_overlap",
    "decontaminate_semantic",
    "filter_length_outliers",
    "boilerplate_span_removal",
    "report_corpus_health",
    "doc_chunk_overlap",
    "pack_sequences_text",
    "corpus_pretraining_pipeline",
    "merge_scd1_upsert",
    "funnel_stages",
    "retention_cohorts",
    # TPC-H shapes (round-2 additions, adapted to the fixture schema).
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_parts_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q20_potential_promotion",
    "tpch_q21_waiting_orders",
    "tpch_q22_sales_opportunity",
    # Changed this round: the IVF build/probe split re-opens the verdict.
    "ann_ivf_topk",
]

GATE_WINDOW = 50

# Queued for the round-4 window, in priority order: deferrals and round-3
# additions first (including the late-round-3 continuation batch:
# range/curriculum/epoch/cogroup/stream-adjacent ops, the five sketches,
# MAD screen, BPE merge iteration, HOF functions), then changed-code
# re-verifies, then long-green canaries (one per family). The FIRST 50
# entries fill the round-4 window exactly; entries beyond 50 (latest
# additions) roll into round 5. tests/test_registry_hygiene.py checks
# every name still exists and treats queued queries as slot-holders.
NEXT_WINDOW_QUEUE = [
    # deferred from round 3 (window was exactly full)
    "subquery_correlated_min",
    # round-3 additions, locally conformant
    "fn_udtf_shingles",
    "vocab_token_freq_stats",
    "multimodal_image_resize",
    "filter_gopher_rules",
    "mix_sqrt_temperature",
    "events_sessionize",
    "events_transition_matrix",
    "merge_scd2_history",
    "dedup_chunk_substring",
    "quality_unigram_rarity",
    "index_inverted_postings",
    "join_salted_skew",
    "embed_pq_encode",
    "ann_pq_adc_topk",
    "dedup_keep_best_in_cluster",
    "fn_url_parse",
    "fn_map",
    "cte_recursive",
    "report_key_skew",
    "asof_join_forward",
    "window_count_distinct",
    "agg_grouping_flags",
    "fn_try_arithmetic",
    "vocab_bpe_pair_counts",
    "report_packing_efficiency",
    "report_dedup_by_source",
    "join_range_bucketed",
    "order_curriculum_stages",
    "mix_epoch_repeat",
    "asof_join_cogroup",
    "sketch_count_min",
    "sketch_bloom_membership",
    "fn_lambda_hof",
    "sketch_hll_distinct",
    "sketch_cms_join_size",
    "events_anomaly_mad",
    "vocab_bpe_merge_apply",
    "sketch_quantile_histogram",
    # round-3 changed-code re-verifies (output-identical, per local conformance)
    "fn_pandas_udf",
    "dedup_url_normalized",
    "dedup_semantic_cells",
    "dedup_connected_components",
    "dedup_ngram_jaccard",  # array-side shingle rewrite (late round 3)
    "tpch_q18_large_orders",  # pre-aggregation rewrite (late round 3)
    # long-green canaries, one per major family (join_broadcast_dims and
    # the text family sit out this window: plan-pinned, unchanged, and
    # their families carry fresher verdicts than these do)
    "agg_tpch_q1",
    "dedup_minhash_lsh",
    "stream_tumbling_hourly",
    "multimodal_image_decode",
    "tpch_q3_shipping_priority",  # bench watcher flagged in the r2 verdict
    # --- round-5 rollover (beyond the 50-slot round-4 window) ---
    "text_ngram_novelty",
    "sample_semantic_coverage",
]


def _apply_gate_priority() -> None:
    """Reorder REGISTRY so GATE_PRIORITY occupies the first slots.

    Raises KeyError loudly if a pinned name disappears from the registry, so
    renames can never silently shrink the verified surface.
    """
    ordered = {name: REGISTRY[name] for name in GATE_PRIORITY}
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_gate_priority()
