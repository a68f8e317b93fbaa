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
from . import lifecycle  # noqa: E402,F401

# ROTATION — round 8 (the round-7 verdict's #1 directive: drain the
# stale-verdict backlog): slots 0-1 are this round's never-verified
# additions (the full MonetDBUtil type-lattice JDBC round-trip and the
# applyInPandasWithState stateful-streaming gate — verdict items 3 and
# 6, plus the partition-pruned sync gate); next are the changed-code
# re-verifies (jdbc_roundtrip_lineitem's
# read-back now goes through the multi-JVM-safe derby jar: snapshot —
# verdict item 2); slots 3-49 are canaries, least-recently-verified
# first (verdict age computed from CORRECTNESS_r01-r07, ties by
# registration order — this window drains every r2-aged verdict and
# most of r3; the 10 remaining r3 TPC-H shapes head NEXT_WINDOW_QUEUE).
#
# Vacuity audit (round 5, sf0.01): every window oracle returns >0 rows —
# checked by test_window_oracles_non_vacuous on every commit.
GATE_PRIORITY = [
    # --- slots 0-2: round-8 additions (never verified) ---
    "jdbc_roundtrip_typelattice",
    "stream_stateful_user_activity",
    "stream_lifecycle_partitioned",
    # --- slots 2-4: changed building code this round (jar:+bulk-load
    # read/write path; connected_components' 1-hop-min initialization
    # changed the plan of both its consumers) ---
    "jdbc_roundtrip_lineitem",
    "dedup_connected_components",
    "dedup_keep_best_in_cluster",
    # --- slots 5-49: canaries, least-recently-verified first (the two
    # displaced canaries tpch_q7/q8 move to the head of the r9 queue) ---
    "multimodal_image_decode",
    "pipeline_clean_corpus",
    "multimodal_audio_decode",
    "multimodal_video_frames",
    "dedup_incremental_ingest",
    "rollup_approx_users_daily",
    "stream_dedup_first",
    "text_pii_scrub",
    "pack_sequences",
    "split_train_val_test",
    "text_repetition",
    "agg_histogram_bins",
    "window_first_last_nth",
    "agg_boolean",
    "agg_unpivot",
    "fn_conditional",
    "fn_string2",
    "fn_bitwise",
    "fn_datetime2",
    "join_nullsafe",
    "fn_greatest_least",
    "fn_levenshtein",
    "fn_format",
    "ann_ivf_topk",
    "funnel_stages",
    "retention_cohorts",
    "embed_random_projection",
    "merge_scd1_upsert",
    "ngram_topk",
    "embed_quantize_int8",
    "mix_domain_weights",
    "sample_stratified",
    "decontaminate_test_split",
    "vocab_oov_rate",
    "filter_length_outliers",
    "decontaminate_ngram_overlap",
    "pack_sequences_text",
    "boilerplate_span_removal",
    "sample_quality_weighted",
    "corpus_pretraining_pipeline",
    "report_corpus_health",
    "doc_chunk_overlap",
    "sample_domain_cap",
    "decontaminate_semantic",
]

GATE_WINDOW = 50

# STEADY-STATE ROTATION POLICY (round-5 VERDICT item 7) — with the
# registry closed out, each round's window is composed in this order:
#   1. any never-verified additions (new queries land HERE, inside the
#      window, the same round they are registered — growth stays gated
#      on the per-round budget);
#   2. a re-verify slot for every query whose building code changed this
#      round (even when the output is identical by construction);
#   3. canaries, least-recently-verified first (ties broken by
#      registration order), filling the window to 50.
# With 197 queries and ~46 canary slots per round, every query's verdict
# age stays <= ~4 rounds; the per-family representation guarantee is
# enforced structurally by test_every_capability_family_verified_or_
# inside_window. NEXT_WINDOW_QUEUE below pre-stages round 9 under this
# policy: the remaining least-recently-verified queries in verdict-age
# order (computed from CORRECTNESS_r01-r07: the round-3-verdict tail —
# the 10 TPC-H shapes that didn't fit in the r8 window — then round-4),
# ties by registration order.
NEXT_WINDOW_QUEUE = [
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
    "join_salted_skew",
    "asof_join_forward",
    "window_count_distinct",
    "agg_grouping_flags",
    "fn_try_arithmetic",
    "asof_join_cogroup",
    "fn_pandas_udf",
    "fn_url_parse",
    "fn_map",
    "fn_lambda_hof",
    "multimodal_image_resize",
    "embed_pq_encode",
    "ann_pq_adc_topk",
    "ann_ivfadc_topk",
    "events_sessionize",
    "events_transition_matrix",
    "merge_scd2_history",
    "dedup_chunk_substring",
    "dedup_semantic_cells",
    "report_key_skew",
    "sketch_count_min",
    "sketch_bloom_membership",
    "sketch_hll_distinct",
    "sketch_cms_join_size",
    "events_anomaly_mad",
    "text_ngram_novelty",
    "sample_semantic_coverage",
    "mix_sqrt_temperature",
    "vocab_token_freq_stats",
    "quality_unigram_rarity",
    "quality_lm_bigram",
    "index_inverted_postings",
    "filter_gopher_rules",
    "dedup_url_normalized",
    "vocab_bpe_pair_counts",
    "report_packing_efficiency",
    "report_dedup_by_source",
    "order_curriculum_stages",
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
