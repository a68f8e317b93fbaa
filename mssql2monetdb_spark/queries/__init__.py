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

# ROTATION — round 7 (the round-5/6 verdicts' #1 directive, two rounds
# overdue): slots 0-2 are this round's never-verified additions (the
# three lifecycle queries that put the engine's own JDBC, streaming-
# publish, and incremental-copy machinery under the driver gate);
# slots 3-19 are the STALE-VERDICT re-verifies — every query whose
# physical plan changed in round 5 (the DEC(30,8) widening's dsum/davg
# consumers, the edge-corpus/ANSI hardening set, the replaced
# approx-quantile invariant, and the session-window oracle change) but
# whose green verdict on record predates the change; slots 20-49 are
# canaries, least-recently-verified first (verdict age computed from
# CORRECTNESS_r01-r06, ties by registration order — ages 1-3).
#
# Vacuity audit (round 5, sf0.01): every window oracle returns >0 rows —
# checked by test_window_oracles_non_vacuous on every commit.
GATE_PRIORITY = [
    # --- slots 0-2: round-7 additions (never verified) ---
    "jdbc_roundtrip_lineitem",
    "stream_lifecycle_publish",
    "copy_incremental_watermark",
    # --- slots 3-19: stale-verdict re-verifies (round-5 plan changes
    # whose driver verdicts predate them; all locally DuckDB-conformant
    # at HEAD — the slot turns that into driver evidence) ---
    "agg_tpch_q1",
    "tpch_q6_forecast_revenue",
    "tpch_q14_promo_ratio",
    "agg_percentiles",
    "agg_variance_exact",
    "agg_corr_regression",
    "stream_tumbling_hourly",
    "stream_sliding_windows",
    "stream_watermark_recent",
    "stream_static_enrich",
    "stream_session_windows",
    "fn_string",
    "fn_json",
    "mix_epoch_repeat",
    "vocab_bpe_merge_apply",
    "join_range_bucketed",
    "agg_approx_quantile",
    # --- slots 20-49: canaries, least-recently-verified first ---
    "tpch_q4_order_priority",
    "tpch_q10_returned_items",
    "tpch_q12_conditional_agg",
    "window_percent_cume",
    "window_moving_avg",
    "agg_string_agg",
    "agg_pivot",
    "sample_deterministic_hash",
    "asof_join_events",
    "agg_mode_deterministic",
    "join_anti",
    "agg_approx_count_distinct",
    "agg_array_collect",
    "window_range_frame",
    "fn_datetime",
    "fn_math",
    "fn_array",
    "fn_explode_posexplode",
    "fn_null_semantics",
    "fn_array_setops",
    "fn_try_cast",
    "dedup_exact",
    "dedup_embedding_cosine",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "text_stats",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "multimodal_binary_meta",
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
# With 195 queries and ~46 canary slots per round, every query's verdict
# age stays <= ~4 rounds; the per-family representation guarantee is
# enforced structurally by test_every_capability_family_verified_or_
# inside_window. NEXT_WINDOW_QUEUE below pre-stages round 8 under this
# policy: the remaining least-recently-verified queries in verdict-age
# order (computed from CORRECTNESS_r01-r06: the round-2-verdict tail,
# then round-3), ties by registration order.
NEXT_WINDOW_QUEUE = [
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
