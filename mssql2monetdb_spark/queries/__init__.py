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

# ROTATION — round 5: CORRECTNESS_r04 landed 50/50 green, taking
# cumulative driver coverage to 189/191 (every round-4 window entry now
# holds a verdict on record and rotates behind the window, protected by
# tests/test_registry_hygiene.py: green-on-record + local conformance).
# This window is the registry CLOSE-OUT (slots 0-1: the only two queries
# ever registered without a driver verdict — a green gate closes the
# registry to 192/192 verified), the round-5 growth-budget addition
# (slot 2: events_sessionize_bounded, the hot-key window mitigation,
# oracle identical to events_sessionize), the changed-code re-verifies
# (slots 3-21 — see the inline note), and the first steady-state canary
# rotation (slots 22-49: latest-verdict-round-1 queries, registration
# order; the 13 displaced round-1 canaries head NEXT_WINDOW_QUEUE).
#
# Vacuity audit (round 5, sf0.01): every window oracle returns >0 rows —
# checked by test_window_oracles_non_vacuous on every commit.
GATE_PRIORITY = [
    # --- slots 0-2: close-out (the two never-verified round-4 adds) +
    # the round-5 growth-budget addition ---
    "prep_chunk_overlap",
    "dedup_setsim_exact",
    "events_sessionize_bounded",
    # --- slots 3-21: changed-code re-verifies. Everything whose BUILDING
    # code changed in round 5, per the rotation policy (re-verify even
    # when output-identical by construction): the adaptive broadcast
    # guards, the two-pass exact-quantile selection, the q18
    # single-decimal-sum rewrite, the nine SQL builders converted to
    # ephemeral temp views (shared-session safety), and the operators
    # whose intermediate caches now route through the tracked-cache
    # registry. All re-driven locally post-change (MATCH at sf0.01; the
    # view conversion also at sf0.1 + invariance/cluster/spill probes) --
    # the window slot turns that into a driver verdict on record. ---
    "text_tfidf_topk",
    "sketch_quantile_histogram",
    "tpch_q18_large_orders",
    "subquery_scalar",
    "subquery_correlated",
    "subquery_not_in_nulls",
    "subquery_correlated_min",
    "agg_grouping_sets",
    "agg_filter_clause",
    "cte_with_clause",
    "cte_recursive",
    "fn_udtf_shingles",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_connected_components",
    "dedup_keep_best_in_cluster",
    "rollup_time_buckets",
    "rank_bm25",
    # --- slots 22-49: canaries, least-recently-verified first (all
    # remaining latest-verdict-round-1 queries, registration order) ---
    "scan_lineitem",
    "projection",
    "filter_predicates",
    "filter_like_null",
    "join_inner",
    "join_left_outer",
    "join_full_outer",
    "join_semi",
    "join_broadcast_dims",
    "join_theta_range",
    "join_cross",
    "agg_count_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_having",
    "agg_minmax",
    "window_row_number",
    "window_lag_lead",
    "window_running_sum",
    "window_ntile",
    "sort_multi_key",
    "topk_limit",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
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
# With 192 queries and ~46 canary slots per round, every query's verdict
# age stays <= ~4 rounds; the per-family representation guarantee is
# enforced structurally by test_every_capability_family_verified_or_
# inside_window. NEXT_WINDOW_QUEUE below pre-stages round 6 under this
# policy: the round-1-verdict canaries displaced by this round's
# changed-code re-verifies, then the round-2-verdict tail
# (registration order), then the oldest round-3 verdicts.
NEXT_WINDOW_QUEUE = [
    # displaced round-1 canaries first (oldest verdicts), then the
    # round-2 tail the policy was already queuing; entries that moved
    # into the round-5 window as changed-code re-verifies are removed
    "agg_mode_deterministic",
    "tpch_q6_forecast_revenue",
    "tpch_q4_order_priority",
    "tpch_q10_returned_items",
    "tpch_q12_conditional_agg",
    "tpch_q14_promo_ratio",
    "window_percent_cume",
    "window_moving_avg",
    "agg_string_agg",
    "agg_pivot",
    "agg_percentiles",
    "sample_deterministic_hash",
    "asof_join_events",
    "agg_variance_exact",
    "join_anti",
    "agg_tpch_q1",
    "agg_approx_count_distinct",
    "agg_array_collect",
    "window_range_frame",
    "fn_string",
    "fn_datetime",
    "fn_math",
    "fn_json",
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
    "multimodal_image_decode",
    "pipeline_clean_corpus",
    "multimodal_audio_decode",
    "multimodal_video_frames",
    "dedup_incremental_ingest",
    "rollup_approx_users_daily",
    "stream_tumbling_hourly",
    "stream_sliding_windows",
    "stream_session_windows",
    "stream_dedup_first",
    "stream_watermark_recent",
    "stream_static_enrich",
    "text_pii_scrub",
    "pack_sequences",
    "split_train_val_test",
    "text_repetition",
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
