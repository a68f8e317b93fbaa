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

# ROTATION — round 11 (the round-10 verdict's directive 2: burn down the
# verdict-staleness backlog from the age ladder): the head slots are this
# round's never-verified additions — the continuation session's new
# operators first (each displaces the youngest remaining tail canary
# into NEXT_WINDOW_QUEUE head), then the date-partitioned publish gate
# with in-builder partition-pruning assertions (verdict item 4) plus the
# stream-stream interval-join attribution, small-file compaction,
# exchange-free bucketed-join, z-order locality, and dynamic-partition-
# pruning gates, all previously pytest/probe-only; next the
# changed-code re-verifies (graph_pagerank's hub-skew-safe
# two-level fold — verdict item 1 — and the three warehouse-publish
# gates riding engine/export.py's sink-type-lattice schema comparison,
# ADVICE items 1-2); the remaining slots are canaries,
# least-recently-verified first (verdict age computed from
# CORRECTNESS_r01-r10, ties by registration order) — this window drains
# ALL 29 r6-aged rows plus the oldest r7 rows that still fit; displaced
# r7 canaries head NEXT_WINDOW_QUEUE for round 12 (after which no
# verdict is older than r8 — the directive's target).
#
# Vacuity audit (round 5, sf0.01): every window oracle returns >0 rows —
# checked by test_window_oracles_non_vacuous on every commit.
GATE_PRIORITY = [
    "graph_triangle_count",
    "join_runtime_bloom_pruned",
    "quality_classifier_linear",
    "sample_importance_dsir",
    "events_seasonal_hourly",
    "rank_mmr_diverse",
    "er_record_linkage",
    "dedup_winnow_fingerprints",
    "copy_partitioned_publish",
    "stream_stream_join_attribution",
    "catalog_compact_publish",
    "join_bucketed_colocated",
    "catalog_zorder_publish",
    "join_dpp_partition_pruned",
    "graph_pagerank",
    "jdbc_schema_publish",
    "jdbc_warehouse_publish",
    "stream_jdbc_warehouse_publish",
    # optimization-round re-verifies (policy rule 2, second session): the
    # IVF argmin assignment became a map-side-combinable min(struct)
    # aggregate (operators/similarity.py _argmin_assign — guide §2.3,
    # K-fold shuffle cut), changing these five consumers' plans; the five
    # displaced canaries (window_lag_lead, window_running_sum,
    # window_ntile, sort_multi_key, topk_limit — all r6-aged but every
    # one independently re-driven MATCH by the r10 judge) head
    # NEXT_WINDOW_QUEUE for round 12.
    "ann_ivf_topk",
    "ann_ivfadc_topk",
    "ann_ivf_incremental",
    "dedup_semantic_cells",
    "decontaminate_semantic",
    "set_union_all",
    # optimization-round re-verifies (policy rule 2, second session): the
    # connected-components loop fused its per-round convergence count into
    # the round's own join output (operators/dedup.py) — the returned
    # plan is unchanged (fingerprint gate: 0 changed; the flag column is
    # pruned from the final projection) but the building code of every CC
    # consumer changed, so all three get fresh slots; the displaced
    # canaries (set_union_distinct, set_intersect, set_except — three
    # variants of the one set-op capability whose representative
    # set_union_all keeps its slot, all three independently re-driven
    # MATCH by the r10 judge) head NEXT_WINDOW_QUEUE for round 12.
    "dedup_connected_components",
    "dedup_keep_best_in_cluster",
    "pipeline_clean_corpus",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q18_large_orders",
    "agg_grouping_sets",
    "subquery_not_in_nulls",
    "cte_with_clause",
    "subquery_correlated_min",
    "agg_filter_clause",
    "cte_recursive",
    "fn_udtf_shingles",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "rollup_time_buckets",
    "events_sessionize_bounded",
    "sketch_quantile_histogram",
    "dedup_setsim_exact",
    "rank_bm25",
    "text_tfidf_topk",
    # optimization-round re-verifies (policy rule 2): the round-11
    # optimization session removed the pre-window/pre-groupBy
    # round-robin repartition from user_transition_edges, sessionize,
    # transition_matrix and gap_fill_hourly — every consumer whose plan
    # changed and wasn't already in the window gets a slot here; the 4
    # youngest tail canaries (prep_chunk_overlap, join_anti,
    # agg_tpch_q1, agg_approx_count_distinct) move to the head of
    # NEXT_WINDOW_QUEUE. (graph_pagerank, graph_triangle_count and
    # events_sessionize_bounded also changed plans but already hold
    # slots above.)
    "events_sessionize",
    "events_transition_matrix",
    "events_gap_fill",
    "graph_reachability",
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
# With 222 queries and ~40 canary slots per round, every query's verdict
# age stays <= ~4 rounds; the per-family representation guarantee is
# enforced structurally by test_every_capability_family_verified_or_
# inside_window. NEXT_WINDOW_QUEUE below pre-stages round 12 under this
# policy: every query NOT in the r11 window, ordered by verdict age
# (computed from CORRECTNESS_r01-r10 — the remaining r7 block first,
# then the oldest r8 rows), ties by registration order.
NEXT_WINDOW_QUEUE = [
    # displaced by the round-11 optimization re-verifies (age order; the
    # three set-op variants are r6-aged, hence ahead of the r7 block)
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "window_lag_lead",
    "window_running_sum",
    "window_ntile",
    "sort_multi_key",
    "topk_limit",
    "prep_chunk_overlap",
    "join_anti",
    "agg_tpch_q1",
    "agg_approx_count_distinct",
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
    "agg_array_collect",
    "agg_mode_deterministic",
    "window_range_frame",
    "agg_approx_quantile",
    "agg_corr_regression",
    "join_range_bucketed",
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
    "stream_tumbling_hourly",
    "stream_sliding_windows",
    "stream_session_windows",
    "stream_watermark_recent",
    "stream_static_enrich",
    "mix_epoch_repeat",
    "vocab_bpe_merge_apply",
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
    "multimodal_image_decode",
    "funnel_stages",
    "retention_cohorts",
    "multimodal_audio_decode",
    "multimodal_video_frames",
    "dedup_incremental_ingest",
    "embed_random_projection",
    "rollup_approx_users_daily",
    "merge_scd1_upsert",
    "stream_dedup_first",
    "text_pii_scrub",
    "pack_sequences",
    "split_train_val_test",
    "ngram_topk",
    "embed_quantize_int8",
    "mix_domain_weights",
    "sample_stratified",
    "decontaminate_test_split",
    "text_repetition",
    "vocab_oov_rate",
    "filter_length_outliers",
    "decontaminate_ngram_overlap",
    "pack_sequences_text",
    "boilerplate_span_removal",
    "sample_quality_weighted",
    "corpus_pretraining_pipeline",
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
