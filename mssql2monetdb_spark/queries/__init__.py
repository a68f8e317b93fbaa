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

# ROTATION — round 10 (the round-9 verdict's directive 2: roll the window
# from NEXT_WINDOW_QUEUE): slots 0-13 are this round's never-verified
# additions (the schema-qualified two-schema publish gate — verdict item
# 1 — plus hybrid RRF retrieval, hourly LOCF gap fill, UNPIVOT,
# PageRank power iteration, the version-diff change feed, and the
# one-scan column profiler, the readStream->JdbcWarehouse sync gate,
# incremental IVF maintenance, bounded-BFS reachability, and bitwise
# aggregates, the struct-ops corpus, the freshness-lag report, and
# funnel time-to-convert); slots 14-20 are the changed-code
# re-verifies
# (the bulk loader's MonetDB staging serializer + import-concurrency
# knob, JdbcWarehouse's always-scoped catalog probes + schema
# qualification + warehouse-side evolve + transactional rollback, the
# watermark probe's identifier-case ladder, and CopyEngine's schema
# plumbing touch every lifecycle gate); slots 21-49 are canaries,
# least-recently-verified first (verdict age computed from
# CORRECTNESS_r01-r09, ties by registration order) — this window drains
# ALL 10 r4-aged rows and the oldest 18 of the r6 block, leaving no
# verdict older than r6.
#
# Vacuity audit (round 5, sf0.01): every window oracle returns >0 rows —
# checked by test_window_oracles_non_vacuous on every commit.
GATE_PRIORITY = [
    "jdbc_schema_publish",
    "rank_hybrid_rrf",
    "events_gap_fill",
    "fn_unpivot",
    "graph_pagerank",
    "catalog_version_diff",
    "report_column_profile",
    "stream_jdbc_warehouse_publish",
    "ann_ivf_incremental",
    "graph_reachability",
    "agg_bitwise",
    "fn_struct_ops",
    "report_freshness_lag",
    "events_funnel_timing",
    "jdbc_roundtrip_lineitem",
    "jdbc_roundtrip_typelattice",
    "jdbc_warehouse_publish",
    "copy_incremental_watermark",
    "copy_multi_table_guard",
    "stream_lifecycle_publish",
    "stream_lifecycle_partitioned",
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
    "subquery_scalar",
    "subquery_correlated",
    "window_row_number",
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
# With 203 queries and ~42 canary slots per round, every query's verdict
# age stays <= ~4 rounds; the per-family representation guarantee is
# enforced structurally by test_every_capability_family_verified_or_
# inside_window. NEXT_WINDOW_QUEUE below pre-stages round 11 under this
# policy: every query NOT in the r10 window, ordered by verdict age
# (computed from CORRECTNESS_r01-r09 — the remaining r6 block first,
# then the r7 tail), ties by registration order.
NEXT_WINDOW_QUEUE = [
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
