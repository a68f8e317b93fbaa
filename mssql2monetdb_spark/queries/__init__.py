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

# ROTATION — round 4: CORRECTNESS_r03 landed 50/50 green, so every round-3
# window entry now holds a verdict on record and rotates behind the window
# (protected by tests/test_registry_hygiene.py: green-on-record + local
# conformance). This window is the round-3 VERDICT's pre-staged plan
# verbatim (the former NEXT_WINDOW_QUEUE's first 50): the round-3 deferral
# (subquery_correlated_min), the 38 never-verified round-3 additions
# (all five sketches, PQ-ANN, chunk substring dedup, events family, BPE,
# HOF/map/url function variants, recursive CTE, as-of joins, ...), the six
# round-3 changed-code re-verifies (fn_pandas_udf, dedup_url_normalized,
# dedup_semantic_cells, dedup_connected_components, dedup_ngram_jaccard,
# tpch_q18_large_orders), the two late-round-3 rollovers, and — replacing
# the three canary slots, per VERDICT item 8's promotion logic — three of
# the four round-4 additions, so a green gate closes driver coverage to
# 189/190 this round (every displaced canary is a bench query the driver
# exercises every round anyway).
#
# Round-4 ADVICE fixes landed BEFORE this window runs, all inside it:
# sketch_count_min (probe left-join + 0-floor, oracle updated in step),
# sketch_bloom_membership (all-rows-matched membership, oracle in step),
# sketch_hll_distinct (oracle 1::BIGINT shift — Spark side unchanged),
# sketch_quantile_histogram (1e-9 width floor both sides). Outputs at
# sf0.01 are unchanged by construction (probes are seen+distinct, data is
# non-constant); local conformance re-run post-fix confirms.
#
# Vacuity audit (round 4, sf0.01): every window oracle returns >0 rows —
# checked by test_window_oracles_non_vacuous on every commit.
GATE_PRIORITY = [
    # deferred from round 3 (window was exactly full)
    "subquery_correlated_min",
    # round-3 additions, never driver-verified
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
    # the two late-round-3 rollovers, promoted per round-3 VERDICT item 8
    # ("closing to 186/186 one round early is worth a canary slot"): they
    # replace the two most-redundant canaries — agg_tpch_q1 (green r1+r2+r3
    # AND exercised by the driver bench every round) and
    # multimodal_image_decode (green r2; multimodal_image_resize in this
    # window covers the family)
    "text_ngram_novelty",
    "sample_semantic_coverage",
    # three of the four round-4 additions, promoted by the same VERDICT
    # item-8 logic over the canary slots they replace: the displaced
    # canaries (dedup_minhash_lsh, stream_tumbling_hourly,
    # tpch_q3_shipping_priority) are ALL bench queries the driver runs
    # every round regardless, and all three are green-on-record r1-r3,
    # while these three have never held a driver verdict. All are
    # locally conformant at sf0.001, sf0.01 (drive_entry) and sf0.1.
    # A green gate leaves prep_chunk_overlap and dedup_setsim_exact as
    # the only queries in the registry without a driver verdict
    # (189/191).
    "quality_lm_bigram",
    "ann_ivfadc_topk",
    "text_tfidf_topk",
]

GATE_WINDOW = 50

# ROUND-5 PLAN — with the rollovers AND three of the five round-4
# additions promoted into this window, CORRECTNESS_r04 green leaves
# exactly TWO registry queries without a driver verdict
# (prep_chunk_overlap and dedup_setsim_exact, first slots below). Round
# 5 becomes that close-out plus canary rotation (plus re-verifies for
# anything round 5 changes). Registry growth stays frozen (round-3
# VERDICT item 3): additions must be appended here as they land.
NEXT_WINDOW_QUEUE = [
    # the last never-verified round-4 additions (locally conformant at
    # sf0.001 / sf0.01 drive_entry / sf0.1)
    "prep_chunk_overlap",
    "dedup_setsim_exact",
    # long-green canaries, one per major family (rotating members that sat
    # out the round-4 window)
    "agg_tpch_q1",
    "multimodal_image_decode",
    "join_broadcast_dims",
    "text_stats",
    "window_row_number",
    "fn_json",
    "pipeline_clean_corpus",
    "dedup_minhash_lsh",
    "stream_tumbling_hourly",
    "tpch_q3_shipping_priority",
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
