"""Regression pins for the adversarial edge corpus (scripts/edge_corpus_probe.py).

The full probe sweeps all 192 registry queries (~5 min); this test keeps the
FIXED queries pinned in the fast suite — the thirteen that crashed or
diverged on hostile inputs before the round-5 hardening pass:

- ANSI DIVIDE_BY_ZERO: agg_variance_exact (singleton group),
  agg_corr_regression (zero-variance group), join_range_bucketed
  (zero-quantity probe row) — now NULLIF in lockstep with the oracle
- ANSI CAST_INVALID_INPUT: fn_string (digitless name), fn_json
  (non-numeric JSON field), mix_epoch_repeat (suffix-less source) — now
  try_cast/TRY_CAST in lockstep
- DECIMAL(24,8) overflow at value = 1e18: rollup_time_buckets,
  stream_tumbling_hourly, stream_sliding_windows, stream_watermark_recent
  — helpers/rollup sums widened to DECIMAL(30,8) in lockstep
- sequence(1, 0) descending: vocab_bpe_merge_apply (a 2-symbol token whose
  body IS the top pair merges to ONE symbol; Spark's sequence is [1, 0]
  where DuckDB's generate_series is empty) — recount guarded
- oracle tie-order bug: stream_session_windows (running-sum window ordered
  (ts, is_new) while the lag ordered (ts, event_id); tied timestamps split
  one session into two) — oracle rewritten to the lag's order
- invariant not implied by the sketch: agg_approx_quantile (±5%-of-value
  check fails legitimately on a 2-row spread-out group) — replaced with
  the GK rank guarantee itself

Each runs Spark vs DuckDB through the same canonicalize/compare the driver
gate uses, on the hostile corpus.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from .oracle_harness import compare_frames, duckdb_connection  # noqa: E402

FIXED_QUERIES = [
    "agg_approx_quantile",
    "agg_corr_regression",
    "agg_variance_exact",
    "fn_json",
    "fn_string",
    "join_range_bucketed",
    "mix_epoch_repeat",
    "rollup_time_buckets",
    "stream_session_windows",
    "stream_sliding_windows",
    "stream_tumbling_hourly",
    "stream_watermark_recent",
    "vocab_bpe_merge_apply",
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory) -> str:
    import edge_corpus_probe as probe

    d = tmp_path_factory.mktemp("edge_corpus")
    orig = probe.EDGE_DIR
    probe.EDGE_DIR = str(d)
    try:
        probe.build_corpus()
    finally:
        probe.EDGE_DIR = orig
    return str(d)


@pytest.mark.parametrize("name", FIXED_QUERIES)
def test_edge_corpus_conformance(spark, edge_dir, name):
    import __spark_entry__ as mod

    qs, osql = mod.queries(), mod.oracle_sql()
    spark_pdf = qs[name](spark, edge_dir).toPandas()
    duck = duckdb_connection(edge_dir)
    oracle_pdf = duck.execute(osql[name]).fetchdf()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name} diverged on the edge corpus: {problems}"
