"""Property tests for the streaming sync's replay guard and version
counter (streaming/pipelines.py pure logic) — the exactly-once /
retention-ordering invariants hold for ARBITRARY manifest states and
retained-directory layouts, not just the example states the integration
tests construct."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from mssql2monetdb_spark.engine.publish import physical_name
from mssql2monetdb_spark.streaming.pipelines import (
    SEQ_BASE,
    batch_is_committed,
    next_version_seq,
    seq_of_physical,
)

# encodable version dates: the VERSION_RE name pattern requires year 20xx
_dates = st.datetimes(min_value=datetime(2000, 1, 1), max_value=datetime(2099, 12, 31))
_lineages = st.one_of(st.none(), st.uuids().map(str))


def _name(dt: datetime) -> str:
    return physical_name("t", dt.replace(microsecond=0))


@given(
    lineage=_lineages,
    other=_lineages,
    batch_id=st.integers(min_value=0, max_value=10**6),
    other_batch=st.integers(min_value=0, max_value=10**6),
)
def test_guard_skips_iff_provenance_matches(lineage, other, batch_id, other_batch):
    info = {"lineage": lineage, "batch_id": batch_id}
    if lineage is None:
        # degraded lineage NEVER matches — even a None-recording manifest;
        # the guard fails open to a content-idempotent re-merge rather than
        # skipping a fresh checkpoint's batch 0 on batch_id alone
        assert not batch_is_committed(info, lineage, batch_id)
    else:
        assert batch_is_committed(info, lineage, batch_id)
    if (other, other_batch) != (lineage, batch_id) or other is None:
        assert not batch_is_committed(info, other, other_batch)
    # unpublished table: nothing is ever committed
    assert not batch_is_committed({}, lineage, batch_id)


@given(seq=st.integers(min_value=0, max_value=10**9), dates=st.lists(_dates, max_size=8))
def test_steady_state_is_listing_independent(seq, dates):
    """With a recorded seq, the next seq is manifest-driven ONLY — a crash
    replay must recompute the same name from the unchanged manifest even
    though its own half-written directory appears in the listing."""
    info = {"seq": seq, "physical": _name(SEQ_BASE + timedelta(seconds=seq))}
    retained = [_name(d) for d in dates]
    assert next_version_seq(info, retained) == seq + 1
    assert next_version_seq(info, []) == seq + 1


@settings(max_examples=200)
@given(dates=st.lists(_dates, min_size=0, max_size=8), cur=st.one_of(st.none(), _dates))
def test_migration_outsorts_every_retained_name(dates, cur):
    """Without a recorded seq (legacy day-salt / external publish), the
    next publish's name must sort strictly above the manifest's current
    AND every retained dir — otherwise newest_version()/cleanup stay
    pinned to a stale directory forever."""
    info = {} if cur is None else {"physical": _name(cur)}
    retained = [_name(d) for d in dates]
    seq = next_version_seq(info, retained)
    new_name = _name(SEQ_BASE + timedelta(seconds=seq))
    for old in retained + ([_name(cur)] if cur is not None else []):
        assert new_name > old, (new_name, old)


@given(dates=st.lists(_dates, min_size=1, max_size=8))
def test_migration_then_steady_state_stays_monotonic(dates):
    """After the one-shot migration publish records its seq, subsequent
    manifest-driven publishes keep outsorting everything."""
    seq1 = next_version_seq({"physical": _name(dates[0])}, [_name(d) for d in dates])
    info1 = {"seq": seq1, "physical": _name(SEQ_BASE + timedelta(seconds=seq1))}
    seq2 = next_version_seq(info1, [_name(d) for d in dates] + [info1["physical"]])
    assert seq2 == seq1 + 1
    assert _name(SEQ_BASE + timedelta(seconds=seq2)) > info1["physical"]


@settings(max_examples=200)
@given(
    legacy=_dates,
    extra=st.lists(_dates, max_size=4),
    n_publishes=st.integers(min_value=2, max_value=6),
)
def test_retention_cycle_never_reaps_new_lineage_backup(legacy, extra, n_publishes):
    """A legacy day-salted name (the pre-seq scheme encoded wall-clock+salt
    dates, possibly decades ahead — e.g. year 2073) coexists with seq-named
    versions across a FULL retention cycle: the one-shot migration must seed
    the counter past the legacy name, because keep-2 retention sorts BY NAME
    — if any post-migration publish failed to outsort the legacy dir, the
    legacy dir would occupy a retention slot and cleanup would reap the new
    lineage's backup (the previous publish), destroying the rollback copy.

    Mirrors VersionedCatalog.cleanup semantics exactly: keep the
    ``retain`` newest names by reverse sort, never drop the current."""

    def cleanup_sim(names: list[str], current: str, retain: int = 2) -> list[str]:
        keep = set(sorted(names, reverse=True)[:retain]) | {current}
        return [n for n in names if n in keep]

    retained = [_name(legacy)] + [_name(d) for d in extra]
    info: dict = {"physical": _name(legacy)}
    published: list[str] = []
    for _ in range(n_publishes):
        seq = next_version_seq(info, retained)
        name = _name(SEQ_BASE + timedelta(seconds=seq))
        published.append(name)
        retained = cleanup_sim(retained + [name], current=name)
        info = {"seq": seq, "physical": name}
        if len(published) >= 2:
            backup = published[-2]
            assert backup in retained, (
                f"retention reaped the new lineage's backup {backup}; "
                f"retained={retained} legacy={_name(legacy)}"
            )


@given(d=_dates)
def test_seq_of_physical_roundtrip(d):
    d = d.replace(microsecond=0)
    s = seq_of_physical(_name(d))
    assert s == int((d - SEQ_BASE).total_seconds())
    assert seq_of_physical(None) is None
    assert seq_of_physical("not_a_version") is None
