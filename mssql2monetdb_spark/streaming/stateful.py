"""Custom stateful streaming operator via ``applyInPandasWithState``.

``user_activity_tracker`` maintains per-user running state across
micro-batches — event count, value sum, last-seen timestamp — and emits one
updated summary row per user per batch. This is the escape hatch for
stateful logic that windowed aggregation can't express (cross-window
counters, custom eviction policies, model state).

State is per-key and checkpointed by the engine; a processing-time timeout
evicts idle users so state size tracks the ACTIVE key set, not the all-time
key set — the knob that keeps a 100 TB stream's state bounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts_micros", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


DEFAULT_IDLE_TIMEOUT_MS = 60 * 60 * 1000  # evict after 1h idle


def _make_tracker(
    evict: bool,
    idle_timeout_ms: int = DEFAULT_IDLE_TIMEOUT_MS,
    *,
    event_time: bool = False,
):
    def _track(key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if evict and state.hasTimedOut:
            # idle user: emit nothing, drop the state
            state.remove()
            return
        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max_us = int(pdf["ts"].astype("int64").max()) // 1000
            last_us = max(last_us, batch_max_us)
        state.update((n, total, last_us))
        if evict and event_time:
            # eviction pinned to EVENT time: fires when the WATERMARK
            # passes last-seen + idle window — deterministic under
            # checkpoint replay (wall clock never participates). The
            # timer must sit strictly past the current watermark or
            # Spark rejects it (late keys whose idle window already
            # elapsed time out on the very next batch).
            deadline_ms = last_us // 1000 + idle_timeout_ms
            state.setTimeoutTimestamp(
                max(deadline_ms, state.getCurrentWatermarkMs() + 1)
            )
        elif evict:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [total],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return _track


def user_activity_tracker(
    events: DataFrame,
    *,
    evict_idle: bool = False,
    idle_timeout_ms: int = DEFAULT_IDLE_TIMEOUT_MS,
    timeout_mode: str = "processing",
    watermark_delay: str = "1 second",
) -> DataFrame:
    """Per-user cumulative activity; optional idle-state eviction.

    ``evict_idle=True`` with ``timeout_mode="processing"`` uses
    ProcessingTimeTimeout to drop users idle past ``idle_timeout_ms``
    (the production knob for continuous triggers — state size then tracks
    the ACTIVE key set; measured by ``scripts/stateful_capacity_probe.py``).
    Leave eviction off with ``trigger(availableNow=True)``: Spark 4.1's
    end-of-drain state-cleanup batch raises an internal planner error when
    a processing-time timeout is configured (observed locally; the data
    batches themselves succeed).

    ``timeout_mode="event"`` switches to EventTimeTimeout: a watermark
    (``watermark_delay``) is applied on ``ts`` and each user's eviction
    timer is set to last-seen event time + ``idle_timeout_ms``. Because
    the timer is a function of the DATA (event times), not of wall clock,
    a checkpoint-recovery replay evicts exactly the same keys at exactly
    the same batch boundaries — the replay-deterministic mode for
    at-least-once sinks at scale (pinned by
    ``tests/test_streaming.py::test_stateful_tracker_event_time_*``).
    """
    if timeout_mode not in ("processing", "event"):
        raise ValueError(f"timeout_mode must be processing|event, got {timeout_mode!r}")
    event_time = timeout_mode == "event" and evict_idle
    if event_time:
        events = events.withWatermark("ts", watermark_delay)
        timeout = GroupStateTimeout.EventTimeTimeout
    elif evict_idle:
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    return events.groupBy("user_id").applyInPandasWithState(
        _make_tracker(evict_idle, idle_timeout_ms, event_time=event_time),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
