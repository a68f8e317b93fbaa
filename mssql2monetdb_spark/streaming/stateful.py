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


def _make_tracker(evict: bool, idle_timeout_ms: int = DEFAULT_IDLE_TIMEOUT_MS):
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
        if evict:
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
) -> DataFrame:
    """Per-user cumulative activity; optional idle-state eviction.

    ``evict_idle=True`` uses ProcessingTimeTimeout to drop users idle past
    ``idle_timeout_ms`` (the production knob for continuous triggers —
    state size then tracks the ACTIVE key set; measured by
    ``scripts/stateful_capacity_probe.py``). Leave it off with
    ``trigger(availableNow=True)``: Spark 4.1's end-of-drain state-cleanup
    batch raises an internal planner error when a processing-time timeout is
    configured (observed locally; the data batches themselves succeed).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if evict_idle else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_tracker(evict_idle, idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
