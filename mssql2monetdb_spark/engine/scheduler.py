"""Polling scheduler — the reference's in-process loop
(``CopyTool.java:121-160``) with the same interval grammar
(``CopyToolConfig.java:574-642``): ``"every N minutes|hours|days"`` or a raw
seconds value. Per-iteration exceptions are swallowed (logged), never fatal.

The idiomatic Spark upgrade for streaming sources is Structured Streaming
with ``trigger(processingTime=...)`` (see ``streaming/pipelines.py``); this
loop remains for batch-mode parity and for JDBC sources that are polled.
"""

from __future__ import annotations

import logging
import re
import time
from collections.abc import Callable

log = logging.getLogger(__name__)

_INTERVAL_RE = re.compile(
    r"^\s*every\s+(\d+)\s*(minute|minutes|hour|hours|day|days)\s*$", re.IGNORECASE
)
_UNIT_SECONDS = {"minute": 60, "hour": 3600, "day": 86400}

#: the reference sleeps in <=1-minute increments so shutdown is responsive
#: (CopyTool.java:144-156)
SLEEP_INCREMENT_SECONDS = 60


def parse_interval(text: str | int) -> int:
    """Interval -> seconds. Accepts ``every N minutes/hours/days`` (grammar
    of ``CopyToolConfig.java:574-642``) or a raw integer of seconds."""
    if isinstance(text, int):
        return text
    m = _INTERVAL_RE.match(text)
    if m:
        n, unit = int(m.group(1)), m.group(2).lower().rstrip("s")
        return n * _UNIT_SECONDS[unit]
    try:
        return int(str(text).strip())
    except ValueError:
        raise ValueError(
            f"invalid scheduler interval {text!r}; expected 'every N minutes|hours|days' "
            f"or raw seconds"
        ) from None


def run_scheduled(
    job: Callable[[], object],
    interval: str | int,
    *,
    max_runs: int | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> int:
    """Run ``job`` forever (or ``max_runs`` times) every ``interval``.

    Mirrors the reference loop: run, log-and-continue on ANY exception
    (``CopyTool.java:131-141``), then sleep the interval in <=60 s
    increments. Returns the number of completed iterations.
    """
    seconds = parse_interval(interval)
    runs = 0
    while max_runs is None or runs < max_runs:
        try:
            job()
        except Exception:
            log.exception("scheduled run failed; continuing")  # never fatal
        runs += 1
        if max_runs is not None and runs >= max_runs:
            break
        remaining = seconds
        while remaining > 0:
            step = min(remaining, SLEEP_INCREMENT_SECONDS)
            sleep(step)
            remaining -= step
    return runs
