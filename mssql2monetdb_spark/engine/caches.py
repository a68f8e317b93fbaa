"""Tracked intermediate caches: bounded registry + explicit release.

Several operators ``.cache()`` an intermediate relation that is consumed
more than once in the SAME returned plan (e.g. the MinHash per-doc
signature relation feeds the band join AND both verify joins). The cache
is correct and measured-faster — but Spark never drops it on its own: a
``.cache()`` entry (including its spilled disk blocks) lives in the
JVM's CacheManager until ``unpersist`` or session shutdown, and the
Python DataFrame object going out of scope does NOT release it. A
long-lived shared session running these operators over ever-changing
inputs (incremental batches, many corpora) therefore accumulates cache
entries without bound — memory is LRU-evicted, but the entry metadata
and on-disk blocks are not.

Operators route through :func:`tracked`; a long-running caller can drop
everything this package cached — and nothing the CALLER cached — with
:func:`release` between jobs. (The blunt alternative,
``spark.catalog.clearCache()``, destroys the caller's own cached
relations too.)

The registry is BOUNDED (:data:`capacity`, default 64): tracking past
capacity unpersists the oldest entry first. This keeps callers who never
call :func:`release` safe twice over: the JVM cache-entry count is
bounded, and so is the set of pinned Python→JVM Dataset handles. The
pinning matters: a registry holding strong references for an unbounded
run keeps every tracked Dataset's JVM plan tree alive (py4j frees a JVM
object only when its Python handle is collected) — a 960-execution
probe sweep on a default-heap session OOMed exactly this way before the
bound existed.

Unpersisting is always safe, eviction included: a plan that references
a released cache simply recomputes that subtree. Within one operator
build the tracked count stays far below capacity (the deepest user, the
label-propagation loop, tracks one relation per iteration), so eviction
never hits a cache during the build that created it.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
#: strong refs — the handle is what keeps the entry releasable after the
#: caller drops theirs; the capacity bound is what keeps that safe.
_TRACKED: list[DataFrame] = []

#: max registry entries; oldest are unpersisted on overflow.
#:
#: The budget is GLOBAL across threads and sessions (a module global,
#: matching the single-engine-per-process deployment this package
#: assumes): two concurrent long operator builds in one process — e.g.
#: parallel connected-components runs each tracking per-iteration caches
#: — share these 64 slots and can evict each other's still-hot entries,
#: silently degrading to recompute (correct, just slower). Concurrent
#: multi-build processes should raise ``capacity`` proportionally or
#: serialize cache-heavy builds.
capacity = 64


def _unpersist_quietly(df: DataFrame) -> bool:
    try:
        df.unpersist()
        return True
    except Exception:  # session already stopped — nothing left to free
        return False


def tracked(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register the handle for :func:`release`/eviction."""
    df.cache()
    evicted: list[DataFrame] = []
    with _LOCK:
        _TRACKED.append(df)
        while len(_TRACKED) > max(1, capacity):
            evicted.append(_TRACKED.pop(0))
    for old in evicted:
        _unpersist_quietly(old)
    return df


def release() -> int:
    """Unpersist every cache this package created; returns how many.

    Blocking=False: eviction proceeds asynchronously JVM-side.
    """
    with _LOCK:
        dfs, _TRACKED[:] = _TRACKED[:], []
    return sum(1 for df in dfs if _unpersist_quietly(df))


def tracked_count() -> int:
    with _LOCK:
        return len(_TRACKED)
