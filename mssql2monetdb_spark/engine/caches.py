"""Tracked intermediate caches: release what operators cached.

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

This module makes those caches releasable without giving up the
within-plan reuse: operators route through :func:`tracked`, and a
long-running caller drops everything this package cached — and nothing
the CALLER cached — with :func:`release` between jobs. (The blunt
alternative, ``spark.catalog.clearCache()``, destroys the caller's own
cached relations too.)

Unpersisting is always safe: a returned-but-unexecuted plan that
references a released cache simply recomputes that subtree.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
#: strong refs on purpose — the JVM cache entry exists regardless; holding
#: the handle is what keeps it releasable after the caller drops theirs.
_TRACKED: list[DataFrame] = []


def tracked(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register the handle for a later :func:`release`."""
    df.cache()
    with _LOCK:
        _TRACKED.append(df)
    return df


def release() -> int:
    """Unpersist every cache this package created; returns how many.

    Blocking=False: eviction proceeds asynchronously JVM-side. DataFrames
    whose session has already stopped are skipped silently.
    """
    with _LOCK:
        dfs, _TRACKED[:] = _TRACKED[:], []
    released = 0
    for df in dfs:
        try:
            df.unpersist()
            released += 1
        except Exception:  # session already stopped — nothing left to free
            pass
    return released


def tracked_count() -> int:
    with _LOCK:
        return len(_TRACKED)
