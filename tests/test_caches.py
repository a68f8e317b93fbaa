"""Tracked-cache registry: operators' intermediate caches are releasable.

Operator ``.cache()`` calls route through ``engine.caches.tracked`` so a
long-lived session can free every JVM cache entry this package created
(``caches.release()``) without touching the caller's own cached
relations — the leak class where cache metadata and spilled disk blocks
accumulate until session shutdown.
"""

from __future__ import annotations

from mssql2monetdb_spark.engine import caches
from mssql2monetdb_spark.queries.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_operator_caches_are_tracked_and_released(spark):
    caches.release()  # isolate from earlier tests
    assert caches.tracked_count() == 0

    REGISTRY["dedup_minhash_lsh"].build(spark, SF).collect()
    n_tracked = caches.tracked_count()
    assert n_tracked > 0

    released = caches.release()
    assert released == n_tracked
    assert caches.tracked_count() == 0


def test_release_does_not_touch_caller_caches(spark):
    caller_df = spark.range(100).toDF("caller_col")
    caller_df.cache()
    caller_df.count()
    try:
        REGISTRY["dedup_ngram_jaccard"].build(spark, SF).collect()
        caches.release()
        assert caller_df.storageLevel.useMemory, (
            "release() must not unpersist relations the caller cached"
        )
    finally:
        caller_df.unpersist()


def test_eviction_bounds_registry_and_unpersists_oldest(spark):
    """Past capacity the oldest entry is unpersisted — a long-lived caller
    who never calls release() still gets bounded cache accumulation AND a
    bounded set of pinned JVM plan handles (an unbounded strong-ref
    registry OOMed a 960-execution probe sweep)."""
    caches.release()
    old_cap = caches.capacity
    caches.capacity = 2
    try:
        dfs = [spark.range(i, i + 10).toDF(f"c{i}") for i in range(3)]
        for df in dfs:
            caches.tracked(df)
            df.count()
        assert caches.tracked_count() == 2
        assert not dfs[0].storageLevel.useMemory, "oldest should be evicted"
        assert dfs[2].storageLevel.useMemory
    finally:
        caches.capacity = old_cap
        caches.release()


def test_release_is_idempotent_and_result_correct(spark):
    """Releasing mid-lifecycle is safe: an unexecuted plan recomputes."""
    q = REGISTRY["dedup_minhash_lsh"]
    expected = [tuple(r) for r in q.build(spark, SF).collect()]
    caches.release()

    df = q.build(spark, SF)  # build (registers caches) ...
    caches.release()  # ... release BEFORE execution
    assert [tuple(r) for r in df.collect()] == expected
    assert caches.release() == 0


def test_load_table_memoizes_resolution_and_invalidates_on_rewrite(spark, tmp_path):
    """Base-table resolution is memoized per (app, path, stat fingerprint):
    the second load returns the SAME DataFrame object (no repeated schema
    inference), and rewriting the file invalidates the entry."""
    import os
    import time

    from mssql2monetdb_spark import catalog

    path = str(tmp_path / "region.parquet")
    spark.range(3).selectExpr(
        "cast(id as bigint) as r_regionkey",
        "concat('R', id) as r_name",
        "'c' as r_comment",
    ).coalesce(1).write.mode("overwrite").parquet(path)

    a = catalog.load_table(spark, str(tmp_path), "region")
    b = catalog.load_table(spark, str(tmp_path), "region")
    assert a is b, "same path + same stat fingerprint must hit the memo"
    assert a.count() == 3

    time.sleep(0.05)  # ensure the directory mtime_ns moves
    spark.range(5).selectExpr(
        "cast(id as bigint) as r_regionkey",
        "concat('R', id) as r_name",
        "'c' as r_comment",
    ).coalesce(1).write.mode("overwrite").parquet(path)
    os.utime(path)  # force a new stat fingerprint even on coarse clocks
    c = catalog.load_table(spark, str(tmp_path), "region")
    assert c is not a, "rewritten fixture must invalidate the memo"
    assert c.count() == 5
