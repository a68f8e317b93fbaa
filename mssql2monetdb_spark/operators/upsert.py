"""SCD-1 upsert: apply an incoming batch over a keyed table.

The reference synchronizes by full reload (CopyTool.java 4-phase pipeline);
the incremental-sync generalization every warehouse target wants is
last-write-wins merge. Parquet has no MERGE statement, so the idiomatic
Spark shape is anti-join + union:

    merged = incoming UNION ALL (existing ANTI JOIN incoming ON key)

Scale shape: the incoming batch is small relative to the table, so the
anti join BROADCASTS the incoming keys — the existing table is scanned
once and never shuffled, and the output is written as a new version
through the versioned catalog (engine/publish.py), keeping the swap
atomic exactly like a full reload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert_scd1(
    existing: DataFrame,
    incoming: DataFrame,
    key: str,
    *,
    order_col: str | None = None,
) -> DataFrame:
    """Last-write-wins merge of ``incoming`` over ``existing`` on ``key``.

    Incoming rows replace same-key existing rows; unmatched existing rows
    pass through; brand-new keys append. Both inputs must share a schema.

    When the batch itself can carry several rows for one key, pass
    ``order_col``: the batch is first collapsed to one row per key (highest
    ``order_col`` wins, so last-write-wins holds WITHIN the batch too).
    Without ``order_col`` the caller must guarantee at most one row per key
    in ``incoming`` — duplicate keys would otherwise all survive the merge.
    The collapse is a window over the (small) batch only; the existing
    table still never shuffles.
    """
    if order_col is not None:
        w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
        incoming = (
            incoming.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    kept = existing.join(
        F.broadcast(incoming.select(key).distinct()), key, "left_anti"
    )
    # A USING-style join hoists the key column to the front; reselect the
    # original order so every published version of a table carries the
    # SAME schema regardless of whether it went through the merge path.
    return kept.select(*existing.columns).unionByName(incoming)


def upsert_scd2(
    existing: DataFrame,
    incoming: DataFrame,
    key: str,
    tracked: list[str],
) -> DataFrame:
    """SCD type-2 merge: apply ``incoming`` (one row per ``key``; columns
    ``key`` + ``tracked``) over a versioned history table (columns ``key``
    + ``tracked`` + ``version INT`` + ``is_current BOOLEAN``).

    Semantics per incoming row:

    - key unknown            -> append ``(version=0, is_current=true)``;
    - tracked values unchanged (null-safe compare) -> no-op;
    - tracked values changed -> close the current row
      (``is_current=false``) and append ``version+1`` as current.

    Closed history rows always pass through untouched, so the table is
    append-only in effect — exactly the property that lets the versioned
    catalog (engine/publish.py) publish it like any other snapshot.

    Scale shape: the batch is small, so the change-detection join
    BROADCASTS ``incoming`` against only the ``is_current`` slice; closed
    history is scanned once and never shuffled. The one shuffled step is
    the new-key anti join, which exchanges just the dimension's key column
    — at 100 TB the history table is a dimension (orders of magnitude
    smaller than facts), so this stays cheap.
    """
    attrs = [key, *tracked]
    inc = incoming.select(*attrs)
    cur = existing.filter(F.col("is_current"))
    closed_hist = existing.filter(~F.col("is_current"))

    changed_cond = None
    for c in tracked:
        d = ~(F.col(f"c.{c}").eqNullSafe(F.col(f"i.{c}")))
        changed_cond = d if changed_cond is None else (changed_cond | d)

    # "matched" must be key-presence, not attr-presence (attrs can be null),
    # so the join probes a non-null presence marker.
    inc_marked = inc.withColumn("_present", F.lit(True))
    j = cur.alias("c").join(F.broadcast(inc_marked.alias("i")), key, "left")
    matched = F.col("i._present").isNotNull()
    is_changed = matched & changed_cond

    carried = j.filter(~is_changed).select("c.*")
    closed_now = j.filter(is_changed).select("c.*").withColumn(
        "is_current", F.lit(False)
    )
    bumped = j.filter(is_changed).select(
        F.col(key),
        *[F.col(f"i.{c}").alias(c) for c in tracked],
        (F.col("c.version") + 1).cast("int").alias("version"),
        F.lit(True).alias("is_current"),
    )
    fresh = inc.join(cur.select(key), key, "left_anti").select(
        F.col(key),
        *tracked,
        F.lit(0).cast("int").alias("version"),
        F.lit(True).alias("is_current"),
    )
    out_cols = [key, *tracked, "version", "is_current"]
    return (
        closed_hist.select(*out_cols)
        .unionByName(carried.select(*out_cols))
        .unionByName(closed_now.select(*out_cols))
        .unionByName(bumped.select(*out_cols))
        .unionByName(fresh.select(*out_cols))
    )
