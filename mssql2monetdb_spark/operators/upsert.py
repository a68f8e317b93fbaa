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
    return kept.unionByName(incoming)
