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


def upsert_scd1(existing: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """Last-write-wins merge of ``incoming`` over ``existing`` on ``key``.

    Incoming rows replace same-key existing rows; unmatched existing rows
    pass through; brand-new keys append. Both inputs must share a schema.
    """
    kept = existing.join(
        F.broadcast(incoming.select(key).distinct()), key, "left_anti"
    )
    return kept.unionByName(incoming)
