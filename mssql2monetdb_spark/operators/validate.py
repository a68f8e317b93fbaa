"""Row validation / quarantine splitting for ingest pipelines.

At 100 TB a load job cannot abort on the first malformed row, and silently
dropping rows is worse: the standard pattern is a rule-tagged split —
valid rows continue, failing rows land in a quarantine sink with the name
of the first rule they violated.

Single-pass design: the rule verdict is computed once as a column; the two
outputs are filters over the same plan (Spark evaluates the common subplan
per branch; persist() the tagged frame when both sides are consumed and the
upstream is expensive).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REASON_COL = "_reject_reason"


def tag_invalid(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Add ``_reject_reason``: name of the FIRST failing rule, else NULL.

    ``rules`` maps rule name -> boolean Column that is True for VALID rows.
    Iteration order of the dict defines precedence (first failure wins).
    A NULL rule verdict counts as a failure (three-valued logic guarded).
    """
    if not rules:
        raise ValueError("at least one validation rule is required")
    reason: Column = F.lit(None).cast("string")
    for name, cond in reversed(list(rules.items())):
        reason = F.when(~F.coalesce(cond, F.lit(False)), F.lit(name)).otherwise(reason)
    return df.withColumn(REASON_COL, reason)


def split_quarantine(df: DataFrame, rules: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined) — quarantined rows keep all columns plus
    ``_reject_reason``."""
    tagged = tag_invalid(df, rules)
    valid = tagged.filter(F.col(REASON_COL).isNull()).drop(REASON_COL)
    bad = tagged.filter(F.col(REASON_COL).isNotNull())
    return valid, bad
