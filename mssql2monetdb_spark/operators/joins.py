"""Join utilities for scale: salted joins for skewed keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; ``salted_join`` is the explicit fallback for pathological keys
(e.g. a null-heavy foreign key or a single hot entity owning >1% of a
100 TB fact table) where even split sub-partitions overwhelm one executor.

Mechanism: the big (skewed) side gets a deterministic salt in [0, n); the
small side is replicated n times (one copy per salt); the join key becomes
(key, salt), spreading each hot key over n reducers. Cost: n-fold
replication of the smaller side — choose n ~ (hot-key share x partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed.on == small.on`` with salt-based skew spreading.

    Result equals ``skewed.join(small, on, how)`` for inner/left joins.
    The salt on the skewed side is derived from xxhash64 of all columns —
    deterministic, uniform, no rand() (which would break retries/speculative
    execution).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)).cast("int")
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_big.join(replicated_small, [on, "_salt"], how)
    return out.drop("_salt")


def key_skew_report(
    df: DataFrame,
    key: str,
    *,
    top: int = 10,
) -> DataFrame:
    """Join-key skew diagnostics: the ``top`` heaviest keys with their row
    counts, share of the relation, and ratio to the mean key load —
    the pre-flight check that tells you whether a planned shuffle join
    needs salting (ratio >> partition count) or AQE will cope.

    One map-side-combined count per key + a one-row stats broadcast +
    TakeOrderedAndProject for the top slice — diagnostics never cost more
    than the aggregation they protect. All shares are single divisions of
    exact BIGINTs.
    """
    counts = df.groupBy(F.col(key).alias("key_value")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    stats = counts.agg(
        F.sum("n_rows").cast("bigint").alias("total_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "key_value",
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("total_rows")).alias("share"),
            (
                F.col("n_rows").cast("double")
                * F.col("n_keys").cast("double")
                / F.col("total_rows").cast("double")
            ).alias("skew_ratio"),
        )
        .orderBy(F.col("n_rows").desc(), "key_value")
        .limit(top)
    )
