"""As-of join — an operator Spark lacks natively, composed from existing
DataFrame ops (no Pandas UDF needed).

``asof_join(left, right, on, left_ts, right_ts)`` matches each left row with
the most recent right row (right_ts <= left_ts) per key — the time-series
"latest value as of" join (DuckDB/Polars ASOF JOIN, kdb aj).

Implementation is the scalable sort-merge formulation:

1. tag and union both sides (right first at equal timestamps => inclusive
   ``left_ts >= right_ts`` semantics, matching DuckDB ASOF);
2. one window over (key) ordered by (ts, side): ``last(right_payload,
   ignorenulls=True)`` carries the latest right row forward;
3. keep left rows.

Cost: ONE shuffle of left+right on the key and a single sort within
partitions — the same plan a native as-of join operator would produce. No
per-key loops, no broadcast requirement, skew behaves like any keyed window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    prefix: str = "matched_",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join.

    Every left row appears exactly once, augmented with ``prefix<col>`` for
    each right payload column. ``direction='backward'`` (default) matches
    the most recent right row with ``right_ts <= left_ts``; ``'forward'``
    matches the earliest right row with ``right_ts >= left_ts`` (NULL when
    none exists). Both are inclusive at equal timestamps, matching DuckDB's
    ASOF ``>=`` / ``<=`` semantics, and both cost the same single keyed
    shuffle + one window — forward just flips the carry direction
    (``first`` over the following frame instead of ``last`` over the
    preceding one).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    payload = F.struct(
        F.col(right_ts).alias(f"{prefix}{right_ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(payload.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("_l"))
            .schema["_l"]
            .dataType
        ).alias("_l"),
        payload.alias("_r"),
    )

    if direction == "backward":
        # right rows sort BEFORE left rows at equal _ts (side 0 < 1):
        # inclusive >=, latest preceding right carries forward
        w = (
            Window.partitionBy("_k")
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        match = F.last("_r", ignorenulls=True).over(w)
    else:
        # right rows sort AFTER left rows at equal _ts (desc side):
        # inclusive <=, earliest following right carries backward
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").asc(), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        match = F.first("_r", ignorenulls=True).over(w)
    carried = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_match", match)
        .filter(F.col("_side") == 1)
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    match_fields = [f"{prefix}{right_ts}"] + [f"{prefix}{c}" for c in right_cols]
    out_cols += [F.col(f"_match.{f}").alias(f) for f in match_fields]
    return carried.select(*out_cols)


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "matched_",
) -> DataFrame:
    """The cogrouped-pandas formulation of the backward as-of join:
    ``left.groupBy(key).cogroup(right.groupBy(key)).applyInPandas`` with a
    per-key ``pandas.merge_asof``. Same contract as :func:`asof_join`
    (backward, inclusive, one output row per left row).

    This exists to cover the co-grouped map operator — the one Arrow
    surface the UDF ladder doesn't otherwise touch — with the same oracle
    as the built-in composition, NOT to replace it: prefer
    :func:`asof_join` (pure JVM window) in pipelines; reach for cogroup
    only for per-key-pair logic DataFrame ops can't express.

    Scale shape: one shuffle of each side on the key (identical exchange
    count to the window form), then per-key Arrow batches — bounded by the
    largest single key's rows on both sides, so a pathologically hot key
    concentrates in one task (the window form spills instead; another
    reason it's the default). Ties on ``right_ts`` break to the LAST row
    after a mergesort on (ts, payload cols) — deterministic.
    """
    import pandas as pd

    from pyspark.sql.types import StructField, StructType

    rmap = {right_ts: f"{prefix}{right_ts}", **{c: f"{prefix}{c}" for c in right_cols}}
    out_right = [f"{prefix}{right_ts}"] + [f"{prefix}{c}" for c in right_cols]
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    schema = StructType(
        list(left.schema.fields)
        + [StructField(rmap[c], rtypes[c], True) for c in [right_ts] + right_cols]
    )
    out_names = [f.name for f in schema.fields]
    # pandas nullable dtypes so unmatched rows surface as NULL (not NaN)
    nullable = {"bigint": "Int64", "int": "Int32", "double": "Float64", "float": "Float32"}
    casts = {
        rmap[c]: nullable[rtypes[c].simpleString()]
        for c in [right_ts] + right_cols
        if rtypes[c].simpleString() in nullable
    }

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        l = l.sort_values(left_ts, kind="mergesort")
        r = r.rename(columns=rmap)[out_right].sort_values(out_right, kind="mergesort")
        out = pd.merge_asof(
            l, r, left_on=left_ts, right_on=f"{prefix}{right_ts}", direction="backward"
        )
        for col, dt in casts.items():
            out[col] = out[col].astype(dt)
        for col in out_right:
            if out[col].dtype == object:
                out[col] = out[col].where(out[col].notna(), None)
        return out[out_names]

    return left.groupBy(on).cogroup(right.groupBy(on)).applyInPandas(merge, schema=schema)
