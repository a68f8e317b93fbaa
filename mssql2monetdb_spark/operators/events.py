"""Event-sequence analytics over the events stream: ordered funnel
conversion, first-seen retention cohorts, gap-based sessionization, and
event-type transition counts.

Reference parity: the reference delegates event analytics to SQL on the
target warehouse (SURVEY.md §2B conditional-aggregate / window rows); these
are the canonical event-sequence shapes its users run, re-expressed as
keyed relational chains.

All operators are user-keyed end to end — every join, window, and
aggregate shuffles on ``user_id``, so at 100 TB the work distributes by
user with no global sort and no driver-side state. Within a user, events
are totally ordered by ``(ts, event_id)`` (event_id is unique), so every
window result is deterministic across both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import parallelized

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WITHIN_S = 86400  # max seconds between consecutive funnel steps

SESSION_GAP_S = 1800  # idle gap that closes a session (30 min)


def funnel_stages(
    events: DataFrame,
    steps: tuple[str, str, str] = FUNNEL_STEPS,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    *,
    within_s: int = FUNNEL_WITHIN_S,
) -> DataFrame:
    """Strictly-ordered three-step funnel per user: the earliest step-1
    event, the earliest step-2 event after it within ``within_s`` seconds,
    and the earliest step-3 event after that within the same window.
    ``stage`` counts completed steps (1..3); users who never performed
    step 1 are outside the funnel.

    Three user-keyed aggregates chained by two user-keyed joins — each
    stage's candidate events are filtered *before* the aggregate, so the
    per-user state is one timestamp per stage. The window compare is exact
    integer-microsecond interval arithmetic in both engines.
    """
    e = parallelized(events).select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("etype"),
        F.col(ts_col).alias("ts"),
    )
    step_interval = F.expr(f"INTERVAL {within_s} SECONDS")
    s1 = (
        e.filter(F.col("etype") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_step1"))
    )
    s2 = (
        e.filter(F.col("etype") == steps[1])
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t_step1"))
            & (F.col("ts") <= F.col("t_step1") + step_interval)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_step2"))
    )
    s3 = (
        e.filter(F.col("etype") == steps[2])
        .join(s2, "user_id")
        .filter(
            (F.col("ts") > F.col("t_step2"))
            & (F.col("ts") <= F.col("t_step2") + step_interval)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_step3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "t_step1",
            "t_step2",
            "t_step3",
            (
                F.lit(1)
                + F.col("t_step2").isNotNull().cast("int")
                + F.col("t_step3").isNotNull().cast("int")
            ).alias("stage"),
        )
    )


def funnel_stages_sql(
    table: str,
    steps: tuple[str, str, str] = FUNNEL_STEPS,
    ts_expr: str = "ts",
    user_expr: str = "user_id",
    type_expr: str = "event_type",
    *,
    within_s: int = FUNNEL_WITHIN_S,
) -> str:
    """DuckDB query matching :func:`funnel_stages`."""
    return f"""
        WITH e AS (
            SELECT {user_expr} AS user_id, {type_expr} AS etype, {ts_expr} AS ts
            FROM {table}
        ),
        s1 AS (
            SELECT user_id, MIN(ts) AS t_step1 FROM e
            WHERE etype = '{steps[0]}' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t_step2
            FROM e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.etype = '{steps[1]}' AND e.ts > s1.t_step1
              AND e.ts <= s1.t_step1 + INTERVAL {within_s} SECOND
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t_step3
            FROM e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.etype = '{steps[2]}' AND e.ts > s2.t_step2
              AND e.ts <= s2.t_step2 + INTERVAL {within_s} SECOND
            GROUP BY e.user_id
        )
        SELECT s1.user_id, s1.t_step1, s2.t_step2, s3.t_step3,
               CAST(1 + CASE WHEN s2.t_step2 IS NULL THEN 0 ELSE 1 END
                      + CASE WHEN s3.t_step3 IS NULL THEN 0 ELSE 1 END
                    AS INTEGER) AS stage
        FROM s1
        LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
    """


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Day-cohort retention: users grouped by their first-seen day, counted
    as active on each later day they produced any event.

    Output: (cohort_day, day_offset, n_users). Two user-keyed aggregates
    (first-seen day, distinct active days) joined on the user — the result
    is cohorts x offsets, constant-sized relative to the corpus. The offset
    is an all-integer date difference, exact cross-engine.
    """
    e = parallelized(events).select(
        F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts")
    )
    first = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    active = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("active_day")
    ).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("active_day").cast("date"), F.col("cohort_day").cast("date"))
            .cast("int")
            .alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )


def retention_cohorts_sql(
    table: str,
    ts_expr: str = "ts",
    user_expr: str = "user_id",
) -> str:
    """DuckDB query matching :func:`retention_cohorts`."""
    return f"""
        WITH e AS (
            SELECT {user_expr} AS user_id, {ts_expr} AS ts FROM {table}
        ),
        first_seen AS (
            SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day
            FROM e GROUP BY user_id
        ),
        active AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day FROM e
        )
        SELECT f.cohort_day,
               CAST(date_diff('day', CAST(f.cohort_day AS DATE),
                              CAST(a.active_day AS DATE)) AS INTEGER) AS day_offset,
               CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
        FROM active a JOIN first_seen f ON a.user_id = f.user_id
        GROUP BY f.cohort_day, day_offset
    """


def sessionize(
    events: DataFrame,
    *,
    gap_s: int = SESSION_GAP_S,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: a user's events ordered by
    ``(ts, event_id)`` are split into sessions wherever the idle time
    STRICTLY exceeds ``gap_s`` seconds (an exactly-``gap_s`` pause stays in
    the same session). Output one row per session: ``(user_id, session_no,
    session_start, session_end, n_events, duration_us)``.

    Two user-keyed windows (lag + running sum of boundary flags) followed
    by one user-keyed aggregate — a single shuffle on ``user_id``, no
    global sort. This is the batch counterpart of the streaming
    ``session_window`` (streaming/pipelines.py): same gap semantics, but
    expressed over the closed corpus where late data cannot exist. The gap
    compare and duration use exact integer epoch-microseconds, so both
    engines agree bit-for-bit.

    No ``parallelized()`` (round 11): trivial projection straight into
    the user-keyed window Exchange — the round-robin repartition would
    shuffle the full stream twice (see graph.py:user_transition_edges).
    """
    e = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.col(ts_col).alias("ts"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) > gap_s * 1_000_000, 1
        )
        .otherwise(0)
        .cast("int"),
    ).withColumn("session_no", F.sum("new_session").over(run).cast("int"))
    return flagged.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).cast("bigint").alias("duration_us"),
    )


def sessionize_sql(
    table: str,
    *,
    gap_s: int = SESSION_GAP_S,
    ts_expr: str = "ts",
    user_expr: str = "user_id",
    id_expr: str = "event_id",
) -> str:
    """DuckDB query matching :func:`sessionize`."""
    return f"""
        WITH e AS (
            SELECT {user_expr} AS user_id, {id_expr} AS event_id,
                   {ts_expr} AS ts, epoch_us({ts_expr}) AS ts_us
            FROM {table}
        ),
        flagged AS (
            SELECT *,
                   CAST(CASE WHEN ts_us - lag(ts_us) OVER w > {gap_s * 1_000_000}
                             THEN 1 ELSE 0 END AS INTEGER) AS new_session
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
            SELECT *,
                   CAST(SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS INTEGER) AS session_no
            FROM flagged
        )
        SELECT user_id, session_no,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS duration_us
        FROM numbered GROUP BY user_id, session_no
    """


def transition_matrix(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition counts between consecutive event types
    within each user's ``(ts, event_id)``-ordered stream: ``(prev_type,
    next_type, n_transitions, p_transition)`` where ``p`` is row-normalized
    over the source type.

    One user-keyed window (lag) + one small aggregate keyed on the type
    pair — the pair space is |types|² regardless of corpus size, so the
    second shuffle is constant-sized at 100 TB. ``p_transition`` is a
    single exact-integer division, deterministic cross-engine.

    No ``parallelized()`` (round 11): trivial projection straight into
    the user-keyed window Exchange (same rationale as sessionize).
    """
    e = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("prev_type", F.lag("etype").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type"), F.col("etype").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )
    totals = Window.partitionBy("prev_type")
    return pairs.withColumn(
        "p_transition",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(totals).cast("double")
        ),
    )


def transition_matrix_sql(
    table: str,
    *,
    ts_expr: str = "ts",
    user_expr: str = "user_id",
    id_expr: str = "event_id",
    type_expr: str = "event_type",
) -> str:
    """DuckDB query matching :func:`transition_matrix`."""
    return f"""
        WITH e AS (
            SELECT {user_expr} AS user_id, {id_expr} AS event_id,
                   {ts_expr} AS ts, {type_expr} AS etype
            FROM {table}
        ),
        pairs AS (
            SELECT prev_type, etype AS next_type,
                   CAST(COUNT(*) AS BIGINT) AS n_transitions
            FROM (
                SELECT etype,
                       lag(etype) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           AS prev_type
                FROM e
            )
            WHERE prev_type IS NOT NULL
            GROUP BY prev_type, next_type
        )
        SELECT prev_type, next_type, n_transitions,
               CAST(n_transitions AS DOUBLE)
                   / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type) AS DOUBLE)
                   AS p_transition
        FROM pairs
    """


SESSION_BUCKET_S = 86400  # coarse pre-bucket for the bounded variant (1 day)


def sessionize_bounded(
    events: DataFrame,
    *,
    gap_s: int = SESSION_GAP_S,
    bucket_s: int = SESSION_BUCKET_S,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Hot-key-bounded sessionization: identical output to
    :func:`sessionize`, but no task ever sorts a user's ENTIRE history.

    Per-user windows cannot be split by AQE (skew handling applies to
    joins, not window sorts), so plain sessionization's worst case is one
    task materializing a hot key's full event stream — the documented
    cliff once a single user holds >= ~1/cores of the corpus (SCALE.md
    key-skew probe). This operator is the mitigation SCALE.md promised:

    1. **Time-range pre-bucketing.** Events bucket by
       ``floor(ts_us / bucket_us)`` and sessionize within ``(user_id,
       bucket)`` — the only event-sized window keys on a pair whose
       cardinality grows with the hot user's time span, so the hot key
       parallelizes across buckets (pick ``bucket_s`` down to ``gap_s``
       for maximal splitting).
    2. **Boundary merge.** With ``bucket_s >= gap_s``, events two or
       more buckets apart are ``> bucket_us >= gap_us`` apart, so only
       ADJACENT buckets can merge. The per-bucket sessions then
       chain-merge in one per-user ordered pass: consecutive sessions
       merge iff ``next.start - prev.end <= gap`` — same-bucket
       neighbors never re-merge (the in-bucket split already proved
       their gap exceeds ``gap_s``), adjacent-bucket neighbors merge
       exactly when plain sessionization would, and a session spanning
       whole buckets chains through transitively. Sessions within one
       bucket are ``> gap_s`` apart, so this pass sees at most
       ``bucket_s/gap_s + 1`` rows per (user, bucket) — per-user window
       state is O(time-span / gap), INDEPENDENT of event count.

    The chain running-sum is itself the dense per-user session ordinal
    (first session flags 0, each true split adds 1), so ``session_no``
    falls out of the merge pass — no extra renumbering window. All
    comparisons are exact integer epoch-microseconds — bit-identical to
    :func:`sessionize` and to the DuckDB oracle by construction
    (property-tested equal on organic + adversarial data).
    """
    if bucket_s < gap_s:
        raise ValueError(
            f"bucket_s ({bucket_s}) must be >= gap_s ({gap_s}): coarser buckets "
            "are what confine session merges to adjacent buckets"
        )
    gap_us = gap_s * 1_000_000
    bucket_us = bucket_s * 1_000_000

    # no parallelized(): trivial projection straight into the
    # (user, bucket)-keyed window Exchange (round 11, see sessionize)
    e = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.col(ts_col).alias("ts"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
    )
    # ts_us can predate the epoch in principle; subtract the non-negative
    # pmod remainder and `div` the exact multiple — floor division done
    # entirely on BIGINT, exact for any ts_us (a double-division floor
    # would lose integer precision past 2^53; the algebra tolerates any
    # monotone bucketing, but there is no reason to rely on that)
    e = e.withColumn(
        "bucket",
        F.expr(f"(ts_us - pmod(ts_us, {bucket_us}L)) div {bucket_us}L"),
    )

    # 1. in-bucket sessionization — the only event-sized window, keyed on
    # (user_id, bucket) so a hot user's history splits across buckets
    w = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = e.withColumn(
        "new_session",
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > gap_us, 1)
        .otherwise(0)
        .cast("int"),
    ).withColumn("local_no", F.sum("new_session").over(run).cast("int"))
    sess = flagged.groupBy("user_id", "bucket", "local_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
    )

    # 2. chain-merge across buckets: one per-user ordered pass over
    # SESSION rows (disjoint intervals — start_us is unique per user and
    # at most bucket_s/gap_s + 1 rows exist per bucket). The running sum
    # of split flags doubles as the dense session ordinal.
    cw = Window.partitionBy("user_id").orderBy("start_us")
    crun = cw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        sess.withColumn(
            "new_chain",
            F.when(F.col("start_us") - F.lag("end_us").over(cw) > gap_us, 1)
            .otherwise(0)
            .cast("int"),
        )
        .withColumn("session_no", F.sum("new_chain").over(crun).cast("int"))
        .groupBy("user_id", "session_no")
        .agg(
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            (F.max("end_us") - F.min("start_us")).cast("bigint").alias("duration_us"),
        )
        .select(
            "user_id",
            "session_no",
            "session_start",
            "session_end",
            "n_events",
            "duration_us",
        )
    )


# -- time-series gap fill (hourly grid + LOCF) ------------------------------


def gap_fill_hourly(events: DataFrame) -> DataFrame:
    """Dense hourly series per event type with last-observation-carried-
    forward for silent hours — the time-series normalization every
    downstream rollup/anomaly job assumes (a gap read as "0" instead of
    "no sample" poisons rate baselines).

    Shape: one hash aggregate to (type, hour); the full grid is
    types × hours built from ONE min/max row crossed with the distinct
    type set (both broadcast — the grid is metadata-sized at any event
    volume); LOCF is the portable two-window trick (running non-null
    COUNT names the carry group, MAX over the group materializes the
    carried value — no IGNORE NULLS dependence, identical semantics on
    both engines). Windows partition by event type and span only the
    hour grid, so state is bounded by the time range, never by event
    count. Sums go through DECIMAL(30,8) (exact for 2-decimal values,
    headroom to 1e22 — the hostile edge corpus carries 1e18 values).
    """
    # no parallelized(): the (type, hour) groupBy's own Exchange is the
    # next operator — a round-robin pre-shuffle would move the full
    # stream twice; partial aggregation happens in the scan task either
    # way (round 11, see sessionize)
    hourly = (
        events
        .groupBy(
            F.col("event_type"),
            F.date_trunc("hour", F.col("ts")).alias("hr"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,8)")).alias("sum_value_dec"),
        )
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = (
        events.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hr"),
        )
    )
    joined = grid.join(hourly, ["event_type", "hr"], "left")
    w_ord = Window.partitionBy("event_type").orderBy("hr")
    grp = F.count("sum_value_dec").over(w_ord)  # running non-null count
    w_grp = Window.partitionBy("event_type", grp)
    carried = F.max("sum_value_dec").over(w_grp)
    return (
        joined.select(
            "event_type",
            "hr",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
            F.col("sum_value_dec").isNull().alias("filled"),
            F.coalesce(carried, F.lit(0).cast("decimal(30,8)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("event_type", "hr")
    )


def gap_fill_hourly_sql(table: str) -> str:
    """DuckDB query matching :func:`gap_fill_hourly` step-for-step."""
    return f"""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   SUM(CAST(value AS DECIMAL(30,8))) AS sum_value_dec
            FROM {table} GROUP BY event_type, date_trunc('hour', ts)
        ), bounds AS (
            SELECT date_trunc('hour', MIN(ts)) AS lo,
                   date_trunc('hour', MAX(ts)) AS hi
            FROM {table}
        ), grid AS (
            SELECT t.event_type, g.hr
            FROM (SELECT DISTINCT event_type FROM {table}) t
            CROSS JOIN (
                SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
                FROM bounds
            ) g
        ), joined AS (
            SELECT g.event_type, g.hr, h.n_events, h.sum_value_dec
            FROM grid g LEFT JOIN hourly h
              ON g.event_type = h.event_type AND g.hr = h.hr
        ), grouped AS (
            SELECT *,
                   COUNT(sum_value_dec) OVER (
                       PARTITION BY event_type ORDER BY hr
                   ) AS grp
            FROM joined
        )
        SELECT event_type, hr,
               CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
               sum_value_dec IS NULL AS filled,
               CAST(COALESCE(
                   MAX(sum_value_dec) OVER (PARTITION BY event_type, grp),
                   0
               ) AS DOUBLE) AS sum_value
        FROM grouped
        ORDER BY event_type, hr
    """


def ewma_per_user(
    events: DataFrame, *, alpha: float = 0.3, value_col: str = "value"
) -> DataFrame:
    """Per-user exponentially-weighted moving average of the event value —
    the sequential recurrence ``s_i = α·x_i + (1-α)·s_{i-1}`` that
    built-in window frames cannot express (every prefix depends on the
    full ordered history with position-dependent weights; the closed-form
    running-sum trick divides by ``(1-α)^i`` and overflows beyond ~1e4
    events). The honest distributed shape is ``applyInPandas``: one
    shuffle keyed on user_id, then a vectorized pandas ``ewm`` per group
    — group state bounded by that user's history, Arrow-batched, never
    row-at-a-time Python.

    Returns (user_id, event_id, ts, value, ewma) ordered within each
    group by (ts, event_id). Utility operator (pytest-pinned against
    pandas.ewm directly); no oracle gate because the recurrence's float
    products are not reproducible cross-engine at the last ulp.
    """
    import pandas as pd

    out_schema = (
        "user_id bigint, event_id bigint, ts timestamp, value double, ewma double"
    )

    def _ewma(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts", "event_id"])
        pdf["ewma"] = pdf["value"].ewm(alpha=alpha, adjust=False).mean()
        return pdf[["user_id", "event_id", "ts", "value", "ewma"]]

    return (
        events.select("user_id", "event_id", "ts", F.col(value_col).alias("value"))
        .groupBy("user_id")
        .applyInPandas(_ewma, schema=out_schema)
    )
