"""Event-sequence analytics over the events stream: ordered funnel
conversion and first-seen retention cohorts.

Reference parity: the reference delegates event analytics to SQL on the
target warehouse (SURVEY.md §2B conditional-aggregate / window rows); these
are the two canonical event-sequence shapes its users run, re-expressed as
keyed relational chains.

Both operators are user-keyed end to end — every join and aggregate
shuffles on ``user_id``, so at 100 TB the work distributes by user with no
global sort and no driver-side state. Ties on timestamps are excluded by
strict inequality (deterministic in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import parallelized

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WITHIN_S = 86400  # max seconds between consecutive funnel steps


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
