"""Event-sequence operators: funnel analysis over an event log.

A funnel is ordered-step matching per user — first qualifying event
of step N must land within a bounded gap after the user's step-N−1
time. The implementation is pure joins + min-aggregations (one
shuffle per step, each on ``user_id``), NOT a per-user Python loop:
every step's candidate set shrinks monotonically, and each join key
is the already-aggregated (one row per user) previous stage, so AQE
can broadcast the later, smaller stages against the event log.

Reference parity: no sequence analytics exists in the reference
(SURVEY §2.7); north-star event-pipeline addition over the driver's
``events`` table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[tuple[str, str | None]],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel stage times.

    ``steps`` is an ordered list of ``(event_type, max_gap)`` where
    ``max_gap`` (an SQL interval string like ``"3 days"``; None for
    the first step) bounds how long after the previous stage's time
    the step may occur. Returns one row per user who completed step 0
    with nullable ``ts_0..ts_{n-1}`` columns: the FIRST qualifying
    time of each completed stage, null from the first missed stage on.
    """
    if not steps or steps[0][1] is not None:
        raise ValueError("steps[0] must be (event_type, None)")
    missing = [i for i, (_, gap) in enumerate(steps[1:], start=1) if gap is None]
    if missing:  # else: opaque INTERVAL-parse error deep in the plan
        raise ValueError(
            f"steps[{missing[0]}] needs a max_gap interval string "
            f"(only the first step takes None)"
        )
    first_type = steps[0][0]
    cur = (
        events.where(F.col(type_col) == first_type)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("ts_0"))
    )
    for i, (etype, gap) in enumerate(steps[1:], start=1):
        prev = f"ts_{i - 1}"
        nxt = events.where(F.col(type_col) == etype).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_t")
        )
        stage = (
            nxt.join(
                cur.where(F.col(prev).isNotNull()).select(user_col, prev),
                (F.col("_u") == F.col(user_col))
                & (F.col("_t") >= F.col(prev))
                & (F.col("_t") <= F.col(prev) + F.expr(f"INTERVAL {gap}")),
            )
            .groupBy("_u")
            .agg(F.min("_t").alias(f"ts_{i}"))
        )
        cur = cur.join(
            stage, cur[user_col] == stage["_u"], "left"
        ).drop("_u")
    return cur


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Weekly retention matrix: users are cohorted by the ISO week of
    their FIRST event; each (cohort_week, week_offset) cell counts the
    distinct cohort members active that week.

    Two hash aggregations (first-event per user, then distinct users
    per cell) plus one join keyed on ``user_id`` — the same key both
    shuffles use, so the join itself is co-partitioned. Exact distinct
    counts; at extreme cardinality the swap to approx_count_distinct
    is one expression.
    Returns (cohort_week, week_offset, n_active_users).
    """
    week = lambda c: F.date_trunc("week", c)  # noqa: E731 — Monday-start, UTC session
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("first_ts"))
    cohorted = events.join(first, user_col).select(
        user_col,
        week("first_ts").alias("cohort_wk"),
        week(F.col(ts_col)).alias("active_wk"),
    )
    return (
        cohorted.groupBy("cohort_wk", "active_wk")
        .agg(F.countDistinct(user_col).alias("n_active_users"))
        .select(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("active_wk", "cohort_wk") / 7).cast("long").alias("week_offset"),
            "n_active_users",
        )
    )
