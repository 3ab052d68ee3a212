"""Ordered-funnel and cohort-retention analytics.

Two classic event-analytics operators the reference's cube surface can't
express (they need per-user ORDERED event logic, not per-row labels):

* :func:`funnel` — how many users complete step1 → step2 → … IN ORDER,
  each step within *horizon* of the previous one. The implementation is
  a conditional-min chain: step i's timestamp is the earliest qualifying
  event AFTER the user's step-(i-1) timestamp, which makes each user's
  path the lexicographically earliest valid completion (the standard
  "first touch" funnel definition — deterministic, replayable in SQL).

* :func:`cohort_retention` — users bucketed by first-seen period
  (cohort), activity counted per (cohort, period offset): the retention
  triangle.

Scale shape (100 TB of events): everything keys on the user column.
``funnel`` repartitions events by user ONCE and each step is a groupBy
on that same key — Spark reuses the existing hash partitioning, so the
chain costs one full shuffle of (user, type, ts) triples plus
result-sized (one row per user) joins back, regardless of step count.
``cohort_retention`` is two user-keyed aggregations (first-seen, then
distinct activity periods). Neither ever materializes per-user event
arrays; state per user is one timestamp per funnel step.

Reference analogue: none — engine extension (SURVEY §2 'beyond the
reference': event analytics a training-data/product pipeline needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    horizon: str = "7 days",
) -> DataFrame:
    """Per-step completion counts for the ordered *steps* funnel.

    Returns one row per step: (step, step_name, users, pct_of_entry) —
    users whose step-i event exists after their step-(i-1) event and
    within *horizon* of it; pct_of_entry is users/step-1-users rounded
    to 6 dp (both engines compute the same integer division).
    """
    ev = events.select(user_col, type_col, ts_col).repartition(F.col(user_col))
    cur = ev.groupBy(user_col).agg(
        F.min(F.when(F.col(type_col) == steps[0], F.col(ts_col))).alias("t0")
    )
    for i, st in enumerate(steps[1:], 1):
        prev = f"t{i - 1}"
        joined = ev.join(cur, user_col)
        carry = [F.min(f"t{j}").alias(f"t{j}") for j in range(i)]
        cond = (
            (F.col(type_col) == st)
            & (F.col(ts_col) >= F.col(prev))
            & (F.col(ts_col) <= F.col(prev) + F.expr(f"INTERVAL {horizon}"))
        )
        cur = joined.groupBy(user_col).agg(
            *carry, F.min(F.when(cond, F.col(ts_col))).alias(f"t{i}")
        )
    counts = cur.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    rows = None
    for i, st in enumerate(steps):
        row = counts.select(
            F.lit(i + 1).cast("int").alias("step"),
            F.lit(st).alias("step_name"),
            F.col(f"n{i}").cast("long").alias("users"),
            F.round(F.col(f"n{i}") / F.col("n0"), 6).alias("pct_of_entry"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


def funnel_sql(
    table: str = "events",
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    horizon: str = "7 days",
) -> str:
    """DuckDB twin of :func:`funnel` (same conditional-min chain)."""
    ctes = [
        f"""s0 AS (
      SELECT {user_col}, min(CASE WHEN {type_col} = '{steps[0]}' THEN {ts_col} END) AS t0
      FROM {table} GROUP BY 1
    )"""
    ]
    for i, st in enumerate(steps[1:], 1):
        carry = ", ".join(f"min(s{i - 1}.t{j}) AS t{j}" for j in range(i))
        ctes.append(
            f"""s{i} AS (
      SELECT e.{user_col}, {carry},
             min(CASE WHEN e.{type_col} = '{st}'
                       AND e.{ts_col} >= s{i - 1}.t{i - 1}
                       AND e.{ts_col} <= s{i - 1}.t{i - 1} + INTERVAL {horizon}
                      THEN e.{ts_col} END) AS t{i}
      FROM {table} e JOIN s{i - 1} ON e.{user_col} = s{i - 1}.{user_col}
      GROUP BY 1
    )"""
        )
    n = len(steps)
    counts = ", ".join(f"count(t{i}) AS n{i}" for i in range(n))
    selects = " UNION ALL ".join(
        f"""SELECT cast({i + 1} as int) AS step, '{st}' AS step_name,
               cast(n{i} as bigint) AS users,
               round(n{i} / n0, 6) AS pct_of_entry FROM c"""
        for i, st in enumerate(steps)
    )
    return f"""
    WITH {", ".join(ctes)},
    c AS (SELECT {counts} FROM s{n - 1})
    {selects}
    """


_PERIODS = ("day", "week", "month", "quarter", "year")


def _offset_expr(period: str) -> "F.Column":
    """Period offset between the truncated ``_period`` and ``_cohort``
    columns, in units of *period*. Both inputs are already
    ``date_trunc(period, ...)`` boundaries, so month-based arithmetic is
    exact (``months_between`` of two month starts is an integer)."""
    if period == "day":
        return F.datediff(F.col("_period"), F.col("_cohort"))
    if period == "week":
        return (F.datediff(F.col("_period"), F.col("_cohort")) / 7).cast("int")
    months = F.months_between(F.col("_period"), F.col("_cohort"))
    if period == "month":
        return months.cast("int")
    if period == "quarter":
        return (months / 3).cast("int")
    if period == "year":
        return (months / 12).cast("int")
    raise ValueError(f"period must be one of {_PERIODS}, got {period!r}")


def _offset_sql(period: str) -> str:
    """DuckDB twin of :func:`_offset_expr` (same unit arithmetic)."""
    if period == "day":
        return "datediff('day', f._cohort, a._period)"
    if period == "week":
        return "datediff('day', f._cohort, a._period) / 7"
    if period == "month":
        return "datediff('month', f._cohort, a._period)"
    if period == "quarter":
        return "datediff('month', f._cohort, a._period) / 3"
    if period == "year":
        return "datediff('month', f._cohort, a._period) / 12"
    raise ValueError(f"period must be one of {_PERIODS}, got {period!r}")


def cohort_retention(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    period: str = "week",
) -> DataFrame:
    """The retention triangle: (cohort_period, period_offset,
    active_users, retained_pct) — users bucketed by FIRST-SEEN *period*,
    activity counted as distinct users per (cohort, offset), retained
    pct relative to the cohort's size (offset 0)."""
    firsts = events.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("_cohort")
    )
    activity = (
        events.select(
            user_col, F.date_trunc(period, F.col(ts_col)).alias("_period")
        )
        .distinct()
        .join(firsts, user_col)
        .select(
            user_col,
            F.date_format("_cohort", "yyyy-MM-dd").alias("cohort_period"),
            _offset_expr(period).cast("int").alias("period_offset"),
        )
        .distinct()
    )
    per = activity.groupBy("cohort_period", "period_offset").agg(
        F.countDistinct(user_col).alias("active_users")
    )
    size = per.where(F.col("period_offset") == 0).select(
        "cohort_period", F.col("active_users").alias("_cohort_size")
    )
    return (
        per.join(size, "cohort_period")
        .select(
            "cohort_period",
            "period_offset",
            F.col("active_users").cast("long").alias("active_users"),
            F.round(F.col("active_users") / F.col("_cohort_size"), 6).alias(
                "retained_pct"
            ),
        )
    )


def cohort_retention_sql(
    table: str = "events",
    ts_col: str = "ts",
    user_col: str = "user_id",
    period: str = "week",
) -> str:
    """DuckDB twin of :func:`cohort_retention`."""
    return f"""
    WITH firsts AS (
      SELECT {user_col}, date_trunc('{period}', min({ts_col})) AS _cohort
      FROM {table} GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT a.{user_col},
             strftime(f._cohort, '%Y-%m-%d') AS cohort_period,
             cast({_offset_sql(period)} as int) AS period_offset
      FROM (SELECT DISTINCT {user_col}, date_trunc('{period}', {ts_col}) AS _period
            FROM {table}) a
      JOIN firsts f USING ({user_col})
    ),
    per AS (
      SELECT cohort_period, period_offset,
             count(DISTINCT {user_col})::BIGINT AS active_users
      FROM activity GROUP BY 1, 2
    )
    SELECT p.cohort_period AS cohort_period, p.period_offset AS period_offset,
           p.active_users AS active_users,
           round(p.active_users / s.active_users, 6) AS retained_pct
    FROM per p JOIN (SELECT cohort_period, active_users FROM per
                     WHERE period_offset = 0) s USING (cohort_period)
    """
