"""Ordered funnel + cohort retention (operators/funnel.py): the ORDER
and HORIZON semantics on constructed users, and the retention triangle's
offset arithmetic."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bacon_spark.operators.funnel import cohort_retention, cohort_retention_sql, funnel

SCHEMA = "user_id long, event_type string, ts timestamp"
T0 = dt.datetime(2024, 1, 1)


def _t(**kw):
    return T0 + dt.timedelta(**kw)


def test_funnel_order_and_horizon_semantics(spark):
    rows = [
        # u1 completes in order within horizon
        (1, "view", _t(hours=0)), (1, "click", _t(hours=1)), (1, "purchase", _t(hours=2)),
        # u2: click BEFORE view — click must not count (order violated)
        (2, "click", _t(hours=0)), (2, "view", _t(hours=1)),
        # u3: click 8 days after view — outside the 7-day horizon
        (3, "view", _t(hours=0)), (3, "click", _t(days=8)),
        # u4: view+click ok, purchase before click — purchase must not count
        (4, "view", _t(hours=0)), (4, "purchase", _t(minutes=30)), (4, "click", _t(hours=1)),
        # u5: never views; click/purchase alone enter nothing
        (5, "click", _t(hours=0)), (5, "purchase", _t(hours=1)),
        # u6: completes, with the QUALIFYING click being the second one
        (6, "view", _t(hours=5)), (6, "click", _t(hours=1)),
        (6, "click", _t(hours=6)), (6, "purchase", _t(hours=7)),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["step_name"]: r for r in funnel(df).collect()}
    assert got["view"]["users"] == 5  # u1,u3,u4,u6 + u2 (views at hour 1)
    assert got["click"]["users"] == 3  # u1, u4, u6 (u2 order, u3 horizon)
    assert got["purchase"]["users"] == 2  # u1, u6 (u4's purchase pre-click)
    assert got["purchase"]["pct_of_entry"] == 0.4
    # steps are monotone by construction
    assert got["view"]["users"] >= got["click"]["users"] >= got["purchase"]["users"]


def test_funnel_partitioning_invariant(spark):
    rows = [
        (u, t, _t(hours=u % 5 + i))
        for u in range(40)
        for i, t in enumerate(("view", "click", "purchase"))
        if (u + i) % 3 != 0
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(map(tuple, funnel(df).collect()))
    b = sorted(map(tuple, funnel(df.repartition(13)).collect()))
    assert a == b


def test_cohort_retention_offsets(spark):
    rows = [
        # u1 first seen week of Jan 1 (Monday), active weeks 0 and 2
        (1, "view", _t(days=2)), (1, "view", _t(days=15)),
        # u2 same cohort, active week 0 only
        (2, "view", _t(days=3)),
        # u3 next week's cohort, active weeks 0 and 1
        (3, "view", _t(days=8)), (3, "view", _t(days=14)),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["cohort_period"], r["period_offset"]): (r["active_users"], r["retained_pct"])
        for r in cohort_retention(df).collect()
    }
    assert got[("2024-01-01", 0)] == (2, 1.0)
    assert got[("2024-01-01", 2)] == (1, 0.5)
    assert got[("2024-01-08", 0)] == (1, 1.0)
    assert got[("2024-01-08", 1)] == (1, 1.0)
    assert ("2024-01-01", 1) not in got  # nobody from cohort 1 active week 1


def test_cohort_retention_period_units(spark):
    """ADVICE r6: offsets must be computed in the PERIOD's unit — a
    monthly cohort active the next calendar month is offset 1 whatever
    the month's day count (the old datediff/7 gave Jan->Feb offset 4)."""
    rows = [
        (1, "view", dt.datetime(2024, 1, 5)),
        (1, "view", dt.datetime(2024, 2, 20)),   # next month -> offset 1
        (1, "view", dt.datetime(2024, 12, 1)),   # offset 11
        (2, "view", dt.datetime(2024, 3, 31)),
        (2, "view", dt.datetime(2024, 4, 1)),    # next month despite 1 day apart
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["cohort_period"], r["period_offset"]): r["active_users"]
        for r in cohort_retention(df, period="month").collect()
    }
    assert got[("2024-01-01", 0)] == 1
    assert got[("2024-01-01", 1)] == 1
    assert got[("2024-01-01", 11)] == 1
    assert got[("2024-03-01", 0)] == 1
    assert got[("2024-03-01", 1)] == 1
    # daily: consecutive days are offsets 0 and 1
    drows = [(7, "view", dt.datetime(2024, 1, 1, 23)), (7, "view", dt.datetime(2024, 1, 2, 1))]
    dgot = {
        r["period_offset"] for r in cohort_retention(
            spark.createDataFrame(drows, SCHEMA), period="day"
        ).collect()
    }
    assert dgot == {0, 1}
    with pytest.raises(ValueError, match="period"):
        cohort_retention(df, period="fortnight").collect()
    with pytest.raises(ValueError, match="period"):
        cohort_retention_sql(period="fortnight")


def test_cohort_retention_month_matches_oracle(spark):
    """The Spark plan and the DuckDB twin agree per period unit."""
    import duckdb
    import pandas as pd

    rows = [
        (u, "view", dt.datetime(2024, 1 + (u + i) % 11, 1 + (u * 7 + i * 3) % 27))
        for u in range(30)
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    for period in ("day", "week", "month", "quarter", "year"):
        got = sorted(map(tuple, cohort_retention(df, period=period).collect()))
        con = duckdb.connect()
        con.register("events", pd.DataFrame(rows, columns=["user_id", "event_type", "ts"]))
        want = sorted(map(tuple, con.execute(cohort_retention_sql(period=period)).fetchall()))
        con.close()
        assert got == want, period
