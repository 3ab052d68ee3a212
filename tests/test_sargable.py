"""Sargability rewrite: filters on truncating date labels add the implied
raw-column bound (reference /root/reference/bacon/cubedef.py:728-741 adds
``base >= v`` beside ``date_trunc(...) >= v`` for Postgres index use; here
the bound reaches parquet PushedFilters for row-group skipping).

Covers: the rewrite fires for every trunc label and comparison op, the
extra predicate never changes results, periodic part labels (weekday,
month-of-year) are untouched, and the SQL pushdown backend emits the same
redundant predicate.
"""

import datetime as dt

import pytest

from bacon_spark import (
    CubeDef,
    CubeQuery,
    CuttingBoard,
    Measure,
    MonthLabel,
    WeekLabel,
    YearLabel,
)
from bacon_spark.accumulators import Count
from bacon_spark.cubedef import (
    DayLabel,
    HourLabel,
    MonthOfYearLabel,
    QuarterLabel,
    WeekdayLabel,
)
from bacon_spark.sql import SqlCuttingBoard, sargable_extra_sql


@pytest.fixture(scope="module")
def orders_cd():
    cd = CubeDef("orders")
    cd.add_label(YearLabel("order_year", "o_orderdate"))
    cd.add_label(QuarterLabel("order_quarter", "o_orderdate"))
    cd.add_label(MonthLabel("order_month", "o_orderdate"))
    cd.add_label(WeekLabel("order_week", "o_orderdate"))
    cd.add_label(DayLabel("order_day", "o_orderdate"))
    cd.add_label(HourLabel("order_hour", "o_orderdate"))
    cd.add_label(MonthOfYearLabel("order_monthnum", "o_orderdate"))
    cd.add_label(WeekdayLabel("order_weekday", "o_orderdate"))
    cd.add_measure(Measure("n", "o_orderkey", acc=Count()))
    return cd


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def _pushed(df) -> str:
    # the plan's PushedFilters list is elided with "..." past ~100 chars, so
    # slice a fixed window rather than seeking the closing bracket
    ex = df._jdf.queryExecution().toString()
    i = ex.find("PushedFilters")
    assert i >= 0, "no PushedFilters section in plan"
    return ex[i : i + 400]


def _slice_df(cd, orders, label, op, value):
    q = CubeQuery().add_axis(label).add_value("n").add_filter(label, op, value)
    return CuttingBoard(cd, orders, cache_results=False).slice(q).to_df()


@pytest.mark.parametrize(
    "label,value",
    [
        ("order_year", dt.date(1996, 1, 1)),
        ("order_quarter", dt.date(1996, 4, 1)),
        ("order_month", dt.date(1996, 3, 1)),
        ("order_week", dt.date(1996, 3, 4)),
        ("order_hour", dt.datetime(1996, 3, 1, 12)),
    ],
)
def test_trunc_filters_reach_pushed_filters(orders_cd, orders, label, value):
    for op, want in [
        ("ge", "GreaterThanOrEqual(o_orderdate"),
        ("gt", "GreaterThanOrEqual(o_orderdate"),  # gt rewrites to >= next boundary
        ("le", "LessThan(o_orderdate"),
        ("lt", "LessThan(o_orderdate"),
        ("eq", "GreaterThanOrEqual(o_orderdate"),
    ]:
        pushed = _pushed(_slice_df(orders_cd, orders, label, op, value))
        assert want in pushed, f"{label} {op}: {pushed}"
    # eq also carries the upper bound
    pushed = _pushed(_slice_df(orders_cd, orders, label, "eq", value))
    assert "LessThan(o_orderdate" in pushed


@pytest.mark.parametrize("op", ["ge", "gt", "le", "lt", "eq"])
def test_rewrite_preserves_results(orders_cd, orders, spark, op):
    """The redundant bound is implied by the label predicate: results with
    the rewrite equal a manual plan without it."""
    v = dt.date(1996, 3, 1)
    got = {
        (r["order_month"], r["n"])
        for r in _slice_df(orders_cd, orders, "order_month", op, v).collect()
    }
    sym = {"ge": ">=", "gt": ">", "le": "<=", "lt": "<", "eq": "="}[op]
    manual = {
        (r["m"], r["n"])
        for r in orders.selectExpr("cast(date_trunc('month', o_orderdate) as date) as m")
        .filter(f"m {sym} date'1996-03-01'")
        .groupBy("m")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert got == manual


def test_periodic_labels_get_no_rewrite(orders_cd):
    # month-of-year / weekday constrain no contiguous base range
    assert orders_cd.get_label("order_monthnum").sargable_extra("ge", 3) is None
    assert orders_cd.get_label("order_weekday").sargable_extra("eq", 2) is None


def test_next_boundaries():
    cd = CubeDef("t")
    cases = [
        (YearLabel("y", "d"), dt.date(1996, 1, 1), dt.date(1997, 1, 1)),
        (QuarterLabel("q", "d"), dt.date(1996, 10, 1), dt.date(1997, 1, 1)),
        (MonthLabel("m", "d"), dt.date(1996, 12, 1), dt.date(1997, 1, 1)),
        (MonthLabel("m2", "d"), dt.date(1996, 5, 1), dt.date(1996, 6, 1)),
        (WeekLabel("w", "d"), dt.date(1996, 3, 4), dt.date(1996, 3, 11)),
        (DayLabel("dy", "d"), dt.date(1996, 2, 28), dt.date(1996, 2, 29)),
        (
            HourLabel("h", "d"),
            dt.datetime(1996, 3, 1, 23),
            dt.datetime(1996, 3, 2, 0),
        ),
    ]
    for label, v, want in cases:
        cd.add_label(label)
        assert label._next_boundary(v) == want, label.name


def test_sql_backend_emits_redundant_predicate(orders_cd, orders, spark):
    orders.createOrReplaceTempView("orders_sarg")
    b = SqlCuttingBoard(orders_cd, spark, "orders_sarg")
    q = (
        CubeQuery()
        .add_axis("order_month")
        .add_value("n")
        .add_filter("order_month", "eq", dt.date(1996, 3, 1))
    )
    sql = b.compile(q)
    assert "o_orderdate >= DATE '1996-03-01'" in sql
    assert "o_orderdate < DATE '1996-04-01'" in sql
    # and it still runs correctly
    rows = b.df(q).collect()
    assert len(rows) == 1 and rows[0]["n"] > 0


def test_sargable_extra_sql_ops(orders_cd):
    lab = orders_cd.get_label("order_month")
    v = dt.date(1996, 3, 1)
    assert sargable_extra_sql(lab, "ge", v) == "o_orderdate >= DATE '1996-03-01'"
    assert sargable_extra_sql(lab, "gt", v) == "o_orderdate >= DATE '1996-04-01'"
    assert sargable_extra_sql(lab, "lt", v) == "o_orderdate < DATE '1996-04-01'"
    assert sargable_extra_sql(lab, "in", frozenset({v})) is None  # only scalar ops
    assert sargable_extra_sql(lab, "eq", None) is None
