"""Reference-semantics pinning: null handling in filters, accumulator edge
cases (golden values from /root/reference/tests/test_accumulators.py),
date-label family, hierarchy DAG behavior."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from bacon_spark import (
    BoolLabel,
    CubeDef,
    CubeQuery,
    CuttingBoard,
    DayLabel,
    Label,
    Measure,
    MonthLabel,
    NullableLabel,
    QuarterLabel,
    QueryError,
    StdDev,
    Sum,
    WeekdayLabel,
    WeekLabel,
    YearLabel,
)
from bacon_spark.filters import build_predicate


# --- filter null semantics (reference: plain python operators over values,
# /root/reference/bacon/cutting.py:776-870) --------------------------------


@pytest.fixture(scope="module")
def nullable_df(spark):
    rows = [("a",), ("b",), (None,)]
    return spark.createDataFrame(rows, "x string")


def _matching(df, op, value):
    pred = build_predicate(F.col("x"), op, value)
    return {r["x"] for r in df.filter(pred).collect()}


def test_eq_none_matches_null(nullable_df):
    assert _matching(nullable_df, "eq", None) == {None}


def test_ne_passes_nulls(nullable_df):
    # Python None != 'a' is True -> null rows PASS ne filters
    assert _matching(nullable_df, "ne", "a") == {"b", None}
    assert _matching(nullable_df, "ne", None) == {"a", "b"}


def test_in_with_none(nullable_df):
    assert _matching(nullable_df, "in", frozenset({"a", None})) == {"a", None}
    assert _matching(nullable_df, "in", frozenset({"a"})) == {"a"}


def test_ni_semantics(nullable_df):
    # None not in {'a'} is True in Python -> nulls pass
    assert _matching(nullable_df, "ni", frozenset({"a"})) == {"b", None}
    # but ni over a set containing None excludes nulls
    assert _matching(nullable_df, "ni", frozenset({"a", None})) == {"b"}


def test_match_nmatch_null_safe(nullable_df):
    assert _matching(nullable_df, "match", "a") == {"a"}
    # null never matches -> nmatch passes nulls
    assert _matching(nullable_df, "nmatch", "a") == {"b", None}


@pytest.fixture(scope="module")
def set_df(spark):
    rows = [
        (1, ["a", "b"]),
        (2, ["b"]),
        (3, []),
        (4, None),
        (5, ["a", "b", "c"]),
        (6, ["", "a"]),  # '' is discarded by make_set
    ]
    return spark.createDataFrame(rows, "id long, tags array<string>")


def _ids(df, op, value):
    pred = build_predicate(F.col("tags"), op, value)
    return {r["id"] for r in df.filter(pred).collect()}


def test_set_ops_null_empty_conflation(set_df):
    # null column and [] behave identically (make_set,
    # /root/reference/bacon/cutting.py:788-796)
    assert _ids(set_df, "hasany", frozenset({"a"})) == {1, 5, 6}
    assert _ids(set_df, "hasnone", frozenset({"a"})) == {2, 3, 4}
    assert _ids(set_df, "hasall", frozenset({"a", "b"})) == {1, 5}
    # empty literal set: hasall(∅) is vacuously true everywhere
    assert _ids(set_df, "hasall", frozenset()) == {1, 2, 3, 4, 5, 6}
    assert _ids(set_df, "hasonly", frozenset({"a"})) == {6}  # '' dropped
    assert _ids(set_df, "subsetof", frozenset({"a", "b"})) == {1, 2, 3, 4, 6}
    assert _ids(set_df, "notsubsetof", frozenset({"a", "b"})) == {5}
    assert _ids(set_df, "disjointfrom", frozenset({"c"})) == {1, 2, 3, 4, 6}
    assert _ids(set_df, "equals", frozenset({"a", "b"})) == {1}
    assert _ids(set_df, "notequals", frozenset({"a", "b"})) == {2, 3, 4, 5, 6}


# --- accumulator golden values (reference
# /root/reference/tests/test_accumulators.py:10-48) -------------------------


def test_stddev_welford_golden(spark):
    # reference golden: stddev of 2,4,4,4,5,5,7,9 -> sqrt(32/7) sample form
    rows = [(float(v),) for v in [2, 4, 4, 4, 5, 5, 7, 9]]
    df = spark.createDataFrame(rows, "v double")
    cd = CubeDef("t")
    cd.add_measure(Measure("sd", "v", acc=StdDev()))
    out = CuttingBoard(cd, df, cache_results=False).slice(CubeQuery().add_value("sd"))
    assert out.record["sd"] == pytest.approx(math.sqrt(32 / 7))


def test_sum_first_value_none_preserved(spark):
    # reference Sum: acc starts at first value even if None; all-null -> None
    rows = [(None,), (None,)]
    df = spark.createDataFrame(rows, "v double")
    cd = CubeDef("t")
    cd.add_measure(Measure("s", "v", acc=Sum()))
    out = CuttingBoard(cd, df, cache_results=False).slice(CubeQuery().add_value("s"))
    assert out.record["s"] is None


# --- date label family -------------------------------------------------------


def test_date_labels_columns(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 2, 29, 14, 30),)], "ts timestamp"
    )
    labels = {
        "y": YearLabel("y", "ts"),
        "m": MonthLabel("m", "ts"),
        "q": QuarterLabel("q", "ts"),
        "w": WeekLabel("w", "ts"),
        "d": DayLabel("d", "ts"),
        "dow": WeekdayLabel("dow", "ts"),
    }
    row = df.select(*[lab.column().alias(k) for k, lab in labels.items()]).head()
    assert row["y"] == dt.date(2024, 1, 1)
    assert row["m"] == dt.date(2024, 2, 1)
    assert row["q"] == dt.date(2024, 1, 1)
    assert row["w"] == dt.date(2024, 2, 26)  # Monday
    assert row["d"] == dt.date(2024, 2, 29)
    assert row["dow"] == 4  # Thursday, ISO numbering


def test_relative_date_parse_injected_today():
    today = lambda: dt.date(2024, 3, 15)  # noqa: E731
    m = MonthLabel("m", "ts", today=today)
    assert m.parse("-6") == dt.date(2023, 9, 1)
    assert m.parse("+1") == dt.date(2024, 4, 1)
    assert m.parse("2024-01") == dt.date(2024, 1, 1)
    w = WeekLabel("w", "ts", today=today)
    assert w.parse("-2") == dt.date(2024, 2, 26)  # two Mondays back from 03-11
    d = DayLabel("d", "ts", today=today)
    assert d.parse("-1") == dt.date(2024, 3, 14)
    q = QuarterLabel("q", "ts", today=today)
    assert q.parse("-1") == dt.date(2023, 10, 1)


def test_label_parse_unparse_roundtrip():
    m = MonthLabel("m", "ts")
    assert m.unparse(m.parse("2023-07")) == "2023-07"
    b = BoolLabel("b")
    assert b.parse("1") is True and b.parse("0") is False and b.parse("") is None
    assert b.pretty(True) == "Yes" and b.pretty(None) == "Unknown"
    n = NullableLabel("n")
    assert n.parse("") is None and n.unparse(None) == ""
    assert n.pretty(None) == "(none)"


# --- hierarchy DAG (reference /root/reference/tests/test_cubedef.py:9-116) --


def test_hierarchy_dag():
    cd = CubeDef("t")
    cd.add_label(Label("year"))
    cd.add_label(Label("month", child_of="year"))
    cd.add_label(Label("day", child_of="month"))
    cd.add_label(Label("week", child_of="year"))
    cd.add_hierarchy("day", "week")
    assert cd.ancestors("day") == {"month", "week", "year"}
    assert cd.descendants("year") == {"month", "week", "day"}
    assert cd.same_dimension("day", "year")
    # ranks drive drill ordering: parents before children
    assert cd.get_label("year").rank < cd.get_label("month").rank
    assert cd.get_label("month").rank < cd.get_label("day").rank


def test_hierarchy_cycle_rejected():
    cd = CubeDef("t")
    cd.add_label(Label("a"))
    cd.add_label(Label("b", child_of="a"))
    with pytest.raises(QueryError):
        cd.add_hierarchy("a", "b")


def test_ratio_measure_per_record_sign_correction(spark):
    # reference AttributeRatioMeasure.extract: num/|den|, null on null/zero
    # denominator (/root/reference/bacon/cubedef.py:1098-1119)
    from bacon_spark import RatioMeasure

    rows = [(10.0, 2.0), (10.0, -2.0), (10.0, 0.0), (None, 2.0), (10.0, None)]
    df = spark.createDataFrame(rows, "num double, den double")
    m = RatioMeasure("r", "num", "den")
    out = [r["r"] for r in df.select(m.column().alias("r")).collect()]
    assert out == [5.0, 5.0, None, None, None]


def test_json_label(spark):
    from bacon_spark import JsonLabel

    df = spark.createDataFrame([('{"k": 42, "s": "x"}',)], "props string")
    lab = JsonLabel("k", "props", "$.k", cast="int")
    assert df.select(lab.column().alias("k")).head()["k"] == 42
    assert "get_json_object" in lab.sql_expr()
