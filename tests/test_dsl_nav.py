"""URL DSL round-trip tests (mirrors /root/reference/tests/test_url_builder.py:25-47)
and navigation algebra tests."""

import datetime as dt

import pytest

from bacon_spark import (
    CubeDef,
    CubeQuery,
    IntLabel,
    Label,
    Measure,
    MonthLabel,
    QueryError,
    Sum,
    YearLabel,
)
from bacon_spark.builders.url import UrlQueryBuilder
from bacon_spark.cubenav import Navigator
from bacon_spark.utils.strings import bslash_escape, bslash_split, bslash_unescape


@pytest.fixture()
def cubedef():
    cd = CubeDef("t")
    cd.add_label(Label("state"))
    cd.add_label(Label("city", child_of="state"))
    cd.add_label(YearLabel("year", "d"))
    cd.add_label(MonthLabel("month", "d", child_of="year"))
    cd.add_label(IntLabel("size"))
    cd.add_label(Label("status"))
    cd.add_measure(Measure("amount", acc=Sum()))
    cd.add_measure(Measure("units", acc=Sum()))
    return cd


@pytest.fixture()
def builder(cubedef):
    return UrlQueryBuilder(cubedef)


# --- escaping ---------------------------------------------------------------


def test_escape_roundtrip():
    for s in ["plain", "with/slash", "with:colon", "back\\slash", "a:/b\\:c", ""]:
        assert bslash_unescape(bslash_escape(s, "/:")) == s


def test_split_honors_escapes():
    assert bslash_split("a:b\\:c:d", ":") == ["a", "b\\:c", "d"]
    assert bslash_split("f:foo:bar\\/baz", "/") == ["f:foo:bar\\/baz"]


# --- parse ------------------------------------------------------------------


def test_parse_basic(builder):
    q = builder.parse("f:state:NY/a:month/v:amount/o:-amount")
    assert q.filters == (("state", "eq", "NY"),)
    assert q.axes == ("month",)
    assert q.values == ("amount",)
    assert q.order == (-1, "amount", ())


def test_parse_filter_forms(builder):
    q = builder.parse("f:size:gt:3")
    assert q.filters == (("size", "gt", 3),)
    q = builder.parse("f:state:in:NY:CA")
    assert q.filters == (("state", "in", frozenset({"NY", "CA"})),)
    q = builder.parse("f:month:ge:2023-04")
    assert q.filters == (("month", "ge", dt.date(2023, 4, 1)),)


def test_parse_escaped_value(builder):
    q = builder.parse("f:state:bar\\/baz")
    assert q.filters == (("state", "eq", "bar/baz"),)


def test_parse_pivot_and_hidden(builder):
    q = builder.parse("a:state/p:status/v:amount/hv:units")
    assert q.axes == ("state", "status")
    assert q.pivots == ("status",)
    assert q.visible_values == ("amount",)
    assert set(q.values) == {"amount", "units"}


def test_parse_unknown_command(builder):
    with pytest.raises(QueryError):
        builder.parse("zz:foo")


def test_parse_legacy_l_ignored(builder):
    q = builder.parse("a:state/l:10:20/v:amount")
    assert q.axes == ("state",)


# --- round-trip ---------------------------------------------------------------


@pytest.mark.parametrize(
    "s",
    [
        "f:state:NY/a:month/v:amount",
        "f:state:in:CA:NY/a:state/v:amount/o:-amount",
        "f:size:gt:3/a:state/p:status/v:amount/hv:units",
        "f:state:bar\\/baz/a:state/v:amount",
        "f:month:2023-04/a:month/v:amount",
    ],
)
def test_roundtrip(builder, s):
    q1 = builder.parse(s)
    out = builder.unparse(q1)
    q2 = builder.parse(out)
    assert q1 == q2


def test_unicode_roundtrip(builder):
    q1 = CubeQuery().add_filter("state", "eq", "København").add_axis("state").add_value("amount")
    assert builder.parse(builder.unparse(q1)) == q1


# --- navigation ---------------------------------------------------------------


def test_drill(cubedef):
    q = CubeQuery().add_axis("state").add_axis("month").add_value("amount")
    nav = Navigator(cubedef, q)
    q2 = nav.drill("state", "NY")
    assert q2.axes == ("month",)
    assert ("state", "eq", "NY") in q2.filters


def test_expand_hierarchy_rules(cubedef):
    q = CubeQuery().add_axis("year").add_value("amount")
    nav = Navigator(cubedef, q)
    assert nav.can_expand("month")  # child of year: chain
    assert nav.can_expand("state")  # different dimension
    q2 = nav.expand("month")
    assert q2.axes == ("year", "month")

    # a label whose dimension-mate is present but not chain-related
    cd2 = CubeDef("t2")
    cd2.add_label(Label("a"))
    cd2.add_label(Label("b", child_of="a"))
    cd2.add_label(Label("c", child_of="a"))
    nav2 = Navigator(cd2, CubeQuery().add_axis("b").add_value("amount"))
    assert not nav2.can_expand("c")  # siblings, not chain


def test_expand_rank_position(cubedef):
    # parent inserted before its child in the axes
    q = CubeQuery().add_axis("month").add_value("amount")
    nav = Navigator(cubedef, q)
    q2 = nav.expand("year")
    assert q2.axes == ("year", "month")


def test_invert_and_swap(cubedef):
    q = CubeQuery().add_filter("size", "gt", 3)
    nav = Navigator(cubedef, q)
    assert nav.invert_filter("size", "gt", 3).filters == (("size", "le", 3),)
    assert nav.swap_filter_op("size", "gt", 3, "ge").filters == (("size", "ge", 3),)
    with pytest.raises(QueryError):
        nav.swap_filter_op("size", "gt", 3, "match")


def test_hide_value_merges_ni(cubedef):
    q = CubeQuery().add_axis("state").add_value("amount")
    nav = Navigator(cubedef, q)
    q2 = nav.hide_value_of("state", "NY")
    assert q2.filters == (("state", "ni", frozenset({"NY"})),)
    q3 = Navigator(cubedef, q2).hide_value_of("state", "CA")
    assert q3.filters == (("state", "ni", frozenset({"NY", "CA"})),)


def test_remove_dimension_filters(cubedef):
    q = (
        CubeQuery()
        .add_filter("state", "eq", "NY")
        .add_filter("city", "eq", "NYC")
        .add_filter("size", "gt", 1)
    )
    nav = Navigator(cubedef, q)
    q2 = nav.remove_dimension_filters("city")  # city and state share a dimension
    assert q2.filters == (("size", "gt", 1),)


def test_row_detail(cubedef):
    q = CubeQuery().add_axis("state").add_value("amount").add_filter("size", "gt", 1)
    nav = Navigator(cubedef, q)
    q2 = nav.row_detail({"state": "NY"})
    assert q2.axes == ()
    assert set(q2.filters) == {("size", "gt", 1), ("state", "eq", "NY")}


def test_get_url(cubedef):
    from bacon_spark.builders.url import get_url

    q = CubeQuery().add_axis("state").add_value("amount").add_filter("state", "eq", "New York")
    url = get_url(q, cubedef, base_url="/cube", extra_params={"page": "10:0:"})
    assert url == "/cube?q=f:state:New+York/a:state/v:amount&page=10:0:"


def test_page_list():
    from bacon_spark.observers.tables import Page, page_list

    pages = page_list(Page(limit=10, offset=30, nrows=95), total=95)
    assert len(pages) == 10
    assert [p.offset for p in pages][:4] == [0, 10, 20, 30]
    assert page_list(Page(limit=None), total=95) == []
    assert page_list(Page(limit=50), total=40) == []


def test_events_cubedef(spark):
    from bacon_spark import CubeQuery, CuttingBoard
    from bacon_spark.sources.star import events_cubedef, read_table

    cd = events_cubedef()
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    board = CuttingBoard(cd, ev, cache_results=False)
    q = CubeQuery().add_axis("event_type").add_value("n").add_value("total_value")
    rows = board.slice(q).rows()
    assert rows and all(r["n"] > 0 for r in rows)
    q2 = CubeQuery().add_axis("prop_k").add_value("n").add_filter("event_type", "eq", "click")
    assert board.slice(q2).rows()
