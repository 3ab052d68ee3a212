"""Table renderer tests: Table1D, TablePivot, totals, pagination
(reference semantics from /root/reference/bacon/observers/tables.py)."""

import pytest

from bacon_spark import (
    Average,
    Count,
    CubeDef,
    CubeQuery,
    CuttingBoard,
    Label,
    Measure,
    StdDev,
    Sum,
)
from bacon_spark.observers.tables import Page, Table1D, TablePivot


@pytest.fixture(scope="module")
def board(spark):
    rows = [
        ("NY", "open", 10, 1.0),
        ("NY", "closed", 20, 2.0),
        ("CA", "open", 5, 3.0),
        ("CA", "closed", 15, 4.0),
        ("TX", "open", 7, 5.0),
    ]
    df = spark.createDataFrame(rows, "state string, status string, units long, price double")
    cd = CubeDef("sales")
    cd.add_label(Label("state"))
    cd.add_label(Label("status"))
    cd.add_measure(Measure("units", acc=Sum()))
    cd.add_measure(Measure("n", "units", acc=Count()))
    cd.add_measure(Measure("avg_price", "price", acc=Average()))
    cd.add_measure(Measure("sd_price", "price", acc=StdDev()))
    return CuttingBoard(cd, df, cache_results=False)


def test_table1d_rows_and_totals(board):
    q = CubeQuery().add_axis("state").add_value("units").add_value("n")
    t = Table1D(board, q)
    assert t.nrows == 3
    rows = t.rows()
    assert [r["state"] for r in rows] == ["CA", "NY", "TX"]  # axis sort
    assert rows[0]["units"] == 20
    totals = t.totals()
    assert totals == {"units": 57, "n": 5}


def test_table1d_stddev_total_is_null(board):
    q = CubeQuery().add_axis("state").add_value("sd_price")
    t = Table1D(board, q)
    assert t.totals()["sd_price"] is None  # reference merge -> Inconsistent


def test_table1d_pagination(board):
    q = CubeQuery().add_axis("state").add_value("units")
    t = Table1D(board, q, page=Page(limit=2, offset=1, nrows=3))
    rows = t.rows()
    assert [r["state"] for r in rows] == ["NY", "TX"]
    # stale nrows -> offset resets
    t2 = Table1D(board, q, page=Page(limit=2, offset=2, nrows=99))
    assert [r["state"] for r in t2.rows()] == ["CA", "NY"]


def test_page_parse_unparse():
    p = Page.parse("10:20:300")
    assert (p.limit, p.offset, p.nrows) == (10, 20, 300)
    assert p.unparse() == "10:20:300"
    assert Page.parse("").limit is None
    assert Page.parse("5").unparse() == "5:0:"


def test_pivot_table(board):
    q = (
        CubeQuery()
        .add_axis("state")
        .add_axis("status")
        .add_value("units")
        .set_pivot("status")
    )
    t = TablePivot(board, q)
    assert t.columns == [("closed",), ("open",)]  # pivot label key order
    assert t.rows() == [("CA",), ("NY",), ("TX",)]
    assert t.cell(("NY",), ("open",))["units"] == 10
    assert t.cell(("TX",), ("closed",)) is None  # missing cell
    assert t.row_total(("NY",))["units"] == 30
    assert t.col_total(("open",))["units"] == 22
    assert t.grand_total()["units"] == 57


def test_pivot_order_by_measure_in_column(board):
    q = (
        CubeQuery()
        .add_axis("state")
        .add_axis("status")
        .add_value("units")
        .set_pivot("status")
        .set_order("units", descending=True, pivot_values=("open",))
    )
    t = TablePivot(board, q)
    # sorted by units within the 'open' column group: NY=10, TX=7, CA=5
    assert t.rows() == [("NY",), ("TX",), ("CA",)]


def test_average_total_counts_all_rows(board):
    q = CubeQuery().add_axis("state").add_value("avg_price")
    t = Table1D(board, q)
    assert t.totals()["avg_price"] == pytest.approx(3.0)  # 15/5


def test_render_table_1d_html(board):
    from html.parser import HTMLParser

    from bacon_spark.builders.url import UrlQueryBuilder
    from bacon_spark.observers.html import render_table_html

    q = CubeQuery().add_axis("state").add_value("units")
    html = render_table_html(Table1D(board, q))

    class Check(HTMLParser):
        rows = 0
        links = []

        def handle_starttag(self, tag, attrs):
            d = dict(attrs)
            if tag == "tr" and "values" in (d.get("class") or ""):
                Check.rows += 1
            if tag == "a" and d.get("href"):
                Check.links.append(d["href"])

    Check().feed(html)
    assert Check.rows == 3
    assert 'class="bacon bacon-values"' in html
    assert '<tr class="totals">' in html and ">57<" in html  # 10+20+5+15+7

    # drill link on a label cell round-trips through the DSL parser
    builder = UrlQueryBuilder(board.cubedef)
    drills = [h[1:] for h in Check.links if "f:state" in h]
    assert drills
    q2 = builder.parse(drills[0])
    assert ("state", "eq", "CA") in q2.filters or ("state", "eq", "NY") in q2.filters


def test_render_pivot_html(board):
    from bacon_spark.observers.html import render_table_html

    q = (
        CubeQuery().add_axis("state").add_axis("status")
        .add_value("units").set_pivot("status")
    )
    html = render_table_html(TablePivot(board, q))
    assert 'class="bacon bacon-pivot"' in html
    assert '<tr class="pivot">' in html
    assert ">Total</th>" in html
    # grand total 57 appears in the totals band
    assert ">57<" in html
