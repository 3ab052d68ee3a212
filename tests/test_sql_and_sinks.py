"""SQL pushdown backend + CSV/JSON sink tests."""

import datetime as dt
import io

import pytest

from bacon_spark import (
    Count,
    CubeDef,
    CubeQuery,
    CuttingBoard,
    Label,
    Measure,
    MonthLabel,
    Sum,
)
from bacon_spark.observers.csv import render_csv
from bacon_spark.observers.json import render_table_json
from bacon_spark.observers.tables import Table1D, TablePivot
from bacon_spark.sql import SqlCuttingBoard, sql_filter


@pytest.fixture(scope="module")
def sales(spark):
    rows = [
        (dt.date(2024, 1, 5), "NY", "open", 10),
        (dt.date(2024, 1, 9), "NY", "closed", 20),
        (dt.date(2024, 2, 2), "CA", "open", 5),
    ]
    df = spark.createDataFrame(rows, "d date, state string, status string, units long")
    df.createOrReplaceTempView("sales")
    return df


@pytest.fixture(scope="module")
def cubedef():
    cd = CubeDef("sales")
    cd.add_label(MonthLabel("month", "d"))
    cd.add_label(Label("state"))
    cd.add_label(Label("status"))
    cd.add_measure(Measure("units", acc=Sum()))
    cd.add_measure(Measure("n", "units", acc=Count()))
    return cd


def test_sql_board_matches_dataframe_board(spark, sales, cubedef):
    q = (
        CubeQuery()
        .add_axis("month")
        .add_axis("state")
        .add_value("units")
        .add_value("n")
        .add_filter("status", "eq", "open")
    )
    sql_board = SqlCuttingBoard(cubedef, spark, "sales")
    df_board = CuttingBoard(cubedef, sales, cache_results=False)
    got = {tuple(r) for r in sql_board.df(q).collect()}
    want = {tuple(r) for r in df_board.slice(q).to_df().collect()}
    assert got == want and got


def test_sql_compile_text(spark, cubedef):
    q = (
        CubeQuery()
        .add_axis("month")
        .add_value("units")
        .add_filter("state", "in", frozenset({"NY", "CA"}))
        .set_order("units", descending=True)
    )
    sql = SqlCuttingBoard(cubedef, spark, "sales").compile(q)
    # group by the EXPRESSION, not the alias — strict engines (Derby,
    # tests/test_jdbc.py) resolve GROUP BY identifiers against the base
    # table, so `GROUP BY month` would fail there for a computed label
    assert "GROUP BY cast(date_trunc('month', d) as date)" in sql
    assert "cast(date_trunc('month', d) as date) AS month" in sql
    assert "GROUP BY month" not in sql
    assert "IN ('CA', 'NY')" in sql
    # the order expression is the full aggregate, not the alias — strict
    # engines (Derby, tests/test_jdbc.py) reject alias references inside
    # ORDER BY expressions
    assert "coalesce(sum(units), 0) DESC" in sql


def test_sql_filter_null_semantics():
    assert sql_filter("x", "eq", None) == "x IS NULL"
    assert sql_filter("x", "ne", "a") == "(x IS NULL OR x <> 'a')"
    assert "IS NOT NULL AND NOT" in sql_filter("x", "ni", frozenset({None, "a"}))
    assert sql_filter("x", "nmatch", "p").startswith("(x IS NULL OR NOT")
    assert "array_except" in sql_filter("tags", "hasall", frozenset({"a"}))
    assert sql_filter("x", "match", "o''brien") == "x RLIKE 'o''''brien'"


def test_csv_sink_1d(spark, sales, cubedef):
    board = CuttingBoard(cubedef, sales, cache_results=False)
    q = CubeQuery().add_axis("state").add_value("units")
    out = io.StringIO()
    render_csv(out, Table1D(board, q))
    lines = out.getvalue().strip().splitlines()
    assert lines[0] == "State,Units"
    assert lines[1] == "CA,5"
    assert lines[-1] == "Total,35"


def test_csv_sink_pivot(spark, sales, cubedef):
    board = CuttingBoard(cubedef, sales, cache_results=False)
    q = (
        CubeQuery()
        .add_axis("state")
        .add_axis("status")
        .add_value("units")
        .set_pivot("status")
    )
    out = io.StringIO()
    render_csv(out, TablePivot(board, q))
    lines = out.getvalue().strip().splitlines()
    assert lines[0] == "State,closed: Units,open: Units,Total: Units"
    assert lines[1] == "CA,,5,5"
    assert lines[2] == "NY,20,10,30"
    assert lines[3] == "Total,20,15,35"


def test_json_sink(spark, sales, cubedef):
    board = CuttingBoard(cubedef, sales, cache_results=False)
    q = CubeQuery().add_axis("state").add_value("units")
    doc = render_table_json(Table1D(board, q))
    assert doc["header"] == ["State", "Units"]
    assert doc["nrows"] == 2
    assert doc["totals"] == {"units": 35}
    assert doc["query"] == "a:state/v:units"
    # drill links are deduped and parseable
    assert len(doc["links"]) == 2
    first_drill = doc["links"][doc["rows"][0]["cells"][0]["drill"]]
    assert first_drill == "f:state:CA/v:units"
    import json

    json.dumps(doc)  # JSON-able end to end


def _sheet_xml(data: bytes) -> str:
    import zipfile

    with zipfile.ZipFile(io.BytesIO(data)) as z:
        assert set(z.namelist()) >= {
            "[Content_Types].xml", "xl/workbook.xml",
            "xl/worksheets/sheet1.xml", "xl/styles.xml",
        }
        return z.read("xl/worksheets/sheet1.xml").decode()


def test_excel_sink_1d(spark, sales, cubedef):
    import xml.etree.ElementTree as ET

    from bacon_spark.observers.excel import render_excel

    board = CuttingBoard(cubedef, sales, cache_results=False)
    q = CubeQuery().add_axis("state").add_value("units")
    xml = _sheet_xml(render_excel(Table1D(board, q), now=dt.datetime(2024, 1, 1)))
    # parseable OOXML, frozen title row, bold totals row with the grand total
    root = ET.fromstring(xml)
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    pane = root.find(".//m:pane", ns)
    assert pane is not None and pane.get("ySplit") == "1" and pane.get("state") == "frozen"
    rows = root.findall(".//m:row", ns)
    texts = ["".join(t.text or "" for t in r.findall(".//m:t", ns)) for r in rows]
    assert texts[0] == "StateUnits"          # title row
    assert "Total" in texts[3]               # totals row after CA, NY
    vals = [c.find("m:v", ns).text for c in rows[3].findall("m:c", ns) if c.find("m:v", ns) is not None]
    assert vals == ["35"]
    assert "Report generated on 01/01/2024" in texts[-1]


def test_excel_sink_pivot(spark, sales, cubedef):
    import xml.etree.ElementTree as ET

    from bacon_spark.observers.excel import render_excel

    board = CuttingBoard(cubedef, sales, cache_results=False)
    q = (
        CubeQuery()
        .add_axis("state")
        .add_axis("status")
        .add_value("units")
        .set_pivot("status")
    )
    xml = _sheet_xml(render_excel(TablePivot(board, q)))
    root = ET.fromstring(xml)
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    rows = root.findall(".//m:row", ns)
    texts = ["".join(t.text or "" for t in r.findall(".//m:t", ns)) for r in rows]
    assert texts[0] == "Stateclosed: Unitsopen: UnitsTotal: Units"
    # grand-total row: col totals 20, 15 and grand 35, all bold (s=3)
    total_cells = rows[3].findall("m:c", ns)
    assert [c.get("s") for c in total_cells] == ["3", "3", "3", "3"]
    assert [c.find("m:v", ns).text for c in total_cells if c.find("m:v", ns) is not None] == ["20", "15", "35"]


def test_svg_plot_fallback(spark, sales, cubedef):
    import xml.etree.ElementTree as ET

    from bacon_spark.observers.plot import TimePlotData

    board = CuttingBoard(cubedef, sales, cache_results=False)
    q = CubeQuery().add_axis("month").add_value("units").add_value("n")
    plot = TimePlotData(board, q)
    svg = plot.render_svg()
    root = ET.fromstring(svg)
    assert root.tag.endswith("svg")
    polylines = [e for e in root.iter() if e.tag.endswith("polyline")]
    assert len(polylines) == 2  # one per series
    text = svg
    assert "Units" in text and "N" in text  # legend entries
