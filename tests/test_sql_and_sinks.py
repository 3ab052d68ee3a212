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
    assert "GROUP BY month" in sql
    assert "date_trunc('month', d)" in sql
    assert "IN ('CA', 'NY')" in sql
    assert "coalesce(units, 0) DESC" in sql


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
