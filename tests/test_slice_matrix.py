"""SliceMatrix: the reference's intended slice-consumption API, resurrected
from its skipped tests (/root/reference/tests/test_cutboard.py:95-212) with
the same golden values."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bacon_spark import CubeDef, CubeQuery, CuttingBoard, Label, Measure, Sum
from bacon_spark.engine import SliceMatrix

JAN, FEB = dt.date(2010, 1, 1), dt.date(2010, 2, 1)


@pytest.fixture(scope="module")
def board(spark):
    rows = [
        (dt.date(2010, 1, 1), "apples", "italy", 100),
        (dt.date(2010, 1, 1), "pears", "italy", 101),
        (dt.date(2010, 1, 1), "apples", "england", 80),
        (dt.date(2010, 2, 1), "apples", "italy", 50),
    ]
    df = spark.createDataFrame(rows, "date date, item string, place string, number long")
    cd = CubeDef("sells")
    cd.add_label(Label("date"))
    cd.add_label(Label("item"))
    cd.add_label(Label("place"))
    cd.add_measure(Measure("number", acc=Sum()))
    cd.add_measure(Measure("twice", F.col("number") * 2, acc=Sum()))
    return CuttingBoard(cd, df, cache_results=False)


def matrix(board, query, col_axes=()):
    return SliceMatrix(board.slice(query), col_axes=col_axes)


def test_slice_iteration(board):
    # test_cutboard.py:116-144 golden values
    q = CubeQuery().add_axis("date").add_axis("item").add_value("number")
    m = matrix(board, q, col_axes=("item",))
    assert m.value_labels() == ["number"]
    assert m.col_labels() == ["apples", "pears"]
    data = list(m.rows())
    assert data[0] == [180, 101]
    assert data[1] == [50, None]
    labeled = list(m.rows_with_label())
    assert labeled[0] == (JAN, [180, 101])
    assert labeled[1] == (FEB, [50, None])
    assert m.row_labels() == [JAN, FEB]
    cols = list(m.cols_with_label())
    assert cols[0] == ("apples", [180, 50])
    assert cols[1] == ("pears", [101, None])


def test_multirow_slice(board):
    # test_cutboard.py:95-113: two row axes, one col axis
    q = (
        CubeQuery()
        .add_axis("date")
        .add_axis("place")
        .add_axis("item")
        .add_value("number")
    )
    m = matrix(board, q, col_axes=("item",))
    assert m.cell((JAN, "italy"), "apples") == 100
    assert m.cell((FEB, "italy"), "apples") == 50


def test_series(board):
    # test_cutboard.py:185-212
    q = CubeQuery().add_axis("date").add_value("number")
    m = matrix(board, q)
    assert list(m.series()) == [281, 50]
    assert list(m.series_labels()) == [JAN, FEB]

    q2 = CubeQuery().add_axis("date").add_value("number").add_value("twice")
    m2 = matrix(board, q2)
    series = list(m2.series())
    assert series == [(281, 562), (50, 100)]
    assert series[0].number == 281
    assert series[1].twice == 100
    assert list(m2.series_labels()) == [JAN, FEB]


def test_multivalue_cells_are_namedtuples(board):
    q = (
        CubeQuery()
        .add_axis("date")
        .add_axis("item")
        .add_value("number")
        .add_value("twice")
    )
    m = matrix(board, q, col_axes=("item",))
    row0 = next(iter(m.rows()))
    assert row0[0] == (180, 360)
    assert row0[0].number == 180 and row0[0].twice == 360
