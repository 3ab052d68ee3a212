"""Django-ORM queryset source (sources/django_orm.py) against a fake
queryset implementing the duck-typed protocol — verifies the reference's
DjangoCuttingBoard behaviors (/root/reference/bacon/sql.py:286-345): filter
pushdown into the ORM, column pruning via values()/only-analogue, typed
materialization, and the JDBC pushdown option compilation — all without
Django installed.
"""

import datetime as dt

import pytest

from bacon_spark import CubeDef, CubeQuery, Label, Measure, Sum
from bacon_spark.errors import QueryError
from bacon_spark.sources.django_orm import (
    QuerysetCuttingBoard,
    jdbc_options,
    push_filters,
    queryset_frame,
)


# --- fake Django surface ---------------------------------------------------


class FakeField:
    def __init__(self, name, internal, **kw):
        self.name = name
        self.attname = kw.pop("attname", name)
        self._internal = internal
        for k, v in kw.items():
            setattr(self, k, v)

    def get_internal_type(self):
        return self._internal


class FakeMeta:
    def __init__(self, fields):
        self.concrete_fields = fields


class FakeModel:
    pass


def _lookup_match(rec, key, val):
    if "__" in key:
        field, op = key.rsplit("__", 1)
    else:
        field, op = key, "exact"
    x = rec.get(field)
    if op == "isnull":
        return (x is None) == val
    if x is None:
        return False
    return {
        "exact": lambda: x == val,
        "gt": lambda: x > val,
        "gte": lambda: x >= val,
        "lt": lambda: x < val,
        "lte": lambda: x <= val,
        "in": lambda: x in val,
    }[op]()


class FakeQuerySet:
    """List-of-dicts queryset recording every pushdown call."""

    def __init__(self, rows, model=None, calls=None, sql="SELECT * FROM t"):
        self.rows = rows
        self.model = model
        self.calls = calls if calls is not None else []
        self.query = sql  # str(qs.query) is the compiled SQL in Django

    def _clone(self, rows):
        return FakeQuerySet(rows, self.model, self.calls, self.query)

    def filter(self, **kw):
        self.calls.append(("filter", kw))
        rows = [
            r for r in self.rows
            if all(_lookup_match(r, k, v) for k, v in kw.items())
        ]
        return self._clone(rows)

    def values(self, *cols):
        self.calls.append(("values", cols))
        if not cols:
            return self._clone([dict(r) for r in self.rows])
        return self._clone([{c: r.get(c) for c in cols} for r in self.rows])

    def iterator(self, chunk_size=2000):
        return iter(self.rows)


ROWS = [
    {"id": 1, "item": "apples", "place": "italy", "number": 100,
     "day": dt.date(2010, 1, 1)},
    {"id": 2, "item": "pears", "place": "italy", "number": 101,
     "day": dt.date(2010, 1, 1)},
    {"id": 3, "item": "apples", "place": "england", "number": 80,
     "day": dt.date(2010, 1, 2)},
    {"id": 4, "item": "apples", "place": None, "number": 50,
     "day": dt.date(2010, 2, 1)},
]

META = FakeMeta([
    FakeField("id", "BigAutoField"),
    FakeField("item", "CharField"),
    FakeField("place", "CharField"),
    FakeField("number", "IntegerField"),
    FakeField("day", "DateField"),
])


def make_qs():
    model = FakeModel()
    model._meta = META
    return FakeQuerySet([dict(r) for r in ROWS], model=model)


# --- push_filters ----------------------------------------------------------


def test_safe_ops_are_pushed():
    qs = make_qs()
    out, residual = push_filters(
        qs,
        [("item", "eq", "apples"), ("number", "gt", 60),
         ("place", "in", frozenset({"italy", "england"}))],
    )
    assert residual == []
    assert [c[0] for c in qs.calls] == ["filter"] * 3
    assert [r["id"] for r in out.rows] == [1, 3]


def test_eq_none_pushes_isnull():
    qs = make_qs()
    out, residual = push_filters(qs, [("place", "eq", None)])
    assert residual == []
    assert qs.calls == [("filter", {"place__isnull": True})]
    assert [r["id"] for r in out.rows] == [4]


def test_null_unsafe_ops_stay_residual():
    qs = make_qs()
    fs = [
        ("item", "ne", "pears"),            # engine ne passes nulls
        ("item", "ni", frozenset({"x"})),   # engine ni passes nulls
        ("item", "match", "^a"),            # regex dialect is DB-specific
        ("place", "in", frozenset({"italy", None})),  # null-in-set
    ]
    out, residual = push_filters(qs, fs)
    assert residual == fs
    assert qs.calls == []  # nothing touched the ORM
    assert out is qs


# --- queryset_frame --------------------------------------------------------


def test_frame_types_come_from_model_meta(spark):
    df = queryset_frame(spark, make_qs())
    got = dict(df.dtypes)
    assert got == {"id": "bigint", "item": "string", "place": "string",
                   "number": "bigint", "day": "date"}
    assert df.count() == 4


def test_frame_prunes_columns_through_values(spark):
    qs = make_qs()
    df = queryset_frame(spark, qs, columns=["item", "number"])
    assert ("values", ("item", "number")) in qs.calls
    assert df.columns == ["item", "number"]


def test_frame_empty_queryset_keeps_schema(spark):
    qs = make_qs()
    qs.rows = []
    df = queryset_frame(spark, qs)
    assert dict(df.dtypes)["day"] == "date"
    assert df.count() == 0


def test_frame_without_meta_needs_rows_or_schema(spark):
    qs = FakeQuerySet([], model=None)
    with pytest.raises(QueryError):
        queryset_frame(spark, qs)


def test_frame_max_rows_guard(spark):
    with pytest.raises(QueryError):
        queryset_frame(spark, make_qs(), max_rows=2)


# --- jdbc_options ----------------------------------------------------------


def test_jdbc_options_compile_pushdown_subquery():
    qs = make_qs()
    qs.query = 'SELECT "a"."x" FROM "a" WHERE "a"."y" > 3'
    opts = jdbc_options(qs, "jdbc:postgresql://h/db", partition_column="x",
                        num_partitions=8, lower_bound=0, upper_bound=1000)
    assert opts["dbtable"] == '(SELECT "a"."x" FROM "a" WHERE "a"."y" > 3) bacon_src'
    assert opts["partitionColumn"] == "x"
    assert opts["numPartitions"] == "8"


def test_jdbc_partitioning_needs_bounds():
    with pytest.raises(QueryError):
        jdbc_options(make_qs(), "jdbc:postgresql://h/db", partition_column="x")


# --- QuerysetCuttingBoard end-to-end --------------------------------------


@pytest.fixture(scope="module")
def cubedef():
    cd = CubeDef("sells")
    cd.add_label(Label("id"))
    cd.add_label(Label("item"))
    cd.add_label(Label("place"))
    cd.add_measure(Measure("number", acc=Sum()))
    return cd


def test_board_aggregates_with_orm_pushdown(spark, cubedef):
    qs = make_qs()
    board = QuerysetCuttingBoard(cubedef, qs, spark)
    q = CubeQuery(axes=("item",), values=("number",)).add_filter(
        "id", "gt", 1
    )
    s = board.slice(q)
    got = {r["item"]: r["number"] for r in s.to_df().collect()}
    assert got == {"apples": 130, "pears": 101}
    # the gt filter reached the ORM...
    assert ("filter", {"id__gt": 1}) in qs.calls
    # ...and the fetch was pruned to the touched columns
    assert ("values", ("id", "item", "number")) in qs.calls


def test_board_residual_filter_keeps_engine_null_semantics(spark, cubedef):
    qs = make_qs()
    board = QuerysetCuttingBoard(cubedef, qs, spark)
    # ne passes nulls in the engine DSL; a pushed .exclude would drop row 4
    q = CubeQuery(axes=("place",), values=("number",)).add_filter(
        "item", "ne", "pears"
    )
    got = {r["place"]: r["number"] for r in board.slice(q).to_df().collect()}
    assert got == {"italy": 100, "england": 80, None: 50}
