"""Differential testing: the Spark engine vs an in-test pure-Python model
implementing the REFERENCE semantics (null-passing ne/ni/nmatch, eq-None,
Average over all rows, Group with null-as-value, make_set conflation).

Hypothesis generates small datasets with nulls plus random queries; any
divergence between model and engine is a bug in one of them. This is the
same idea as the DuckDB oracle but covers the null/edge semantics the
TPC-H-ish fixtures (null-free) never exercise.
"""

import math
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bacon_spark import (
    Average,
    Count,
    CubeDef,
    CubeQuery,
    CuttingBoard,
    Group,
    Label,
    Max,
    Measure,
    Min,
    SetLabel,
    Sum,
)

# --- the model (reference semantics, independent implementation) -----------


def model_filter(rows, name, op, value):
    def keep(r):
        v = r[name]
        if op == "eq":
            return v == value
        if op == "ne":
            return v != value
        if op == "gt":
            return v is not None and v > value
        if op == "ge":
            return v is not None and v >= value
        if op == "lt":
            return v is not None and v < value
        if op == "le":
            return v is not None and v <= value
        if op == "in":
            return v in value
        if op == "ni":
            return v not in value
        if op == "match":
            return v is not None and re.search(value, v) is not None
        if op == "nmatch":
            return not (v is not None and re.search(value, v) is not None)
        # set ops with make_set conflation
        s = set(x for x in (v or []) if x not in (None, ""))
        b = set(x for x in value if x not in (None, ""))
        if op == "hasall":
            return s >= b
        if op == "hasany":
            return bool(s & b)
        if op == "hasnone":
            return not (s & b)
        if op == "subsetof":
            return s <= b
        if op == "equals":
            return s == b
        raise AssertionError(op)

    return [r for r in rows if keep(r)]


def model_agg(rows, acc, col):
    vals = [r[col] for r in rows]
    nn = [v for v in vals if v is not None]
    if isinstance(acc, Sum):
        return sum(nn) if nn else None
    if isinstance(acc, Count):
        return len(vals)
    if isinstance(acc, Min):
        return min(nn) if nn else None
    if isinstance(acc, Max):
        return max(nn) if nn else None
    if isinstance(acc, Average):
        return (sum(nn) / len(vals)) if vals and nn else None
    if isinstance(acc, Group):
        distinct = set(vals)  # None counts as a value
        return vals[0] if len(distinct) == 1 else None
    raise AssertionError(acc)


def model_run(rows, query: CubeQuery, measures: dict):
    for name, op, value in query.filters:
        rows = model_filter(rows, name, op, value)
    groups: dict = {}
    for r in rows:
        key = tuple(r[a] for a in query.axes)
        groups.setdefault(key, []).append(r)
    out = {}
    for key, grp in groups.items():
        out[key] = tuple(model_agg(grp, measures[v], v) for v in query.values)
    return out


# --- generators -------------------------------------------------------------

keys = st.sampled_from(["a", "b", "c", None])
nums = st.one_of(st.none(), st.integers(-5, 5))
tag_sets = st.one_of(
    st.none(), st.lists(st.sampled_from(["x", "y", "z", ""]), max_size=3)
)

rows_strategy = st.lists(
    st.tuples(keys, keys, nums, tag_sets), min_size=0, max_size=25
)

scalar_filters = st.sampled_from(
    [
        ("k1", "eq", "a"),
        ("k1", "eq", None),
        ("k1", "ne", "a"),
        ("k1", "ne", None),
        ("v", "gt", 0),
        ("v", "le", 2),
        ("k2", "in", frozenset({"a", None})),
        ("k2", "ni", frozenset({"b"})),
        ("k1", "match", "a"),
        ("k1", "nmatch", "a"),
        ("tags", "hasany", frozenset({"x", "y"})),
        ("tags", "hasall", frozenset({"x"})),
        ("tags", "hasnone", frozenset({"z"})),
        ("tags", "subsetof", frozenset({"x", "y"})),
        ("tags", "equals", frozenset({"x"})),
    ]
)


@pytest.fixture(scope="module")
def setup(spark):
    measures = {
        "sum_v": Sum(),
        "n": Count(),
        "min_v": Min(),
        "max_v": Max(),
        "avg_v": Average(),
        "grp_k2": Group(),
    }
    cd = CubeDef("diff")
    cd.add_label(Label("k1"))
    cd.add_label(Label("k2"))
    cd.add_label(Label("v"))
    cd.add_label(SetLabel("tags"))
    cd.add_measure(Measure("sum_v", "v", acc=Sum()))
    cd.add_measure(Measure("n", "v", acc=Count()))
    cd.add_measure(Measure("min_v", "v", acc=Min()))
    cd.add_measure(Measure("max_v", "v", acc=Max()))
    cd.add_measure(Measure("avg_v", "v", acc=Average()))
    cd.add_measure(Measure("grp_k2", "k2", acc=Group()))
    model_measures = {
        "sum_v": Sum(),
        "n": Count(),
        "min_v": Min(),
        "max_v": Max(),
        "avg_v": Average(),
        "grp_k2": Group(),
    }
    model_cols = {"sum_v": "v", "n": "v", "min_v": "v", "max_v": "v", "avg_v": "v", "grp_k2": "k2"}
    return spark, cd, model_measures, model_cols


def _approx_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
    return a == b


@given(
    rows=rows_strategy,
    axes=st.lists(st.sampled_from(["k1", "k2"]), unique=True, max_size=2),
    values=st.lists(
        st.sampled_from(["sum_v", "n", "min_v", "max_v", "avg_v", "grp_k2"]),
        unique=True,
        min_size=1,
        max_size=3,
    ),
    filters=st.lists(scalar_filters, max_size=2),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_engine_matches_model(setup, rows, axes, values, filters):
    spark, cd, model_measures, model_cols = setup
    data = [
        {"k1": r[0], "k2": r[1], "v": r[2], "tags": r[3]} for r in rows
    ]
    df = spark.createDataFrame(
        [(d["k1"], d["k2"], d["v"], d["tags"]) for d in data],
        "k1 string, k2 string, v long, tags array<string>",
    )
    q = CubeQuery()
    for a in axes:
        q = q.add_axis(a)
    for v in values:
        q = q.add_value(v)
    for f in filters:
        q = q.add_filter(*f)

    got_rows = CuttingBoard(cd, df, cache_results=False).slice(q).df.collect()
    got = {
        tuple(r[a] for a in axes): tuple(r[v] for v in values) for r in got_rows
    }

    # model uses per-measure source columns
    model_rows = [dict(d) for d in data]
    for name, op, value in q.filters:
        model_rows = model_filter(model_rows, name, op, value)
    groups: dict = {}
    if not axes:
        # SQL semantics (ours and the oracle's): a dim-0 aggregate always
        # yields one row, even over empty input (count=0, sums null)
        groups[()] = []
    for r in model_rows:
        key = tuple(r[a] for a in axes)
        groups.setdefault(key, []).append(r)
    want = {
        key: tuple(model_agg(grp, model_measures[v], model_cols[v]) for v in values)
        for key, grp in groups.items()
    }

    assert set(got) == set(want), (got, want)
    for key in want:
        for g, w in zip(got[key], want[key]):
            assert _approx_equal(g, w), (key, got[key], want[key])
