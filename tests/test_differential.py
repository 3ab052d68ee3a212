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


# --- extension: the remaining set-algebra ops + compound accumulators -------
#
# The reference's 13 set ops reduce to 6 core predicates + negations
# (bacon_spark/filters.py FILTER_OPS); the model mirrors the SET semantics
# (make_set conflation of null/"" on both sides). StdDev/Union/LabeledAcc/
# RatioSum are the accumulators the base harness skips.


def model_filter_ext(rows, name, op, value):
    core = {
        "hasonly": lambda s, b: s == b,
        "equals": lambda s, b: s == b,
        "notequals": lambda s, b: s != b,
        "hasnotall": lambda s, b: not (s >= b),
        "supersetof": lambda s, b: s >= b,
        "notsupersetof": lambda s, b: not (s >= b),
        "notsubsetof": lambda s, b: not (s <= b),
        "disjointfrom": lambda s, b: not (s & b),
        "intersects": lambda s, b: bool(s & b),
    }
    if op not in core:
        return model_filter(rows, name, op, value)

    def keep(r):
        v = r[name]
        s = set(x for x in (v or []) if x not in (None, ""))
        b = set(x for x in value if x not in (None, ""))
        return core[op](s, b)

    return [r for r in rows if keep(r)]


def model_agg_ext(rows, name, col):
    import statistics

    vals = [r[col] for r in rows]
    nn = [v for v in vals if v is not None]
    if name == "std_v":
        # Spark stddev_samp: null for n < 2 non-null (verified), sample form
        return statistics.stdev(nn) if len(nn) >= 2 else None
    if name == "union_tags":
        cleaned = [
            [x for x in (v or []) if x not in (None, "")] for v in vals
        ]
        values = tuple(sorted({x for lst in cleaned for x in lst}))
        included_empty = any(v is None or not c for v, c in zip(vals, cleaned))
        return (values, included_empty)
    if name == "labeled_sum":
        # sum of v, but only if the whole group shares ONE k2 (null counts
        # as a value); else Inconsistent -> null
        if len(set(r["k2"] for r in rows)) > 1:
            return None
        return sum(nn) if nn else None
    if name == "ratio_vw":
        num = sum(r["v"] for r in rows if r["v"] is not None)
        den = sum(r["w"] for r in rows if r["w"] is not None)
        has_num = any(r["v"] is not None for r in rows)
        has_den = any(r["w"] is not None for r in rows)
        if not has_den or den == 0:
            return None
        return (num / den) if has_num else None
    raise AssertionError(name)


ext_set_filters = st.sampled_from(
    [
        ("tags", "hasonly", frozenset({"x"})),
        ("tags", "equals", frozenset({"x", "y"})),
        ("tags", "notequals", frozenset({"x"})),
        ("tags", "hasnotall", frozenset({"x", "y"})),
        ("tags", "supersetof", frozenset({"x"})),
        ("tags", "notsupersetof", frozenset({"x", "z"})),
        ("tags", "notsubsetof", frozenset({"x", "y"})),
        ("tags", "disjointfrom", frozenset({"y", "z"})),
        ("tags", "intersects", frozenset({"y"})),
        # conflation probes: "" and the empty set on the literal side
        ("tags", "equals", frozenset()),
        ("tags", "disjointfrom", frozenset({""})),
    ]
)


@pytest.fixture(scope="module")
def setup_ext(spark):
    from bacon_spark import LabeledAcc, RatioSum, StdDev, Union

    cd = CubeDef("diff_ext")
    cd.add_label(Label("k1"))
    cd.add_label(Label("k2"))
    cd.add_label(SetLabel("tags"))
    cd.add_measure(Measure("std_v", "v", acc=StdDev()))
    cd.add_measure(Measure("union_tags", "tags", acc=Union()))
    cd.add_measure(Measure("labeled_sum", "v", acc=LabeledAcc("k2", Sum())))
    cd.add_measure(Measure("ratio_vw", "v", acc=RatioSum("v", "w")))
    return spark, cd


rows_strategy_ext = st.lists(
    st.tuples(keys, keys, nums, nums, tag_sets), min_size=0, max_size=25
)


@given(
    rows=rows_strategy_ext,
    axes=st.lists(st.sampled_from(["k1", "k2"]), unique=True, max_size=2),
    values=st.lists(
        st.sampled_from(["std_v", "union_tags", "labeled_sum", "ratio_vw"]),
        unique=True,
        min_size=1,
        max_size=3,
    ),
    filters=st.lists(ext_set_filters, max_size=2),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_engine_matches_model_ext(setup_ext, rows, axes, values, filters):
    spark, cd = setup_ext
    data = [
        {"k1": r[0], "k2": r[1], "v": r[2], "w": r[3], "tags": r[4]} for r in rows
    ]
    df = spark.createDataFrame(
        [(d["k1"], d["k2"], d["v"], d["w"], d["tags"]) for d in data],
        "k1 string, k2 string, v long, w long, tags array<string>",
    )
    q = CubeQuery()
    for a in axes:
        q = q.add_axis(a)
    for v in values:
        q = q.add_value(v)
    for f in filters:
        q = q.add_filter(*f)

    got_rows = CuttingBoard(cd, df, cache_results=False).slice(q).df.collect()

    def norm(name, x):
        if name == "union_tags" and x is not None:
            return (tuple(x["values"]), bool(x["included_empty"]))
        return x

    got = {
        tuple(r[a] for a in axes): tuple(norm(v, r[v]) for v in values)
        for r in got_rows
    }

    model_rows = [dict(d) for d in data]
    for name, op, value in q.filters:
        model_rows = model_filter_ext(model_rows, name, op, value)
    groups: dict = {}
    if not axes:
        groups[()] = []
    for r in model_rows:
        key = tuple(r[a] for a in axes)
        groups.setdefault(key, []).append(r)
    want = {
        key: tuple(model_agg_ext(grp, v, "tags" if v == "union_tags" else "v") for v in values)
        for key, grp in groups.items()
    }

    assert set(got) == set(want), (got, want)
    for key in want:
        for v, g, w in zip(values, got[key], want[key]):
            if v == "union_tags":
                assert g == w, (key, v, got[key], want[key])
            else:
                assert _approx_equal(g, w), (key, v, got[key], want[key])
