"""Property-based tests (hypothesis): DSL round-trip and query algebra
invariants — spark-free, pure query-layer properties."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from bacon_spark import CubeDef, CubeQuery, IntLabel, Label, Measure, Sum
from bacon_spark.builders.url import UrlQueryBuilder
from bacon_spark.cubequery import INVERT_OP
from bacon_spark.utils.strings import bslash_escape, bslash_split, bslash_unescape


def make_cubedef():
    cd = CubeDef("t")
    for name in ["alpha", "beta", "gamma"]:
        cd.add_label(Label(name))
    cd.add_label(IntLabel("num"))
    cd.add_measure(Measure("m1", "x", acc=Sum()))
    cd.add_measure(Measure("m2", "y", acc=Sum()))
    return cd


CD = make_cubedef()
BUILDER = UrlQueryBuilder(CD)

text_values = st.text(
    alphabet=string.ascii_letters + string.digits + " /:\\-_.,!?é漢",
    min_size=1,
    max_size=20,
)


@given(st.lists(text_values, max_size=5), st.sampled_from("/:"))
@settings(max_examples=200)
def test_escape_split_roundtrip(tokens, sep):
    joined = sep.join(bslash_escape(t, "/:") for t in tokens)
    parts = [bslash_unescape(p) for p in bslash_split(joined, sep)]
    assert parts == (tokens if tokens else [""])


@st.composite
def queries(draw):
    q = CubeQuery()
    for name in draw(st.lists(st.sampled_from(["alpha", "beta", "gamma"]), unique=True, max_size=3)):
        q = q.add_axis(name)
    for name in draw(st.lists(st.sampled_from(["m1", "m2"]), unique=True, max_size=2)):
        q = q.add_value(name, visible=draw(st.booleans()))
    nf = draw(st.integers(0, 3))
    for _ in range(nf):
        label = draw(st.sampled_from(["alpha", "beta", "gamma"]))
        op = draw(st.sampled_from(["eq", "ne", "match", "nmatch", "gt", "le"]))
        q = q.add_filter(label, op, draw(text_values))
    ni = draw(st.integers(0, 1))
    if ni:
        q = q.add_filter(
            draw(st.sampled_from(["alpha", "beta"])),
            "in",
            frozenset(draw(st.lists(text_values, min_size=1, max_size=3))),
        )
    if draw(st.booleans()) and q.values:
        q = q.set_order(q.values[0], descending=draw(st.booleans()))
    if draw(st.booleans()) and q.axes:
        q = q.set_pivot(q.axes[-1])
    return q


@given(queries())
@settings(max_examples=200)
def test_dsl_roundtrip(q):
    s = BUILDER.unparse(q)
    q2 = BUILDER.parse(s)
    assert q2 == q


@given(queries())
@settings(max_examples=100)
def test_double_invert_identity(q):
    for f in q.filters:
        if f[1] not in INVERT_OP:
            continue
        inv = (f[0], INVERT_OP[f[1]], f[2])
        if inv in q.filters:
            # pathological: a filter and its antonym coexist — inversion
            # creates a duplicate and the re-target is ambiguous
            continue
        assert q.invert_filter(f).invert_filter(inv) == q


@given(queries(), st.sampled_from(["alpha", "beta", "gamma"]))
@settings(max_examples=100)
def test_add_remove_axis_identity(q, name):
    if name in q.axes or name in q.pivots:
        return
    assert q.add_axis(name).remove_axis(name) == q


@given(queries())
@settings(max_examples=100)
def test_pivot_axes_are_trailing(q):
    # invariant the renderer relies on: pivot axes are always the trailing
    # axes, in axis order
    if q.pivots:
        assert tuple(q.axes[-len(q.pivots):]) == q.pivots
