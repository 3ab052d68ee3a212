"""Cross-ENGINE navigation differential (VERDICT r11 next #8): the same
seeded navigation sequences, driven through THIS engine's warm/cold
driver-side paths AND through the reference implementation itself
(``/root/reference/bacon`` — its CuttingBoard over preloaded Python
records, /root/reference/bacon/cutting.py:37-202), with cell-level
equality asserted at every step.

The existing warm-path fuzz (tests/test_engine.py) pins the driver-side
folds against no-cache Spark boards — engine-internal consistency. This
test adds the last unexploited oracle: the actual reference engine,
executing its own exec-compiled filter predicates, hash-agg folds and
slice-reuse strategies over the identical rows. Any semantic divergence
between our CubeQuery evaluation (null handling, filter ops, accumulator
folds, grouping) and the reference's goes red here with the seed to
replay.

Scope notes:
* integer measures only (Sum/Count/Min/Max) — exact equality with no
  float-association caveats;
* range ops (gt/ge/lt/le) are drawn only for NON-NULL columns: the
  reference applies plain Python operators, so ``None < v`` raises
  TypeError there (see filters.py module docstring) — nulls never
  legitimately reach an ordered comparison in either engine;
* eq/ne/in/ni are drawn on the nullable column too, INCLUDING None
  literals — the reference's non-SQL null semantics are exactly the
  part worth differential-testing.
"""

import random
import sys
from collections import namedtuple

import pytest

from bacon_spark import Count, CubeDef, CubeQuery, CuttingBoard, Sum
from bacon_spark.accumulators import Max, Min
from bacon_spark.cubedef import Label, Measure

sys.path.insert(0, "/root/reference")
ref_cutting = pytest.importorskip("bacon.cutting")

Rec = namedtuple("Rec", "g h d number")


def _rows():
    rows = []
    for i in range(300):
        g = None if i % 11 == 0 else f"g{i % 5}"
        rows.append(Rec(g, f"h{i % 3}", i % 7, i % 100))
    return rows


def _ref_board(rows):
    from bacon import accumulators as raccs
    from bacon.cubedef import AttributeLabel
    from bacon.cubedef import CubeDef as RefCubeDef
    from bacon.cubedef import Measure as RefMeasure

    cd = RefCubeDef()
    for name in ("g", "h", "d"):
        cd.add_label(AttributeLabel(name))
    cd.add_measure(RefMeasure("number", extract=lambda r: r.number))
    cd.add_measure(RefMeasure("n", extract=lambda r: r.number, acc=raccs.Count))
    cd.add_measure(RefMeasure("mn", extract=lambda r: r.number, acc=raccs.Min))
    cd.add_measure(RefMeasure("mx", extract=lambda r: r.number, acc=raccs.Max))
    return ref_cutting.CuttingBoard(cd, rows), cd


def _our_board(spark, rows):
    df = spark.createDataFrame(rows, "g string, h string, d long, number long")
    cd = CubeDef("t")
    for name in ("g", "h", "d"):
        cd.add_label(Label(name))
    cd.add_measure(Measure("number", acc=Sum()))
    cd.add_measure(Measure("n", "number", acc=Count()))
    cd.add_measure(Measure("mn", "number", acc=Min()))
    cd.add_measure(Measure("mx", "number", acc=Max()))
    # warm + cold driver paths ON: this is the surface under test
    return CuttingBoard(cd, df, cache_results=True, eager_snapshot_rows=10_000)


def _ref_cells(board, axes, values, filters):
    """Flatten the reference's nested-dict slice to sorted row tuples."""
    from bacon.cubequery import CubeQuery as RefCubeQuery

    q = RefCubeQuery()
    for a in axes:
        q = q.add_axis(a)
    for v in values:
        q = q.add_value(v)
    for n, op, v in filters:
        q = q.add_filter(n, v, operator=op)
    sl = board.slice(q)
    out = []

    def walk(data, key, depth):
        if depth == len(axes):
            out.append(key + tuple(data[v].get() for v in values))
        else:
            for k, sub in data.items():
                walk(sub, key + (k,), depth + 1)

    walk(sl._data, (), 0)
    return sorted(tuple(map(repr, t)) for t in out)


def _our_cells(board, axes, values, filters):
    q = CubeQuery()
    for a in axes:
        q = q.add_axis(a)
    for v in values:
        q = q.add_value(v)
    for n, op, v in filters:
        q = q.add_filter(n, op, v)
    return sorted(tuple(map(repr, tuple(r))) for r in board.slice(q).collect())


VALUE_OF = {"g": [None, "g0", "g1", "g2", "g4"], "h": ["h0", "h1", "h2"], "d": [0, 1, 2, 3, 6]}
RANGE_OK = ("h", "d")  # non-null columns: ordered comparisons are legal in both
VALS_POOL = ["number", "n", "mn", "mx"]


def test_reference_nav_differential_seeded(spark):
    rows = _rows()
    ref_board, _ = _ref_board(rows)
    ours = _our_board(spark, rows)

    steps_checked = 0
    for seed in range(8):
        rng = random.Random(1000 + seed)
        axes = rng.sample(["g", "h", "d"], rng.randint(1, 3))
        values = rng.sample(VALS_POOL, rng.randint(1, 4))
        filters: list = []
        for _step in range(5):
            got = _our_cells(ours, axes, values, filters)
            want = _ref_cells(ref_board, axes, values, filters)
            assert got == want, (seed, _step, axes, values, filters)
            steps_checked += 1
            move = rng.choice(["repeat", "drill", "rollup", "reproject"])
            if move == "drill" and axes:
                a = rng.choice(axes)
                if a in RANGE_OK:
                    op = rng.choice(["eq", "ne", "gt", "ge", "lt", "le", "in", "ni"])
                else:
                    op = rng.choice(["eq", "ne", "in", "ni"])
                v = rng.choice(VALUE_OF[a])
                if op in ("gt", "ge", "lt", "le") and v is None:
                    v = VALUE_OF[a][-1]
                if op in ("in", "ni"):
                    v = frozenset(
                        rng.sample(VALUE_OF[a], rng.randint(1, len(VALUE_OF[a])))
                    )
                filters.append((a, op, v))
                if rng.random() < 0.5 and len(axes) > 1:
                    axes = [x for x in axes if x != a]
            elif move == "rollup" and len(axes) > 1:
                axes = axes[:-1]
            elif move == "reproject":
                values = rng.sample(VALS_POOL, rng.randint(1, 4))
    assert steps_checked == 40
    # the differential exercised the driver-side paths, not just Spark
    assert ours.local_hits > 0
    ours.clear_cache()


def test_reference_nav_differential_dim0_and_null_drills(spark):
    """Deterministic pins for the shapes the fuzz may draw rarely: the
    dim-0 grand total, eq-None / ne-None / None-in-set drills on the
    nullable column, and a filter that empties the selection."""
    rows = _rows()
    ref_board, _ = _ref_board(rows)
    ours = _our_board(spark, rows)
    cases = [
        ((), ["number", "n", "mn", "mx"], []),
        ((), ["number", "n"], [("g", "eq", "zzz-no-such")]),  # empty selection
        (("h",), ["number", "n"], [("g", "eq", None)]),
        (("h",), ["number", "n"], [("g", "ne", None)]),
        (("g",), ["n"], [("g", "in", frozenset({None, "g1"}))]),
        (("g",), ["n"], [("g", "ni", frozenset({None, "g1"}))]),
        (("g", "h"), ["number", "mx"], [("d", "ge", 3), ("h", "ne", "h1")]),
    ]
    for axes, values, filters in cases:
        got = _our_cells(ours, list(axes), values, filters)
        want = _ref_cells(ref_board, list(axes), values, filters)
        assert got == want, (axes, values, filters)
    ours.clear_cache()
