"""Randomized SQL-pushdown differential on a SECOND engine (VERDICT r10
next #6): the Derby fuzz (tests/test_jdbc.py) covers scalar/membership
filters, but Derby has no arrays and no date_trunc, so the sql.py
translations of the 13 set-algebra ops and the date-hierarchy labels
were pinned only by golden tests.  DuckDB supports both, so this fuzz
compiles each random cube query twice — Spark dialect (executed via
spark.sql over a temp view) and DuckDB dialect (executed on a real
duckdb connection over the identical rows) — and demands exact row
equality with the in-memory Column-API board.  Three independent
implementations of the same query semantics; red on any divergence.

Dialect notes under test (cubedef.sql_templates / sql.sql_filter):
DuckDB numbers dayofweek from Sunday=0 (Spark: Sunday=1) so WeekdayLabel
maps to isodow; yearofweek -> isoyear; to_date -> cast(date);
array_*/filter/size -> list_has_all/list_has_any/list_sort forms.
"""

import datetime as dt
import random

import pytest

from bacon_spark import (
    Average,
    Count,
    CubeDef,
    Max,
    Min,
    CubeQuery,
    CuttingBoard,
    DayLabel,
    DOYLabel,
    ISOWeekNumLabel,
    ISOYearLabel,
    Label,
    Measure,
    MonthdayLabel,
    MonthLabel,
    MonthOfYearLabel,
    QuarterLabel,
    QuarterNumLabel,
    SetLabel,
    Sum,
    WeekdayLabel,
    WeekLabel,
    YearLabel,
)
from bacon_spark.sql import SqlCuttingBoard

duckdb = pytest.importorskip("duckdb")

VOCAB = ["red", "blue", "green", "widget", "bolt", "gear", ""]


def _rows(rng, n=400):
    """Null-bearing tag soups + timestamps straddling ISO year/week
    boundaries (late-Dec/early-Jan rows stress isoyear/isodow and the
    weekofyear remaps) + 0.25-grid amounts (exact double sums in any
    association order, the gate's decimal-exact convention)."""
    t0 = dt.datetime(2023, 12, 25, 6, 30)  # crosses into ISO year 2024
    rows = []
    for i in range(n):
        tags = None if i % 13 == 0 else rng.sample(VOCAB, rng.randint(0, 4))
        if tags and rng.random() < 0.3:
            tags = tags + [tags[0]]  # duplicate element: distinct conflation
        ts = t0 + dt.timedelta(hours=rng.randint(0, 24 * 400))
        rows.append(
            (
                rng.choice(["acme", "globex", "initech", None]),
                tags,
                ts,
                rng.randint(-5, 50),
                None if rng.random() < 0.15 else rng.randint(-200, 800) * 0.25,
            )
        )
    return rows


def _cubedef():
    cd = CubeDef("duckrows")
    cd.add_label(Label("brand"))
    cd.add_label(SetLabel("tags"))
    for lab in (
        YearLabel("year", "ts"),
        ISOYearLabel("isoyear", "ts"),
        MonthLabel("month", "ts"),
        MonthOfYearLabel("monthnum", "ts"),
        QuarterLabel("quarter", "ts"),
        QuarterNumLabel("quarternum", "ts"),
        WeekLabel("week", "ts"),
        ISOWeekNumLabel("weeknum", "ts"),
        DayLabel("day", "ts"),
        DOYLabel("doy", "ts"),
        WeekdayLabel("weekday", "ts"),
        MonthdayLabel("monthday", "ts"),
    ):
        cd.add_label(lab)
    cd.add_measure(Measure("units", acc=Sum()))
    cd.add_measure(Measure("amount", acc=Sum()))
    cd.add_measure(Measure("n", "units", acc=Count()))
    cd.add_measure(Measure("avg_u", "units", acc=Average()))
    # Min/Max are exact cross-engine (StdDev is deliberately absent:
    # stddev_samp's summation order differs per engine, so double
    # equality would flap — the decimal-exact convention)
    cd.add_measure(Measure("mn_a", "amount", acc=Min()))
    cd.add_measure(Measure("mx_u", "units", acc=Max()))
    return cd


SET_OPS = [
    "hasall", "hasany", "hasnone", "hasonly", "hasnotall", "subsetof",
    "notsubsetof", "supersetof", "notsupersetof", "disjointfrom",
    "intersects", "equals", "notequals",
]
# Java∩RE2 subset only (sql.sql_filter's documented restriction): no
# backreferences, no lookaround. Spark RLIKE and DuckDB regexp_matches
# are both unanchored SEARCHES, so anchors are explicit where intended.
REGEX_POOL = ["^a", "e$", "e|o", "ini.*ch", "gl[oa]bex", "^(acme|globex)$", "z"]
TRUNC_LABELS = ["year", "month", "quarter", "week", "day"]
PART_LABELS = {
    "isoyear": (2023, 2025),
    "monthnum": (1, 12),
    "quarternum": (1, 4),
    "weeknum": (1, 53),
    "doy": (1, 366),
    "weekday": (1, 7),
    "monthday": (1, 31),
}


@pytest.fixture(scope="module")
def engines(spark):
    rng = random.Random(0xDDB)
    rows = _rows(rng)
    df = spark.createDataFrame(
        rows,
        "brand string, tags array<string>, ts timestamp, units int, amount double",
    )
    df.createOrReplaceTempView("duckrows")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE duckrows (brand VARCHAR, tags VARCHAR[], "
        "ts TIMESTAMP, units INTEGER, amount DOUBLE)"
    )
    con.executemany("INSERT INTO duckrows VALUES (?, ?, ?, ?, ?)", rows)
    yield df, con
    con.close()


def _key(t):
    return tuple(map(repr, t))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_duckdb_differential_set_and_date_filters(spark, engines, seed):
    df, con = engines
    rng = random.Random(seed)
    cd = _cubedef()
    mem = CuttingBoard(cd, df, cache_results=False)
    sql_spark = SqlCuttingBoard(cd, spark, "duckrows")
    sql_duck = SqlCuttingBoard(cd, spark, "duckrows", dialect="duckdb")

    def random_query():
        q = CubeQuery()
        axes = rng.sample(
            ["brand", "month", "quarter", "weekday", "isoyear", "monthnum"],
            rng.randint(0, 2),
        )
        for a in axes:
            q = q.add_axis(a)
        for v in rng.sample(
            ["units", "amount", "n", "avg_u", "mn_a", "mx_u"], rng.randint(1, 3)
        ):
            q = q.add_value(v)
        for _ in range(rng.randint(1, 2)):
            kind = rng.random()
            if kind < 0.4:  # set-algebra filter on the tags SetLabel
                op = rng.choice(SET_OPS)
                v = frozenset(rng.sample(VOCAB + [None], rng.randint(1, 3)))
                q = q.add_filter("tags", op, v)
            elif kind < 0.55:  # regex filter (null-bearing brand column)
                q = q.add_filter(
                    "brand", rng.choice(["match", "nmatch"]),
                    rng.choice(REGEX_POOL),
                )
            elif kind < 0.8:  # date filter on a TRUNCATING label
                lab = rng.choice(TRUNC_LABELS)
                op = rng.choice(["eq", "ne", "gt", "ge", "lt", "le"])
                v = dt.date(2024, rng.randint(1, 12), 1)
                if rng.random() < 0.3:  # non-boundary date too
                    v = dt.date(2024, rng.randint(1, 12), rng.randint(1, 28))
                q = q.add_filter(lab, op, v)
            else:  # integer date-PART filter
                lab, (lo, hi) = rng.choice(list(PART_LABELS.items()))
                op = rng.choice(["eq", "ne", "gt", "ge", "lt", "le", "in", "ni"])
                if op in ("in", "ni"):
                    v = frozenset(rng.randint(lo, hi) for _ in range(rng.randint(1, 3)))
                else:
                    v = rng.randint(lo, hi)
                q = q.add_filter(lab, op, v)
        return q

    total = 0
    for trial in range(10):
        q = random_query()
        want = sorted((_key(tuple(r)) for r in mem.slice(q).collect()))
        got_spark = sorted(
            (_key(tuple(r)) for r in spark.sql(sql_spark.compile(q)).collect())
        )
        assert got_spark == want, (
            f"seed {seed} trial {trial}: Spark-SQL text diverges from the "
            f"Column board for\n{sql_spark.compile(q)}"
        )
        got_duck = sorted(
            (_key(tuple(r)) for r in con.execute(sql_duck.compile(q)).fetchall())
        )
        assert got_duck == want, (
            f"seed {seed} trial {trial}: DuckDB diverges for\n{sql_duck.compile(q)}"
        )
        total += len(want)
    assert total > 0, f"seed {seed}: every trial returned empty — vacuous fuzz"


def test_duckdb_every_set_op_exhaustive(spark, engines):
    """Deterministic per-op pin (the fuzz draws each op only a few times
    across seeds): every one of the 13 set-algebra ops, against three
    literal shapes (singleton, null+''-bearing pair, full-vocab), through
    all three paths — Column board, Spark-dialect text, DuckDB-dialect
    text — exact equality. A wrong mapping for ANY single op goes red
    here, not just probabilistically."""
    df, con = engines
    cd = _cubedef()
    mem = CuttingBoard(cd, df, cache_results=False)
    sql_spark = SqlCuttingBoard(cd, spark, "duckrows")
    sql_duck = SqlCuttingBoard(cd, spark, "duckrows", dialect="duckdb")
    shapes = [
        frozenset({"red"}),
        frozenset({"blue", None, ""}),
        frozenset(VOCAB),
    ]
    for op in SET_OPS:
        for v in shapes:
            q = (
                CubeQuery().add_axis("brand").add_value("n").add_value("units")
                .add_filter("tags", op, v)
            )
            want = sorted(_key(tuple(r)) for r in mem.slice(q).collect())
            got_spark = sorted(
                _key(tuple(r)) for r in spark.sql(sql_spark.compile(q)).collect()
            )
            got_duck = sorted(
                _key(tuple(r)) for r in con.execute(sql_duck.compile(q)).fetchall()
            )
            assert got_spark == want, (op, v, sql_spark.compile(q))
            assert got_duck == want, (op, v, sql_duck.compile(q))


def test_duckdb_every_regex_op_exhaustive(spark, engines):
    """match/nmatch per-pattern pin (VERDICT r11 wrong #2: the dialect's
    regex branch emitted RLIKE, which DuckDB's parser rejects). Every
    pattern in the shared Java∩RE2 pool, both ops, through all three
    paths — the null brand rows exercise the engine's null semantics
    (match: null never matches; nmatch: null passes)."""
    df, con = engines
    cd = _cubedef()
    mem = CuttingBoard(cd, df, cache_results=False)
    sql_spark = SqlCuttingBoard(cd, spark, "duckrows")
    sql_duck = SqlCuttingBoard(cd, spark, "duckrows", dialect="duckdb")
    for op in ("match", "nmatch"):
        for pat in REGEX_POOL:
            q = (
                CubeQuery().add_axis("brand").add_value("n").add_value("units")
                .add_filter("brand", op, pat)
            )
            want = sorted(_key(tuple(r)) for r in mem.slice(q).collect())
            got_spark = sorted(
                _key(tuple(r)) for r in spark.sql(sql_spark.compile(q)).collect()
            )
            got_duck = sorted(
                _key(tuple(r)) for r in con.execute(sql_duck.compile(q)).fetchall()
            )
            assert got_spark == want, (op, pat, sql_spark.compile(q))
            assert got_duck == want, (op, pat, sql_duck.compile(q))


def test_duckdb_dialect_weekday_isoyear_forms(spark, engines):
    """The three labels whose Spark SQL form is NOT portable: evaluated
    per-row on both engines over the full table, exact equality. This is
    the case that motivated sql_templates — DuckDB's dayofweek numbers
    Sunday=0, so the Spark remap text evaluated there is off by one."""
    df, con = engines
    for spark_expr, duck_expr in (
        ("(dayofweek(ts) + 5) % 7 + 1", "isodow(ts)"),
        ("extract(yearofweek from ts)", "isoyear(ts)"),
        ("to_date(ts)", "cast(ts as date)"),
    ):
        a = [r[0] for r in spark.sql(
            f"SELECT {spark_expr} FROM duckrows ORDER BY ts, units"
        ).collect()]
        b = [r[0] for r in con.execute(
            f"SELECT {duck_expr} FROM duckrows ORDER BY ts, units"
        ).fetchall()]
        assert list(map(repr, a)) == list(map(repr, b)), (spark_expr, duck_expr)
