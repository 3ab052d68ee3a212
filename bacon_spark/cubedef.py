"""Cube schema: labels (dimensions), measures, hierarchies.

Spark-first re-expression of the reference's schema layer
(/root/reference/bacon/cubedef.py). A :class:`Label` is a *named Column
expression* over a DataFrame plus presentation/DSL metadata (parse/unparse,
pretty, sort key direction); a :class:`Measure` is a Label with an
accumulator (aggregate builder). The hierarchy is a plain-dict DAG (the
reference uses networkx, /root/reference/bacon/cubedef.py:61-72 — we only
need ancestors/descendants/chain checks, so adjacency dicts suffice).

Execution is entirely Catalyst's job: labels resolve to Column expressions
that Spark pushes into scans (predicate pushdown / column pruning), and the
date-hierarchy labels compile to built-in date functions so everything stays
inside whole-stage codegen — no Python UDFs anywhere in this module.
"""

from __future__ import annotations

import datetime as dt
import re
from collections.abc import Callable, Mapping
from types import MappingProxyType

from pyspark.sql import Column
from pyspark.sql import functions as F

from .errors import DataError, QueryError

__all__ = [
    "Label",
    "NullableLabel",
    "IntLabel",
    "BoolLabel",
    "FloatLabel",
    "DateLabel",
    "DatetimeLabel",
    "SetLabel",
    "Measure",
    "RatioMeasure",
    "CubeDef",
    # date hierarchy family
    "YearLabel",
    "ISOYearLabel",
    "MonthLabel",
    "MonthOfYearLabel",
    "QuarterLabel",
    "QuarterNumLabel",
    "WeekLabel",
    "ISOWeekNumLabel",
    "DayLabel",
    "DOYLabel",
    "HourLabel",
    "WeekdayLabel",
    "MonthdayLabel",
]


def _to_column(expr: str | Column | Callable[[], Column]) -> Column:
    if isinstance(expr, Column):
        return expr
    if callable(expr):
        return expr()
    return F.expr(expr)


class Label:
    """A named dimension: a Column expression plus query-DSL metadata.

    Reference: Label (/root/reference/bacon/cubedef.py:236-299). The
    reference's ``extract(record)`` becomes a Column expression; ``key``
    (sort key, nulls first, /root/reference/bacon/cubedef.py:301-306)
    becomes ``asc_nulls_first`` ordering; ``parse``/``unparse`` keep their
    role in the URL DSL.
    """

    #: token the DSL uses for None on nullable labels
    none_value: str | None = None

    def __init__(
        self,
        name: str,
        expr: str | Column | Callable[[], Column] | None = None,
        title: str | None = None,
        pretty: Callable[[object], str] | None = None,
        reverse: bool = False,
        dimension: str | None = None,
        child_of: str | None = None,
        allow_pivot: bool = True,
        hidden: bool = False,
    ):
        self.name = name
        self._expr = expr if expr is not None else name
        self.title = title if title is not None else name.replace("_", " ").title()
        self._pretty = pretty
        self.rank = 0  # depth in its hierarchy, set by CubeDef.add_hierarchy
        self.reverse = reverse
        self.dimension = dimension
        self.child_of = child_of
        self.allow_pivot = allow_pivot
        self.hidden = hidden

    # --- execution -----------------------------------------------------
    def column(self) -> Column:
        """The Spark Column computing this label (aliased by the engine)."""
        return _to_column(self._expr)

    def order_column(self, reverse: bool = False) -> Column:
        """Sort expression: nulls first ascending (reference key semantics,
        /root/reference/bacon/cubedef.py:301-306), flipped by ``reverse``."""
        c = F.col(self.name)
        rev = bool(self.reverse) ^ bool(reverse)
        return c.desc_nulls_last() if rev else c.asc_nulls_first()

    # --- DSL / presentation --------------------------------------------
    def parse(self, s: str):
        """Query-string token -> typed Python value."""
        if self.none_value is not None and s == self.none_value:
            return None
        return self._parse(s)

    def _parse(self, s: str):
        return s

    def unparse(self, value) -> str:
        """Typed Python value -> query-string token."""
        if value is None:
            if self.none_value is None:
                raise DataError(f"label '{self.name}' is not nullable in the DSL")
            return self.none_value
        return self._unparse(value)

    def _unparse(self, value) -> str:
        return str(value)

    def pretty(self, value) -> str:
        if value is None:
            return "(none)"
        if self._pretty is not None:
            return self._pretty(value)
        return str(value)

    # literal conversion for filter building (python value -> Column literal)
    def lit(self, value) -> Column:
        return F.lit(value)

    def sql_expr(self, dialect: str = "spark") -> str:
        """SQL-text form for the pushdown backend (sql.py); labels whose
        expression is a Column object are DataFrame-only. *dialect* picks
        the target engine's function vocabulary ("spark" default;
        "duckdb" where a label's Spark form isn't portable — plain
        column/expression labels are dialect-agnostic)."""
        if isinstance(self._expr, str):
            return self._expr
        from .errors import QueryError

        raise QueryError(f"label {self.name!r} has no SQL expression")

    def __repr__(self):  # pragma: no cover
        return f"<{type(self).__name__} {self.name!r}>"


class NullableLabel(Label):
    """String label whose DSL maps ``""`` <-> None and renders ``(none)``
    (reference NullableLabel, /root/reference/bacon/cubedef.py:491-515)."""

    none_value = ""


class IntLabel(Label):
    """Integer-typed label (/root/reference/bacon/cubedef.py:621-627)."""

    def _parse(self, s: str):
        try:
            return int(s)
        except ValueError:
            raise DataError(f"invalid integer for '{self.name}': {s!r}")


class FloatLabel(Label):
    def _parse(self, s: str):
        try:
            return float(s)
        except ValueError:
            raise DataError(f"invalid float for '{self.name}': {s!r}")


class BoolLabel(Label):
    """'0'/'1'/'' <-> False/True/None; pretty No/Yes/Unknown
    (/root/reference/bacon/cubedef.py:630-639)."""

    none_value = None  # '' means None here, handled below

    def parse(self, s: str):
        if s == "":
            return None
        if s == "0":
            return False
        if s == "1":
            return True
        raise DataError(f"invalid bool for '{self.name}': {s!r}")

    def unparse(self, value) -> str:
        if value is None:
            return ""
        return "1" if value else "0"

    def pretty(self, value) -> str:
        if value is None:
            return "Unknown"
        return "Yes" if value else "No"


class DateLabel(Label):
    """%Y-%m-%d dates (/root/reference/bacon/cubedef.py:668-670)."""

    fmt = "%Y-%m-%d"

    def _parse(self, s: str):
        try:
            return dt.datetime.strptime(s, self.fmt).date()
        except ValueError:
            raise DataError(f"invalid date for '{self.name}': {s!r}")

    def _unparse(self, value) -> str:
        return value.strftime(self.fmt)


class DatetimeLabel(Label):
    """%Y-%m-%dT%H:%M naive timestamps, session TZ is UTC
    (/root/reference/bacon/cubedef.py:655-665)."""

    fmt = "%Y-%m-%dT%H:%M"

    def _parse(self, s: str):
        try:
            return dt.datetime.strptime(s, self.fmt)
        except ValueError:
            raise DataError(f"invalid datetime for '{self.name}': {s!r}")

    def _unparse(self, value) -> str:
        return value.strftime(self.fmt)


class SetLabel(Label):
    """Set-of-strings label backed by ``array<string>`` columns.

    Reference SetLabel (/root/reference/bacon/cubedef.py:532-618): Postgres
    ``text[]`` with full set algebra in filters. Here the set algebra
    compiles to Spark ``array_*`` functions (see filters.py); null and empty
    array are conflated per the reference's ``make_set``
    (/root/reference/bacon/cutting.py:788-796).
    """

    def _parse(self, s: str):
        # multi-valued filter args arrive pre-split by the DSL layer;
        # a single token parses to itself (element string)
        return s

    def lit(self, value) -> Column:
        if isinstance(value, (set, frozenset, list, tuple)):
            items = sorted(str(v) for v in value if v is not None and v != "")
            return F.array(*[F.lit(v) for v in items])
        return F.array(F.lit(str(value)))


# --------------------------------------------------------------------------
# Date hierarchy label family.
#
# Each label wraps a base date/timestamp column; `column()` uses built-in
# Spark date functions (the reference's SQL forms, SURVEY §1.2), and
# `parse` accepts both absolute tokens and relative offsets ("-6" = 6
# <units> ago, /root/reference/bacon/cubedef.py:836-844 etc.). "today" is
# injectable for deterministic tests.
# --------------------------------------------------------------------------

_RELATIVE_RE = re.compile(r"^[+-]\d+$")


class _DatePartLabel(Label):
    """Base for the date hierarchy family; subclasses set the column fn."""

    #: unit for relative offsets; None = no relative parsing
    relative_unit: str | None = None

    def __init__(self, name, base: str | Column, today: Callable[[], dt.date] | None = None, **kw):
        super().__init__(name, expr=None, **kw)
        self._base = base
        self._today = today or dt.date.today

    @property
    def base_column(self) -> Column:
        return F.col(self._base) if isinstance(self._base, str) else self._base

    #: SQL template for sql_expr(); {base} is the base column name
    sql_template: str | None = None
    #: per-dialect template overrides for engines where the Spark form
    #: isn't portable (e.g. DuckDB lacks to_date/yearofweek and numbers
    #: dayofweek from Sunday=0); falls back to sql_template. The shared
    #: default is read-only on purpose: subclasses that don't override it
    #: all alias this one object, so an in-place mutation would leak
    #: dialect overrides across every date label — override with a new
    #: dict per subclass instead.
    sql_templates: Mapping[str, str] = MappingProxyType({})

    def sql_expr(self, dialect: str = "spark") -> str:
        tmpl = self.sql_templates.get(dialect, self.sql_template)
        if tmpl and isinstance(self._base, str):
            return tmpl.format(base=self._base)
        return super().sql_expr(dialect)

    def column(self) -> Column:  # pragma: no cover - overridden
        raise NotImplementedError

    def _next_boundary(self, v):
        """The first truncation boundary strictly after *v* — defined only
        by MONOTONIC truncation labels (year/quarter/month/week/day/hour,
        where trunc(base) <= base < next_boundary(trunc(base))). Periodic
        part labels (month-of-year, weekday, ...) return None: a filter on
        them constrains no contiguous base range."""
        return None

    def sargable_extra(self, op, value):
        """Redundant raw-column predicate implied by ``trunc(base) OP value``
        — the reference's sargability rewrite
        (/root/reference/bacon/cubedef.py:728-741: add ``base >= v`` next to
        ``date_trunc(...) >= v`` so Postgres can use the raw-column index).
        Spark analogue: ``date_trunc(base) >= v`` is an opaque expression the
        parquet reader can't skip on, while the implied raw bound reaches
        PushedFilters, enabling row-group min/max skipping and partition
        pruning when data is laid out by the base column.

        Soundness (superset): trunc(base) <= base always, and any base in
        the bucket of v is < next_boundary(v); the extra predicate never
        removes a row the label predicate keeps."""
        if value is None or op not in ("ge", "gt", "le", "lt", "eq"):
            return None
        nb = self._next_boundary(value)
        if nb is None:
            return None
        base = self.base_column
        if op == "ge":
            return base >= F.lit(value)
        if op == "gt":
            # trunc(base) > v  =>  trunc(base) >= next boundary  =>  base >= it
            return base >= F.lit(nb)
        if op in ("le", "lt"):
            return base < F.lit(nb)
        return (base >= F.lit(value)) & (base < F.lit(nb))  # eq

    def parse(self, s: str):
        if self.relative_unit and _RELATIVE_RE.match(s):
            return self._relative(int(s))
        return super().parse(s)

    def _relative(self, offset: int):
        raise NotImplementedError

    @staticmethod
    def _parse_date(s: str, name: str) -> dt.date:
        try:
            return dt.datetime.strptime(s, "%Y-%m-%d").date()
        except ValueError:
            raise DataError(f"invalid date for '{name}': {s!r}")


class YearLabel(_DatePartLabel):
    """date_trunc('year') (/root/reference/bacon/cubedef.py:788-807)."""

    sql_template = "cast(date_trunc('year', {base}) as date)"

    def column(self):
        return F.date_trunc("year", self.base_column).cast("date")

    def _next_boundary(self, v):
        return dt.date(v.year + 1, 1, 1)

    def _parse(self, s):
        try:
            return dt.date(int(s), 1, 1)
        except ValueError:
            raise DataError(f"invalid year for '{self.name}': {s!r}")

    def _unparse(self, v):
        return str(v.year)

    def pretty(self, v):
        return "(none)" if v is None else str(v.year)


class ISOYearLabel(_DatePartLabel):
    """extract(yearofweek) (/root/reference/bacon/cubedef.py:810-820)."""

    sql_template = "extract(yearofweek from {base})"
    sql_templates = {"duckdb": "isoyear({base})"}

    def column(self):
        return F.expr(f"extract(yearofweek from {self._sql_base()})").cast("int")

    def _sql_base(self):
        if isinstance(self._base, str):
            return self._base
        raise QueryError("ISOYearLabel needs a named base column")

    def _parse(self, s):
        return IntLabel._parse(self, s)


class MonthLabel(_DatePartLabel):
    """date_trunc('month'); relative '-6' = 6 months ago
    (/root/reference/bacon/cubedef.py:823-852)."""

    sql_template = "cast(date_trunc('month', {base}) as date)"

    relative_unit = "month"

    def column(self):
        return F.date_trunc("month", self.base_column).cast("date")

    def _next_boundary(self, v):
        return dt.date(v.year + v.month // 12, v.month % 12 + 1, 1)

    def _parse(self, s):
        d = self._parse_date(s if len(s) > 7 else s + "-01", self.name)
        return d.replace(day=1)

    def _unparse(self, v):
        return v.strftime("%Y-%m")

    def _relative(self, offset):
        t = self._today()
        m = t.year * 12 + (t.month - 1) + offset
        return dt.date(m // 12, m % 12 + 1, 1)

    def pretty(self, v):
        return "(none)" if v is None else v.strftime("%b %Y")


class MonthOfYearLabel(_DatePartLabel):
    """date_part('month') -> 1..12 (/root/reference/bacon/cubedef.py:855-868)."""

    sql_template = "month({base})"

    def column(self):
        return F.month(self.base_column)

    def _parse(self, s):
        return IntLabel._parse(self, s)

    def pretty(self, v):
        return "(none)" if v is None else dt.date(2000, int(v), 1).strftime("%B")


class QuarterLabel(_DatePartLabel):
    """date_trunc('quarter'); relative quarters-ago
    (/root/reference/bacon/cubedef.py:871-901)."""

    sql_template = "cast(date_trunc('quarter', {base}) as date)"

    relative_unit = "quarter"

    def column(self):
        return F.date_trunc("quarter", self.base_column).cast("date")

    def _next_boundary(self, v):
        m = ((v.month - 1) // 3 + 1) * 3 + 1  # first month after v's quarter
        return dt.date(v.year + (m - 1) // 12, (m - 1) % 12 + 1, 1)

    def _parse(self, s):
        d = self._parse_date(s if len(s) > 7 else s + "-01", self.name)
        return d.replace(month=(d.month - 1) // 3 * 3 + 1, day=1)

    def _unparse(self, v):
        return f"{v.year}-{(v.month - 1) // 3 + 1:02d}"

    def _relative(self, offset):
        t = self._today()
        q = t.year * 4 + (t.month - 1) // 3 + offset
        return dt.date(q // 4, q % 4 * 3 + 1, 1)

    def pretty(self, v):
        return "(none)" if v is None else f"Q{(v.month - 1) // 3 + 1} {v.year}"


class QuarterNumLabel(_DatePartLabel):
    """date_part('quarter') -> 1..4.

    NB the reference's in-memory ``classify`` returns the quarter's first
    month (1/4/7/10) while its SQL form and ``parse`` use 1..4
    (/root/reference/bacon/cubedef.py:904-914) — a latent inconsistency; we
    implement the documented SQL semantics (1..4), per SURVEY §7.
    """

    sql_template = "quarter({base})"

    def column(self):
        return F.quarter(self.base_column)

    def _parse(self, s):
        v = IntLabel._parse(self, s)
        if not 1 <= v <= 4:
            raise DataError(f"quarter out of range for '{self.name}': {s!r}")
        return v

    def pretty(self, v):
        return "(none)" if v is None else f"Q{v}"


class WeekLabel(_DatePartLabel):
    """date_trunc('week') = Monday of week; relative weeks-ago
    (/root/reference/bacon/cubedef.py:917-949)."""

    sql_template = "cast(date_trunc('week', {base}) as date)"

    relative_unit = "week"

    def column(self):
        return F.date_trunc("week", self.base_column).cast("date")

    def _next_boundary(self, v):
        monday = v - dt.timedelta(days=v.weekday())
        return monday + dt.timedelta(days=7)

    def _parse(self, s):
        d = self._parse_date(s, self.name)
        return d - dt.timedelta(days=d.weekday())

    def _relative(self, offset):
        t = self._today()
        monday = t - dt.timedelta(days=t.weekday())
        return monday + dt.timedelta(weeks=offset)

    def pretty(self, v):
        return "(none)" if v is None else "wk " + v.strftime("%Y-%m-%d")


class ISOWeekNumLabel(_DatePartLabel):
    """date_part('week') ISO week number (/root/reference/bacon/cubedef.py:952-966)."""

    sql_template = "weekofyear({base})"

    def column(self):
        return F.weekofyear(self.base_column)

    def _parse(self, s):
        return IntLabel._parse(self, s)


class DayLabel(_DatePartLabel):
    """Raw date (no trunc — index-friendliness note in the reference,
    /root/reference/bacon/cubedef.py:969-1011); relative days-ago."""

    sql_template = "to_date({base})"
    sql_templates = {"duckdb": "cast({base} as date)"}

    relative_unit = "day"

    def column(self):
        return F.to_date(self.base_column)

    def _next_boundary(self, v):
        return v + dt.timedelta(days=1)

    def _parse(self, s):
        return self._parse_date(s, self.name)

    def _relative(self, offset):
        return self._today() + dt.timedelta(days=offset)


class DOYLabel(_DatePartLabel):
    """Day of year 1..366.

    The reference's in-memory form uses ``isocalendar()[2]`` (= ISO weekday,
    a latent bug) while its SQL form is ``date_part('doy')``
    (/root/reference/bacon/cubedef.py:1015-1025); we implement the SQL
    semantics per SURVEY §7.
    """

    sql_template = "dayofyear({base})"

    def column(self):
        return F.dayofyear(self.base_column)

    def _parse(self, s):
        return IntLabel._parse(self, s)


class HourLabel(_DatePartLabel):
    """date_trunc('hour'); relative hours-ago
    (/root/reference/bacon/cubedef.py:1028-1046)."""

    sql_template = "date_trunc('hour', {base})"

    relative_unit = "hour"

    def column(self):
        return F.date_trunc("hour", self.base_column)

    def _next_boundary(self, v):
        floor = v.replace(minute=0, second=0, microsecond=0)
        return floor + dt.timedelta(hours=1)

    def _parse(self, s):
        try:
            return dt.datetime.strptime(s, "%Y-%m-%dT%H")
        except ValueError:
            raise DataError(f"invalid hour for '{self.name}': {s!r}")

    def _unparse(self, v):
        return v.strftime("%Y-%m-%dT%H")

    def _relative(self, offset):
        now = dt.datetime.combine(self._today(), dt.time(0))
        return now + dt.timedelta(hours=offset)


class WeekdayLabel(_DatePartLabel):
    """ISO day-of-week 1=Monday..7=Sunday.

    Spark's ``dayofweek`` is 1=Sunday (/root/reference numbering is
    isodow, /root/reference/bacon/cubedef.py:1049-1062), so remap with
    ``(dayofweek + 5) % 7 + 1`` — SURVEY §1.2 flags this.
    """

    sql_template = "(dayofweek({base}) + 5) % 7 + 1"
    # DuckDB numbers dayofweek from Sunday=0 (Spark: Sunday=1), so the
    # Spark remap evaluated there is off by one day; isodow IS the ISO
    # weekday this label defines
    sql_templates = {"duckdb": "isodow({base})"}

    _NAMES = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"]

    def column(self):
        return ((F.dayofweek(self.base_column) + 5) % 7 + 1).cast("int")

    def _parse(self, s):
        v = IntLabel._parse(self, s)
        if not 1 <= v <= 7:
            raise DataError(f"weekday out of range for '{self.name}': {s!r}")
        return v

    def pretty(self, v):
        return "(none)" if v is None else self._NAMES[int(v) - 1]


class MonthdayLabel(_DatePartLabel):
    """date_part('day') 1..31 (/root/reference/bacon/cubedef.py:1065-1075)."""

    sql_template = "dayofmonth({base})"

    def column(self):
        return F.dayofmonth(self.base_column)

    def _parse(self, s):
        return IntLabel._parse(self, s)


# --------------------------------------------------------------------------
# Measures
# --------------------------------------------------------------------------


class Measure(Label):
    """A label with an accumulator: a named aggregate expression.

    Reference Measure (/root/reference/bacon/cubedef.py:1078-1088); the
    default accumulator is Sum (plain labels used as values default to
    Group, /root/reference/bacon/cubedef.py:281).
    """

    def __init__(self, name, expr=None, acc=None, **kw):
        super().__init__(name, expr=expr, **kw)
        if acc is None:
            from .accumulators import Sum

            acc = Sum()
        self.acc = acc

    def agg_column(self) -> Column:
        """The final aggregate Column (aliased by the engine)."""
        return self.acc.agg(self.column())


class RatioMeasure(Measure):
    """sum(num)/sum(den) measure (reference AttributeRatioMeasure,
    /root/reference/bacon/cubedef.py:1098-1119 + RatioSum accumulator,
    /root/reference/bacon/accumulators.py:355-393).

    The per-record form (used when the ratio is displayed/filtered rather
    than aggregated) is sign-corrected ``num / |den|`` with null on
    null/zero denominator, exactly the reference's ``extract``."""

    def __init__(self, name, num, den, **kw):
        from .accumulators import RatioSum

        def per_record() -> Column:
            n = F.expr(num) if isinstance(num, str) else num
            d = F.expr(den) if isinstance(den, str) else den
            return F.when(
                n.isNotNull() & d.isNotNull() & (d != 0), n / F.abs(d)
            )

        super().__init__(name, expr=per_record, acc=RatioSum(num, den), **kw)


class JsonLabel(Label):
    """Label extracting a JSON path from a string column (engine extension;
    the reference has no JSON scalars — SURVEY §2.9 'free in Spark')."""

    def __init__(self, name, source: str, path: str, cast: str | None = None, **kw):
        self.path = path
        self._cast = cast

        def extract() -> Column:
            c = F.get_json_object(F.col(source), path)
            return c.cast(cast) if cast else c

        super().__init__(name, expr=extract, **kw)
        self._source = source

    def sql_expr(self, dialect: str = "spark") -> str:
        fn = "json_extract_string" if dialect == "duckdb" else "get_json_object"
        base = f"{fn}({self._source}, '{self.path}')"
        return f"cast({base} as {self._cast})" if self._cast else base


# --------------------------------------------------------------------------
# CubeDef
# --------------------------------------------------------------------------


class CubeDef:
    """The cube schema: named labels + measures + a hierarchy DAG.

    Reference CubeDef (/root/reference/bacon/cubedef.py:61-185). The
    hierarchy DAG drives axis-insertion/drill UI logic only — execution is
    pure Spark. Implemented with adjacency dicts (no networkx).
    """

    def __init__(self, title: str = ""):
        self.title = title
        self._labels: dict[str, Label] = {}
        self._measures: dict[str, Measure] = {}
        # hierarchy DAG: child -> parents, parent -> children
        self._parents: dict[str, set[str]] = {}
        self._children: dict[str, set[str]] = {}

    # --- registry -------------------------------------------------------
    def add_label(self, label: Label) -> Label:
        if label.name in self._labels or label.name in self._measures:
            raise QueryError(f"duplicate label name: {label.name!r}")
        self._labels[label.name] = label
        if label.dimension is None:
            label.dimension = label.name
        if label.child_of:
            self.add_hierarchy(label.name, label.child_of)
        return label

    def add_measure(self, measure: Measure) -> Measure:
        if measure.name in self._labels or measure.name in self._measures:
            raise QueryError(f"duplicate measure name: {measure.name!r}")
        self._measures[measure.name] = measure
        return measure

    def get_label(self, name: str) -> Label:
        try:
            return self._labels[name]
        except KeyError:
            raise QueryError(f"unknown label: {name!r}")

    def get_value(self, name: str) -> Measure:
        if name in self._measures:
            return self._measures[name]
        # a plain label used as a value aggregates with Group
        # (/root/reference/bacon/cubedef.py:281)
        if name in self._labels:
            from .accumulators import Group

            lab = self._labels[name]
            return Measure(name, expr=lab.column, acc=Group())
        raise QueryError(f"unknown value: {name!r}")

    @property
    def labels(self) -> list[Label]:
        return list(self._labels.values())

    @property
    def measures(self) -> list[Measure]:
        return list(self._measures.values())

    # --- hierarchy (pure metadata) ---------------------------------------
    def add_hierarchy(self, child: str, parent: str) -> None:
        """Link child under parent, merging their dimensions.

        Conflicting explicit dimensions raise, matching the reference
        (/root/reference/bacon/cubedef.py:137-168); rank (drill depth) is
        re-propagated from the roots.
        """
        p = self.get_label(parent)
        self.get_label(child)
        self._parents.setdefault(child, set()).add(parent)
        self._children.setdefault(parent, set()).add(child)
        if self._has_cycle():
            self._parents[child].discard(parent)
            self._children[parent].discard(child)
            raise QueryError(f"hierarchy cycle: {child} -> {parent}")
        # merge dimension: parent's dimension wins for the whole component
        dim = p.dimension
        for n in self._component(child):
            self.get_label(n).dimension = dim
        self._repropagate_ranks()

    def _component(self, name: str) -> set[str]:
        seen = {name}
        stack = [name]
        while stack:
            n = stack.pop()
            for m in self._parents.get(n, set()) | self._children.get(n, set()):
                if m not in seen:
                    seen.add(m)
                    stack.append(m)
        return seen

    def _has_cycle(self) -> bool:
        WHITE, GRAY, BLACK = 0, 1, 2
        color = {n: WHITE for n in self._labels}

        def visit(n):
            color[n] = GRAY
            for m in self._children.get(n, ()):
                if color.get(m) == GRAY or (color.get(m) == WHITE and visit(m)):
                    return True
            color[n] = BLACK
            return False

        return any(color[n] == WHITE and visit(n) for n in list(color))

    def _repropagate_ranks(self) -> None:
        roots = [n for n in self._labels if not self._parents.get(n)]
        depth = {n: 0 for n in roots}
        stack = list(roots)
        while stack:
            n = stack.pop()
            for m in self._children.get(n, ()):
                d = depth[n] + 1
                if depth.get(m, -1) < d:
                    depth[m] = d
                    stack.append(m)
        for n, d in depth.items():
            self._labels[n].rank = d

    def ancestors(self, name: str) -> set[str]:
        """All transitive parents (/root/reference/bacon/graphs.py:4-37)."""
        out: set[str] = set()
        stack = [name]
        while stack:
            for p in self._parents.get(stack.pop(), ()):
                if p not in out:
                    out.add(p)
                    stack.append(p)
        return out

    def descendants(self, name: str) -> set[str]:
        out: set[str] = set()
        stack = [name]
        while stack:
            for c in self._children.get(stack.pop(), ()):
                if c not in out:
                    out.add(c)
                    stack.append(c)
        return out

    def same_dimension(self, a: str, b: str) -> bool:
        return self.get_label(a).dimension == self.get_label(b).dimension
