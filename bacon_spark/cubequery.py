"""CubeQuery: the immutable logical query.

Re-expression of /root/reference/bacon/cubequery.py:57-302 — ordered axes,
values (with a hidden set), ANDed filters, a single order key, and a pivot
set. Every mutator is copy-on-write and returns a new query (queries are
first-class reversible values: the navigation layer serializes one into
every rendered link). Execution maps a query to
``df.filter(...).groupBy(axes).agg(values).orderBy(...)`` in engine.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from .errors import QueryError

# Antonym map for filter inversion (reference invert_op,
# /root/reference/bacon/cubequery.py:5-54).
INVERT_OP = {
    "eq": "ne",
    "ne": "eq",
    "gt": "le",
    "le": "gt",
    "lt": "ge",
    "ge": "lt",
    "in": "ni",
    "ni": "in",
    "match": "nmatch",
    "nmatch": "match",
    "hasall": "hasnotall",
    "hasnotall": "hasall",
    "hasany": "hasnone",
    "hasnone": "hasany",
    "hasonly": "notequals",
    "equals": "notequals",
    "notequals": "equals",
    "subsetof": "notsubsetof",
    "notsubsetof": "subsetof",
    "supersetof": "notsupersetof",
    "notsupersetof": "supersetof",
    "disjointfrom": "intersects",
    "intersects": "disjointfrom",
}

# Related-op families: the UI lets users swap a filter's op within its
# family (reference related ops, /root/reference/bacon/cubequery.py:5-54).
RELATED_OPS = {
    **dict.fromkeys(["eq", "ne", "gt", "ge", "lt", "le"], ("eq", "ne", "gt", "ge", "lt", "le")),
    **dict.fromkeys(["in", "ni"], ("in", "ni")),
    **dict.fromkeys(["match", "nmatch"], ("match", "nmatch")),
    **dict.fromkeys(
        [
            "hasall",
            "hasany",
            "hasnone",
            "hasonly",
            "hasnotall",
            "subsetof",
            "notsubsetof",
            "supersetof",
            "notsupersetof",
            "disjointfrom",
            "intersects",
            "equals",
            "notequals",
        ],
        (
            "hasall",
            "hasany",
            "hasnone",
            "hasonly",
            "hasnotall",
            "subsetof",
            "notsubsetof",
            "supersetof",
            "notsupersetof",
            "disjointfrom",
            "intersects",
            "equals",
            "notequals",
        ),
    ),
}

#: multi-argument ops whose DSL value is a frozenset
#: (/root/reference/bacon/constants.py:1-12)
MULTI_ARG_OPS = frozenset(
    [
        "in",
        "ni",
        "hasall",
        "hasany",
        "hasnone",
        "hasonly",
        "hasnotall",
        "subsetof",
        "notsubsetof",
        "supersetof",
        "notsupersetof",
        "disjointfrom",
        "intersects",
        "equals",
        "notequals",
    ]
)


Filter = tuple  # (label_name, op, value)


@dataclass(frozen=True)
class CubeQuery:
    """Immutable logical query (reference CubeQuery,
    /root/reference/bacon/cubequery.py:57-78)."""

    axes: tuple[str, ...] = ()
    values: tuple[str, ...] = ()  # ordered; includes hidden ones
    hidden_values: frozenset[str] = frozenset()
    filters: tuple[Filter, ...] = ()  # ANDed
    order: tuple | None = None  # (sign, value_name, pivot_values)
    pivots: tuple[str, ...] = ()  # trailing axes rendered as columns

    # --- axes ------------------------------------------------------------
    def add_axis(self, name: str, index: int | None = None) -> CubeQuery:
        if name in self.axes:
            return self
        axes = list(self.axes)
        axes.insert(len(axes) if index is None else index, name)
        return replace(self, axes=tuple(axes))

    def remove_axis(self, name: str) -> CubeQuery:
        return replace(
            self,
            axes=tuple(a for a in self.axes if a != name),
            pivots=tuple(p for p in self.pivots if p != name),
        )

    # --- values ----------------------------------------------------------
    @property
    def all_values(self) -> tuple[str, ...]:
        return self.values

    @property
    def visible_values(self) -> tuple[str, ...]:
        """Hidden-but-computed values feed other measures but aren't shown
        (/root/reference/bacon/cutting.py:752-770)."""
        return tuple(v for v in self.values if v not in self.hidden_values)

    def add_value(self, name: str, visible: bool = True) -> CubeQuery:
        values = self.values if name in self.values else self.values + (name,)
        hidden = set(self.hidden_values)
        (hidden.discard if visible else hidden.add)(name)
        return replace(self, values=values, hidden_values=frozenset(hidden))

    def remove_value(self, name: str) -> CubeQuery:
        return replace(
            self,
            values=tuple(v for v in self.values if v != name),
            hidden_values=self.hidden_values - {name},
        )

    def hide_value(self, name: str) -> CubeQuery:
        return self.add_value(name, visible=False)

    # --- filters ---------------------------------------------------------
    def add_filter(self, name: str, op: str, value) -> CubeQuery:
        f = (name, op, value)
        if f in self.filters:
            return self
        return replace(self, filters=self.filters + (f,))

    def remove_filter(self, name: str, op: str | None = None, value=...) -> CubeQuery:
        def keep(f):
            if f[0] != name:
                return True
            if op is not None and f[1] != op:
                return True
            if value is not ... and f[2] != value:
                return True
            return False

        return replace(self, filters=tuple(f for f in self.filters if keep(f)))

    def replace_filter(self, old: Filter, new: Filter) -> CubeQuery:
        """Replace the FIRST matching filter (UI swap semantics; replacing
        all occurrences would make invert non-self-inverse when a filter
        and its antonym coexist)."""
        out = []
        done = False
        for f in self.filters:
            if not done and f == tuple(old):
                out.append(new)
                done = True
            else:
                out.append(f)
        return replace(self, filters=tuple(out))

    def invert_filter(self, f: Filter) -> CubeQuery:
        """Swap a filter for its antonym
        (/root/reference/bacon/cubequery.py:183-200)."""
        name, op, value = f
        try:
            inv = INVERT_OP[op]
        except KeyError:
            raise QueryError(f"operator {op!r} has no antonym")
        return self.replace_filter(f, (name, inv, value))

    # --- order -----------------------------------------------------------
    def set_order(self, value_name: str, descending: bool = False, pivot_values: tuple = ()) -> CubeQuery:
        """Order rows by a measure's total, or by the measure within one
        pivot column group (/root/reference/bacon/cubequery.py:278-302)."""
        sign = -1 if descending else 1
        return replace(self, order=(sign, value_name, tuple(pivot_values)))

    def unset_order(self) -> CubeQuery:
        return replace(self, order=None)

    # --- pivot -----------------------------------------------------------
    def set_pivot(self, name: str) -> CubeQuery:
        """Move the axis to the end and mark it pivoted
        (/root/reference/bacon/cubequery.py:253-276)."""
        if name not in self.axes:
            raise QueryError(f"cannot pivot non-axis {name!r}")
        axes = tuple(a for a in self.axes if a != name) + (name,)
        pivots = tuple(p for p in self.pivots if p != name) + (name,)
        # keep pivots as the trailing axes, in axis order
        return replace(self, axes=axes, pivots=pivots)

    def unset_pivot(self, name: str) -> CubeQuery:
        """Axis stays, stops being a column
        (/root/reference/bacon/cubequery.py:267-276)."""
        return replace(self, pivots=tuple(p for p in self.pivots if p != name))

    @property
    def row_axes(self) -> tuple[str, ...]:
        return tuple(a for a in self.axes if a not in self.pivots)

    def __repr__(self):  # pragma: no cover
        parts = []
        if self.axes:
            parts.append(f"axes={list(self.axes)}")
        if self.values:
            parts.append(f"values={list(self.values)}")
        if self.filters:
            parts.append(f"filters={list(self.filters)}")
        if self.order:
            parts.append(f"order={self.order}")
        if self.pivots:
            parts.append(f"pivots={list(self.pivots)}")
        return f"CubeQuery({', '.join(parts)})"
