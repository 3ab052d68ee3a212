"""Interactive navigation: the query-transform layer driving drill-down,
hierarchy-aware axis expansion, filter inversion, and detail views.

Re-expression of /root/reference/bacon/cubenav.py. Everything here is pure
query algebra over CubeQuery + the CubeDef hierarchy DAG — no Spark calls;
the engine executes whatever query navigation produces. Each method returns
a NEW query (queries are immutable, serializable via builders/url.py, and
every rendered link embeds one).
"""

from __future__ import annotations

from .cubedef import CubeDef
from .cubequery import INVERT_OP, RELATED_OPS, CubeQuery
from .errors import QueryError


class Navigator:
    def __init__(self, cubedef: CubeDef, query: CubeQuery):
        self.cubedef = cubedef
        self.query = query

    # --- drill / expand ---------------------------------------------------
    def drill(self, axis: str, value) -> CubeQuery:
        """Focus one value of an axis: add an eq filter and drop the axis
        (/root/reference/bacon/cubenav.py:164-174)."""
        return self.query.add_filter(axis, "eq", value).remove_axis(axis)

    def can_expand(self, name: str) -> bool:
        """A label may join the axes only if the axes already present from
        its dimension form a hierarchy chain with it
        (/root/reference/bacon/cubenav.py:49-94)."""
        label = self.cubedef.get_label(name)
        if name in self.query.axes:
            return False
        used = [
            a
            for a in self.query.axes
            if self.cubedef.get_label(a).dimension == label.dimension
        ]
        for a in used:
            related = self.cubedef.ancestors(a) | self.cubedef.descendants(a)
            if name not in related:
                return False
        return True

    def expand(self, name: str) -> CubeQuery:
        """Insert the label as an axis at its rank-correct position within
        its dimension (parents drill before children)."""
        if not self.can_expand(name):
            raise QueryError(f"cannot expand {name!r} on this query")
        label = self.cubedef.get_label(name)
        index = None
        for i, a in enumerate(self.query.axes):
            other = self.cubedef.get_label(a)
            if other.dimension == label.dimension and other.rank > label.rank:
                index = i
                break
        return self.query.add_axis(name, index=index)

    def collapse(self, name: str) -> CubeQuery:
        return self.query.remove_axis(name)

    # --- filters ------------------------------------------------------------
    def invert_filter(self, name: str, op: str, value) -> CubeQuery:
        return self.query.invert_filter((name, op, value))

    def related_ops(self, op: str) -> tuple[str, ...]:
        """Ops the UI may swap a filter to (same family)
        (/root/reference/bacon/cubequery.py:5-54)."""
        return RELATED_OPS.get(op, (op,))

    def swap_filter_op(self, name: str, op: str, value, new_op: str) -> CubeQuery:
        if new_op not in self.related_ops(op) and new_op != INVERT_OP.get(op):
            raise QueryError(f"cannot swap {op!r} to unrelated op {new_op!r}")
        return self.query.replace_filter((name, op, value), (name, new_op, value))

    def hide_value_of(self, axis: str, value) -> CubeQuery:
        """Hide one labeled value by merging it into an ``ni`` filter on its
        axis (/root/reference/bacon/cubenav.py:207-218)."""
        q = self.query
        for name, op, v in q.filters:
            if name == axis and op == "ni":
                newset = frozenset(v) | {value}
                return q.replace_filter((name, op, v), (name, op, newset))
        return q.add_filter(axis, "ni", frozenset({value}))

    def remove_dimension_filters(self, name: str) -> CubeQuery:
        """Drop all filters whose label shares the dimension of *name*
        (/root/reference/bacon/cubenav.py:252-269)."""
        dim = self.cubedef.get_label(name).dimension
        q = self.query
        for f in list(q.filters):
            if self.cubedef.get_label(f[0]).dimension == dim:
                q = q.remove_filter(f[0], f[1], f[2])
        return q

    # --- detail ------------------------------------------------------------
    def row_detail(self, axis_values: dict) -> CubeQuery:
        """De-aggregate one result row: filters-only query pinning each axis
        to the row's value (/root/reference/bacon/cubenav.py:176-185);
        execute with CuttingBoard.rows()."""
        q = self.query
        for axis, value in axis_values.items():
            q = q.add_filter(axis, "eq", value)
        for a in list(q.axes):
            q = q.remove_axis(a)
        return q

    # --- pivot -----------------------------------------------------------
    def pivot(self, name: str) -> CubeQuery:
        label = self.cubedef.get_label(name)
        if not label.allow_pivot:
            raise QueryError(f"label {name!r} cannot be pivoted")
        return self.query.set_pivot(name)

    def unpivot(self, name: str) -> CubeQuery:
        return self.query.unset_pivot(name)
