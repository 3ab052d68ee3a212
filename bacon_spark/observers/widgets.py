"""Navigation widgets: URL-template generators for interactive panels.

Re-expresses /root/reference/bacon/observers/nav.py (NavWidget,
DatesRangeWidget, StringFilterWidget, ButtonsWidget, Button,
FixedQueryButton, FilterButton): each widget turns the CURRENT query into
a small set of URL templates a UI binds its inputs to — the range picker
gets ``__from__``/``__to__`` placeholders, the text filter gets
``__PLACEHOLDER__``, buttons get concrete query URLs. Pure driver-side
metadata; no data path involved.

The placeholder mechanism is the reference's own trick verbatim-in-
spirit: serialize a sentinel value (year-8192 dates / a sentinel string)
through the real DSL unparser, then textually swap the sentinel for the
template marker — which keeps every other part of the URL exactly what
the parser will accept back.
"""

from __future__ import annotations

import datetime as dt

from ..builders.url import UrlQueryBuilder
from ..cubenav import Navigator
from ..cubequery import CubeQuery

__all__ = [
    "NavWidget",
    "DatesRangeWidget",
    "StringFilterWidget",
    "ButtonsWidget",
    "Button",
    "FixedQueryButton",
    "FilterButton",
    "render_widgets_json",
]

_FROM = dt.date(8192, 1, 1)
_TO = dt.date(8192, 12, 31)


class NavWidget:
    """Base widget (reference nav.py:14-19)."""

    type = "widget"

    def __init__(self, label: str):
        self.label = label

    def render(self, cubedef, query: CubeQuery, builder: UrlQueryBuilder) -> dict:
        return {"type": self.type, "label": self.label}


class DatesRangeWidget(NavWidget):
    """Two-date range selector over a date axis (reference nav.py:21-68):
    four URL templates — clear, from-only, to-only, both — with
    ``__from__`` / ``__to__`` placeholders for the UI to substitute."""

    type = "dates_range"

    def __init__(self, label: str, axis: str):
        super().__init__(label)
        self.axis = axis

    def render(self, cubedef, query, builder) -> dict:
        nav = Navigator(cubedef, query)
        q0 = nav.remove_dimension_filters(self.axis)
        q1 = q0.add_filter(self.axis, "ge", _FROM)
        q2 = q0.add_filter(self.axis, "le", _TO)
        q3 = q1.add_filter(self.axis, "le", _TO)
        sub = lambda u: u.replace("8192-01-01", "__from__").replace(  # noqa: E731
            "8192-12-31", "__to__"
        )
        return {
            **super().render(cubedef, query, builder),
            "axis": self.axis,
            "clear_url": builder.unparse(q0),
            "from_url": sub(builder.unparse(q1)),
            "to_url": sub(builder.unparse(q2)),
            "range_url": sub(builder.unparse(q3)),
        }


class StringFilterWidget(NavWidget):
    """Free-text filter box over an axis (reference nav.py:70-89)."""

    type = "string_filter"

    def __init__(self, label: str, axis: str, op: str = "eq"):
        super().__init__(label)
        self.axis = axis
        self.op = op

    def render(self, cubedef, query, builder) -> dict:
        nav = Navigator(cubedef, query)
        q0 = nav.remove_dimension_filters(self.axis)
        q1 = q0.add_filter(self.axis, self.op, "__PLACEHOLDER__")
        return {
            **super().render(cubedef, query, builder),
            "axis": self.axis,
            "op": self.op,
            "clear_url": builder.unparse(q0),
            "filter_url": builder.unparse(q1),
        }


class Button:
    """A clickable redirect to a derived query (reference nav.py:99-112)."""

    def __init__(self, label: str, image_url: str | None = None):
        self.label = label
        self.image_url = image_url

    def get_query(self, cubedef, query: CubeQuery) -> CubeQuery:
        return query

    def render(self, cubedef, query, builder) -> dict:
        out = {
            "label": self.label,
            "url": builder.unparse(self.get_query(cubedef, query)),
        }
        if self.image_url:
            out["image_url"] = self.image_url
        return out


class FixedQueryButton(Button):
    """Always the same query (reference nav.py:115-123)."""

    def __init__(self, label: str, query: CubeQuery, **kw):
        super().__init__(label, **kw)
        self._query = query

    def get_query(self, cubedef, query):
        return self._query


class FilterButton(Button):
    """Swap one filter value on the current query (reference
    nav.py:126-145); value REMOVE clears the axis filter."""

    REMOVE = "__REMOVE__"

    def __init__(self, label: str, axis: str, value, op: str = "eq", **kw):
        super().__init__(label, **kw)
        self.axis = axis
        self.value = value
        self.op = op

    def get_query(self, cubedef, query):
        q = query.remove_filter(self.axis)
        if self.value != self.REMOVE:
            q = q.add_filter(self.axis, self.op, self.value)
        return q


class ButtonsWidget(NavWidget):
    """A labeled group of buttons (reference nav.py:92-97)."""

    type = "buttons"

    def __init__(self, label: str, buttons: list[Button]):
        super().__init__(label)
        self.buttons = buttons

    def render(self, cubedef, query, builder) -> dict:
        return {
            **super().render(cubedef, query, builder),
            "buttons": [b.render(cubedef, query, builder) for b in self.buttons],
        }


def render_widgets_json(cubedef, query: CubeQuery, widgets: list[NavWidget]) -> list[dict]:
    builder = UrlQueryBuilder(cubedef)
    return [w.render(cubedef, query, builder) for w in widgets]
