"""Framework-free bodies of the Django template tags.

The reference ships ``{% load bacon_tags %}`` / ``{% load bacon_nav %}``
(/root/reference/bacon/django/templatetags/bacon_tags.py:1-155,
bacon_nav.py:1-62): URL helpers that turn a rendered table plus a
label/value into the next navigation query, and HTML-snippet tags that
render tables, pagers, and nav widgets inside a template. This module
holds those tag BODIES with no Django import — each takes our rendered
table objects (observers/tables.Table1D / TablePivot) or (cubedef,
query) pairs and returns a DSL URL string or an HTML snippet — and
``bacon_spark/templatetags/bacon_tags.py`` registers thin Django
wrappers around them (same lazy-optional-Django policy as
observers/django_http). Tests drive these bodies directly, so the tag
logic is exercised even in Django-less environments.

URL semantics are single-sourced: every helper delegates to the same
Navigator / CubeQuery methods the HTML renderer (observers/html.py) and
the JSON LinkMap use, so a template user, an HTML client, and a JSON
client navigate the identical query space.
"""

from __future__ import annotations

from html import escape

from ..builders.url import UrlQueryBuilder
from ..cubenav import Navigator
from .html import render_pivot_html, render_table_1d_html, render_table_html
from .tables import Page, Table1D, TablePivot, page_list
from .widgets import NavWidget

__all__ = [
    "query_url",
    "filter_url",
    "hide_value_url",
    "hide_labeled_value_url",
    "pivot_url",
    "unpivot_url",
    "drop_axis_url",
    "order_url",
    "order_asc_url",
    "reset_order_url",
    "to_page_url",
    "table_html",
    "table_1d_html",
    "table_pivot_html",
    "pager_html",
    "nav_panel_html",
    "widget_html",
]


def _builder(table) -> UrlQueryBuilder:
    return UrlQueryBuilder(table.board.cubedef)


def _nav(table) -> Navigator:
    return Navigator(table.board.cubedef, table.query)


# --- URL tags (reference bacon_tags.py:11-55) ------------------------------


def query_url(table, query) -> str:
    """DSL URL for an arbitrary query (reference ``query_url``)."""
    return _builder(table).unparse(query)


def filter_url(table, axis: str, value) -> str:
    """Drill: filter the table's query by (axis eq value) — the link every
    label cell carries (reference ``filter_url``/``filter_url2``)."""
    return _builder(table).unparse(_nav(table).drill(axis, value))


def hide_value_url(table, value_name: str) -> str:
    """Hide a measure column (reference ``hide_value_url``)."""
    return _builder(table).unparse(table.query.hide_value(value_name))


def hide_labeled_value_url(table, axis: str, value) -> str:
    """Hide ONE labeled value: merge into the axis ``ni`` filter set
    (reference ``hide_labeled_value_url`` -> cubenav.hide_value_of)."""
    return _builder(table).unparse(_nav(table).hide_value_of(axis, value))


def pivot_url(table, axis: str) -> str:
    return _builder(table).unparse(_nav(table).pivot(axis))


def unpivot_url(table, axis: str) -> str:
    return _builder(table).unparse(_nav(table).unpivot(axis))


def drop_axis_url(table, axis: str) -> str:
    return _builder(table).unparse(table.query.remove_axis(axis))


def order_url(table, value_name: str, pivot_values: tuple = ()) -> str:
    """Order by a measure, descending first (reference ``order_url``)."""
    return _builder(table).unparse(
        table.query.set_order(value_name, descending=True, pivot_values=pivot_values)
    )


def order_asc_url(table, value_name: str, pivot_values: tuple = ()) -> str:
    return _builder(table).unparse(
        table.query.set_order(value_name, descending=False, pivot_values=pivot_values)
    )


def reset_order_url(table) -> str:
    return _builder(table).unparse(table.query.unset_order())


def to_page_url(table, n: int) -> str:
    """URL of 0-based page *n* at the table's current page size
    (reference ``to_page_url`` -> Table.to_string_page)."""
    limit = table.page.limit or table.nrows or 1
    p = Page(limit=table.page.limit, offset=n * limit, nrows=table.nrows)
    return _builder(table).unparse(table.query) + "/" + p.unparse()


# --- HTML-snippet tags (reference bacon_tags.py:58-135) ---------------------


def table_html(table) -> str:
    """Render whichever table shape was built — the reference's ``table``
    tag's pivot/1d dispatch."""
    return render_table_html(table)


def table_1d_html(table: Table1D) -> str:
    return render_table_1d_html(table)


def table_pivot_html(table: TablePivot) -> str:
    return render_pivot_html(table)


def pager_html(table) -> str:
    """Page-link strip (reference ``pager`` tag / _table_pager.tmpl)."""
    builder = _builder(table)
    pages = page_list(table.page, table.nrows)
    if not pages:
        return ""
    items = []
    for p in pages:
        label = str(p.offset // (p.limit or 1) + 1)
        href = builder.unparse(table.query) + "/" + p.unparse()
        cls = "page current" if p.offset == table.page.offset else "page"
        items.append(f'<a class="{cls}" href="?{escape(href)}">{label}</a>')
    return f'<div class="pager">{"".join(items)}</div>'


# --- nav widget tags (reference bacon_nav.py / nav_panels) ------------------


def widget_html(cubedef, query, widget: NavWidget) -> str:
    """One nav widget as an HTML snippet (reference bacon_nav.widget):
    the widget's render dict — URL templates with ``__from__``/``__to__``
    or ``__PLACEHOLDER__`` markers, or concrete button URLs — laid out as
    a labeled fieldset a UI binds its inputs to. Dispatches on widget
    type like the reference's render_{ClassName} lookup."""
    builder = UrlQueryBuilder(cubedef)
    d = widget.render(cubedef, query, builder)
    body: list[str] = []
    if d["type"] == "buttons":
        for b in d["buttons"]:
            img = (
                f'<img src="{escape(b["image_url"])}" alt=""/>'
                if b.get("image_url")
                else ""
            )
            body.append(
                f'<a class="nav button" href="?{escape(b["url"])}">'
                f'{img}{escape(b["label"])}</a>'
            )
    elif d["type"] == "dates_range":
        body.append(
            f'<form class="bacon-dates-range" data-axis="{escape(d["axis"])}" '
            f'data-from-url="?{escape(d["from_url"])}" '
            f'data-to-url="?{escape(d["to_url"])}" '
            f'data-range-url="?{escape(d["range_url"])}">'
            '<input name="from"/><input name="to"/>'
            f'<a class="nav button" href="?{escape(d["clear_url"])}">clear</a>'
            "</form>"
        )
    elif d["type"] == "string_filter":
        body.append(
            f'<form class="bacon-string-filter" data-axis="{escape(d["axis"])}" '
            f'data-op="{escape(d["op"])}" '
            f'data-filter-url="?{escape(d["filter_url"])}">'
            '<input name="value"/>'
            f'<a class="nav button" href="?{escape(d["clear_url"])}">clear</a>'
            "</form>"
        )
    else:  # plain NavWidget: label only
        pass
    return (
        f'<fieldset class="bacon-widget bacon-{escape(d["type"])}">'
        f'<legend>{escape(d["label"])}</legend>{"".join(body)}</fieldset>'
    )


def nav_panel_html(cubedef, query, widgets: list[NavWidget]) -> str:
    """The whole widget panel (reference ``nav_panels`` tag)."""
    parts = [widget_html(cubedef, query, w) for w in widgets]
    return f'<div class="bacon-nav">{"".join(parts)}</div>'
