"""HTML table sink: stdlib renderer for Table1D / TablePivot with live
navigation links.

Re-expresses the reference's Django template stack
(/root/reference/bacon/django/templates/bacon/_table_1d.tmpl,
_table_pivot.tmpl, _table_pager.tmpl and the bacon_tags/bacon_nav
templatetags) without any template engine: the same CSS classes
(``bacon bacon-values`` / ``bacon bacon-pivot``, ``titles`` /
``values`` / ``totals`` / ``pager`` rows) and the same navigation
affordances — filter-by-value drill links on label cells, pivot (&#8599;)
and drop-axis (&#10005;) buttons on axis headers, order buttons and
hide-value buttons on value headers, page links — each emitting a DSL
query string via UrlQueryBuilder exactly like the JSON sink's LinkMap
URLs, so an HTML client and a JSON client navigate the identical query
space.

Driver-sized by construction: tables render the (paged, aggregated)
slice, never raw data, so this is presentation cost, not a data-path
operator.
"""

from __future__ import annotations

from html import escape

from ..builders.url import UrlQueryBuilder
from ..cubenav import Navigator
from .tables import Table1D, TablePivot, page_list

__all__ = ["render_table_html", "render_table_1d_html", "render_pivot_html"]


def _a(href: str, text: str, cls: str = "nav", title: str = "") -> str:
    t = f' title="{escape(title)}"' if title else ""
    return f'<a class="{cls}" href="?{escape(href)}"{t}>{text}</a>'


def _axis_header(cd, builder, nav, table, axis: str) -> str:
    lab = cd.get_label(axis)
    parts = []
    if getattr(lab, "allow_pivot", True):
        parts.append(
            _a(builder.unparse(nav.pivot(axis)), "&#8599;", "nav button", "Pivot on axis")
        )
    parts.append(f'<span class="label">{escape(lab.title)}</span>')
    parts.append(
        _a(
            builder.unparse(table.query.remove_axis(axis)),
            "&#10005;",
            "nav button",
            "Drop axis",
        )
    )
    return f'<th class="label">{"".join(parts)}</th>'


def _value_header(cd, builder, table, value: str) -> str:
    m = cd.get_value(value)
    up = builder.unparse(table.query.set_order(value, descending=False))
    down = builder.unparse(table.query.set_order(value, descending=True))
    hide = builder.unparse(table.query.hide_value(value))
    return (
        '<th class="value">'
        + _a(up, "&#9650;", "nav button", "Sort ascending")
        + _a(down, "&#9660;", "nav button", "Sort descending")
        + f'<span class="label">{escape(m.title)}</span>'
        + _a(hide, "&#10005;", "nav button", "Hide value")
        + "</th>"
    )


def _fmt(v) -> str:
    return "&#160;" if v is None else escape(str(v))


def _pager(builder, table) -> str:
    pages = page_list(table.page, table.nrows)
    if not pages:
        return ""
    cur = table.page.offset
    items = []
    for p in pages:
        label = str(p.offset // (p.limit or 1) + 1)
        q = builder.unparse(table.query) + "/" + p.unparse()
        cls = "page current" if p.offset == cur else "page"
        items.append(_a(q, label, cls))
    return f'<div class="pager">{"".join(items)}</div>'


def render_table_1d_html(table: Table1D) -> str:
    cd = table.board.cubedef
    builder = UrlQueryBuilder(cd)
    nav = Navigator(cd, table.query)

    out = ['<table class="bacon bacon-values">']
    head = ['<tr class="titles">']
    if not table.axes:
        head.append("<td class='empty-table'>Click on an axis to filter</td>")
    for a in table.axes:
        head.append(_axis_header(cd, builder, nav, table, a))
    for v in table.values:
        head.append(_value_header(cd, builder, table, v))
    head.append("</tr>")
    out.append("".join(head))

    for r in table.rows():
        cells = ['<tr class="values">']
        for a in table.axes:
            drill = builder.unparse(nav.drill(a, r[a]))
            cells.append(
                f'<td class="label">{_a(drill, _fmt(cd.get_label(a).pretty(r[a])), "nav", "Filter by value")}</td>'
            )
        for v in table.values:
            cells.append(f'<td class="value">{_fmt(r[v])}</td>')
        cells.append("</tr>")
        out.append("".join(cells))

    if table.values and table.axes:
        tot = table.totals()
        row = ['<tr class="totals">']
        row += ['<td class="label">&#160;</td>'] * len(table.axes)
        row += [f'<td class="value">{_fmt(tot.get(v))}</td>' for v in table.values]
        row.append("</tr>")
        out.append("".join(row))

    out.append("</table>")
    out.append(_pager(builder, table))
    return "".join(out)


def render_pivot_html(table: TablePivot) -> str:
    cd = table.board.cubedef
    builder = UrlQueryBuilder(cd)
    nav = Navigator(cd, table.query)
    nvals = len(table.values) or 1

    out = ['<table class="bacon bacon-pivot">']
    # one header band per pivot axis (reference _table_pivot.tmpl)
    for pi, paxis in enumerate(table.pivots):
        band = ['<tr class="pivot">']
        unp = builder.unparse(nav.unpivot(paxis))
        band.append(
            f'<th class="button" colspan="{max(len(table.row_axes), 1)}">'
            + _a(unp, "&#8601;", "nav button", "Unpivot axis")
            + f'<span class="label">{escape(cd.get_label(paxis).title)}</span></th>'
        )
        for combo in table.columns:
            pretty = cd.get_label(paxis).pretty(combo[pi])
            drill = builder.unparse(nav.drill(paxis, combo[pi]))
            band.append(
                f'<th class="value" colspan="{nvals}">{_a(drill, _fmt(pretty), "nav", "Filter by value")}</th>'
            )
        if pi == 0:
            band.append(
                f'<th class="value" colspan="{nvals}" rowspan="{len(table.pivots)}">Total</th>'
            )
        band.append("</tr>")
        out.append("".join(band))

    head = ['<tr class="titles">']
    for a in table.row_axes:
        head.append(_axis_header(cd, builder, nav, table, a))
    for _combo in table.columns:
        for v in table.values:
            head.append(f'<th class="value">{escape(cd.get_value(v).title)}</th>')
    for v in table.values:
        head.append(f'<th class="value total">{escape(cd.get_value(v).title)}</th>')
    head.append("</tr>")
    out.append("".join(head))

    for row_key in table.rows():
        tr = ['<tr class="values">']
        for a, val in zip(table.row_axes, row_key):
            drill = builder.unparse(nav.drill(a, val))
            tr.append(
                f'<td class="label">{_a(drill, _fmt(cd.get_label(a).pretty(val)), "nav", "Filter by value")}</td>'
            )
        for combo in table.columns:
            cell = table.cell(row_key, combo)
            for v in table.values:
                tr.append(f'<td class="value">{_fmt(cell.get(v) if cell else None)}</td>')
        rt = table.row_total(row_key)
        for v in table.values:
            tr.append(f'<td class="value total">{_fmt(rt.get(v) if rt else None)}</td>')
        tr.append("</tr>")
        out.append("".join(tr))

    # totals band: per-column totals + grand total
    tot = ['<tr class="totals">']
    tot += ['<td class="label">&#160;</td>'] * len(table.row_axes)
    for combo in table.columns:
        ct = table.col_total(combo)
        for v in table.values:
            tot.append(f'<td class="value">{_fmt(ct.get(v) if ct else None)}</td>')
    gt = table.grand_total()
    for v in table.values:
        tot.append(f'<td class="value total">{_fmt(gt.get(v))}</td>')
    tot.append("</tr>")
    out.append("".join(tot))

    out.append("</table>")
    return "".join(out)


def render_table_html(table) -> str:
    """Dispatch on table type (the reference's table.tmpl include switch)."""
    if isinstance(table, TablePivot):
        return render_pivot_html(table)
    return render_table_1d_html(table)
