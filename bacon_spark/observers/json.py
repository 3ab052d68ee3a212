"""JSON sink: table + navigation links -> JSON-able dict.

Reference /root/reference/bacon/observers/json.py:140-154,355-370: every
cell carries serialized queries for its drill/pivot/hide actions, deduped
through a link map. The links ARE the navigation API: a client can walk the
whole cube by following them.

Pagination is KEYSET-first: ``render_keyset_table_json`` and the rows
endpoint emit an opaque ``after`` token (the last row's composite key)
instead of an offset — the reference's ``limit:offset`` page state
(/root/reference/bacon/observers/tables.py:16-130) scans and discards
``offset`` rows per page, which at 100 TB makes page N cost N; the seek
predicate is sargable and constant-cost per page (engine.keyset_page).
Offset paging remains available through Table1D for small, UI-bounded
aggregate results.
"""

from __future__ import annotations

import datetime as dt
import json as _json
from typing import Any

from pyspark.sql import types as T

from ..builders.url import UrlQueryBuilder
from ..cubenav import Navigator
from .tables import Table1D


class LinkMap:
    """Deduplicating link registry (reference LinkMap,
    /root/reference/bacon/observers/json.py:355-370): cells reference links
    by index; identical queries share an entry."""

    def __init__(self):
        self._links: list[str] = []
        self._index: dict[str, int] = {}

    def add(self, url: str) -> int:
        i = self._index.get(url)
        if i is None:
            i = len(self._links)
            self._links.append(url)
            self._index[url] = i
        return i

    @property
    def links(self) -> list[str]:
        return self._links


def _jsonable(v: Any) -> Any:
    if isinstance(v, (dt.date, dt.datetime)):
        return v.isoformat()
    return v


def render_table_json(table: Table1D, with_links: bool = True) -> dict:
    """Render a 1-D table to a JSON-able dict; each row gets drill links
    per axis cell."""
    cd = table.board.cubedef
    builder = UrlQueryBuilder(cd)
    links = LinkMap()
    nav = Navigator(cd, table.query)

    rows = []
    for r in table.rows():
        cells = []
        for a in table.axes:
            cell = {"value": _jsonable(r[a]), "pretty": cd.get_label(a).pretty(r[a])}
            if with_links:
                cell["drill"] = links.add(builder.unparse(nav.drill(a, r[a])))
            cells.append(cell)
        values = {v: _jsonable(r[v]) for v in table.values}
        row = {"cells": cells, "values": values}
        if with_links and table.axes:
            # per-row de-aggregation link (reference RowWidget / row
            # detail, /root/reference/bacon/observers/tables.py:142-146,
            # cubenav.py:176-185): serve with CuttingBoard.rows()
            row["detail"] = links.add(
                builder.unparse(nav.row_detail({a: r[a] for a in table.axes}))
            )
        rows.append(row)

    out = {
        "title": cd.title,
        "query": builder.unparse(table.query),
        "header": table.header(),
        "rows": rows,
        "totals": {v: _jsonable(x) for v, x in table.totals().items()} if table.values else {},
        "nrows": table.nrows,
    }
    if with_links:
        out["links"] = links.links
    return out


# --- keyset (seek) pagination ----------------------------------------------


def encode_after(values: tuple) -> str:
    """Opaque after-token: the last row's composite key as compact JSON
    (dates/timestamps ISO-formatted)."""
    return _json.dumps([_jsonable(v) for v in values], separators=(",", ":"))


def decode_after(token: str | None, dtypes: list) -> tuple | None:
    """Parse an after-token back into typed key values using the frame's
    schema (the inverse of :func:`encode_after`)."""
    if not token:
        return None
    vals = _json.loads(token)
    if len(vals) != len(dtypes):
        from ..errors import QueryError

        raise QueryError(f"after-token arity {len(vals)} != key arity {len(dtypes)}")
    out = []
    for v, t in zip(vals, dtypes):
        if v is not None and isinstance(t, T.DateType):
            v = dt.date.fromisoformat(v)
        elif v is not None and isinstance(t, (T.TimestampType, T.TimestampNTZType)):
            v = dt.datetime.fromisoformat(v)
        out.append(v)
    return tuple(out)


def _keyset_next(params_q: str, keys: list[str], limit: int, raw_rows) -> dict | None:
    """The next-page params dict (None on the last page): client feeds it
    straight back to the endpoint. Emitting the TOKEN, not a page number,
    is what keeps page N constant-cost."""
    if len(raw_rows) < limit:
        return None
    last = raw_rows[-1]
    return {
        "q": params_q,
        "after": encode_after(tuple(last[k] for k in keys)),
        "limit": str(limit),
    }


def render_keyset_table_json(
    board, query, after: str | None = None, limit: int = 100, with_links: bool = True
) -> dict:
    """Aggregate table page via keyset paging: rows strictly after the
    *after* token in ascending axis order, plus the next-page token.

    The axes tuple uniquely keys a grouped result, so it IS the seek key.
    Ordering is plain ascending on the axis columns (label reverse/custom
    sort orders don't apply in keyset mode — a seek predicate needs the
    scan order and the page order to agree). Axis values must be non-null
    to appear after the first page (SQL three-valued logic drops them from
    ``>`` predicates) — aggregate away nulls or use offset paging for
    null-keyed grains."""
    from ..engine import keyset_page

    cd = board.cubedef
    builder = UrlQueryBuilder(cd)
    links = LinkMap()
    nav = Navigator(cd, query)
    axes = list(query.axes)
    if not axes:
        from ..errors import QueryError

        raise QueryError("keyset table paging needs at least one axis")
    values = query.visible_values

    df = board.slice(query).to_df()
    dtypes = [df.schema[a].dataType for a in axes]
    page_df = keyset_page(df, axes, decode_after(after, dtypes), limit)
    raw = page_df.collect()

    rows = []
    for r in raw:
        cells = []
        for a in axes:
            cell = {"value": _jsonable(r[a]), "pretty": cd.get_label(a).pretty(r[a])}
            if with_links:
                cell["drill"] = links.add(builder.unparse(nav.drill(a, r[a])))
            cells.append(cell)
        rows.append({"cells": cells, "values": {v: _jsonable(r[v]) for v in values}})

    qstr = builder.unparse(query)
    out = {
        "title": cd.title,
        "query": qstr,
        "header": [cd.get_label(a).title for a in axes]
        + [cd.get_value(v).title for v in values],
        "rows": rows,
        "next": _keyset_next(qstr, axes, limit, raw),
    }
    if with_links:
        out["links"] = links.links
    return out


def render_rows_json(board, query, keys: list[str], after: str | None = None, limit: int = 100) -> dict:
    """Raw-rows (de-aggregation) page via keyset paging over the base
    frame — the reference's TableDetails.rows surface
    (/root/reference/bacon/observers/tables.py:195-219, sql.py:340-370)
    re-expressed with the seek predicate instead of OFFSET. *keys* must
    uniquely identify rows (add a tiebreaker) and be non-null."""
    df_all = board.df
    dtypes = [df_all.schema[k].dataType for k in keys]
    page_df = board.rows_keyset(query, keys, decode_after(after, dtypes), limit)
    raw = page_df.collect()
    cols = page_df.columns
    qstr = UrlQueryBuilder(board.cubedef).unparse(query)
    nxt = _keyset_next(qstr, keys, limit, raw)
    if nxt is not None:
        nxt["keys"] = ",".join(keys)  # the next dict is the WHOLE request
    return {
        "query": qstr,
        "columns": cols,
        "rows": [[_jsonable(r[c]) for c in cols] for r in raw],
        "keys": keys,
        "next": nxt,
    }


# --- navigation panel -------------------------------------------------------

#: UI op labels (reference Navigator._pretty_op,
#: /root/reference/bacon/cubenav.py:137-160)
PRETTY_OP = {
    "eq": "=",
    "ne": "is not",
    "gt": ">",
    "ge": ">=",
    "lt": "<",
    "le": "<=",
    "in": "any of",
    "ni": "none of",
    "match": "matches",
    "nmatch": "doesn't match",
    "hasall": "has all of",
    "hasany": "has any of",
    "hasnone": "has none of",
    "hasonly": "has only",
}


def render_nav_json(cubedef, query: "CubeQuery", widgets: list | None = None) -> dict:
    """Navigation panel -> JSON-able dict (reference render_nav_json,
    /root/reference/bacon/observers/json.py:13-85): available axes grouped
    by dimension (expand URL when addable under the hierarchy rule, null
    when not), active filters with drop / invert / related-op-swap URLs,
    and hidden values with show URLs. Together with render_table_json this
    is the complete client API: a UI needs no query knowledge beyond
    following links."""
    from ..cubequery import MULTI_ARG_OPS

    builder = UrlQueryBuilder(cubedef)
    nav = Navigator(cubedef, query)

    # axes: reference ordering (dimension or sentinel-last, then rank)
    labels = [lab for lab in cubedef.labels if not lab.hidden]
    labels.sort(key=lambda lab: (lab.dimension or "￿", lab.rank))
    axes: list[dict] = []
    for lab in labels:
        dim = lab.dimension or "Other axes"
        if not axes or axes[-1]["dimension"] != dim:
            axes.append({"dimension": dim, "axes": []})
        url = (
            builder.unparse(nav.expand(lab.name)) if nav.can_expand(lab.name) else None
        )
        axes[-1]["axes"].append({"label": lab.title, "axis": lab.name, "url": url})

    filters = []
    for name, op, value in query.filters:
        lab = cubedef.get_label(name)
        if op in MULTI_ARG_OPS:
            pretty_value = ", ".join(
                lab.pretty(v) for v in sorted(value, key=lambda x: (x is None, x))
            )
        else:
            pretty_value = lab.pretty(value)
        pretty_op = PRETTY_OP.get(op, op)
        related = {}
        for other in nav.related_ops(op):
            if other == op:
                continue
            related[PRETTY_OP.get(other, other)] = builder.unparse(
                nav.swap_filter_op(name, op, value, other)
            )
        filters.append(
            {
                "label": f"{lab.title} {pretty_op} {pretty_value}",
                "drop_url": builder.unparse(query.remove_filter(name, op, value)),
                "invert_url": builder.unparse(nav.invert_filter(name, op, value)),
                "related_urls": related,
            }
        )

    values = []
    for m in cubedef.measures:
        if m.name in query.hidden_values or m.name not in query.values:
            values.append(
                {
                    "label": m.title,
                    "show_url": builder.unparse(query.add_value(m.name)),
                }
            )

    out: dict = {}
    if axes:
        out["axes"] = axes
    if filters:
        out["filters"] = filters
    if values:
        out["values"] = values
    if widgets:
        from .widgets import render_widgets_json

        out["widgets"] = render_widgets_json(cubedef, query, widgets)
    return out
