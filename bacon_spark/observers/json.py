"""JSON sink: table + navigation links -> JSON-able dict.

Reference /root/reference/bacon/observers/json.py:140-154,355-370: every
cell carries serialized queries for its drill/pivot/hide actions, deduped
through a link map. The links ARE the navigation API: a client can walk the
whole cube by following them.
"""

from __future__ import annotations

import datetime as dt
from typing import Any

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
        rows.append({"cells": cells, "values": values})

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
