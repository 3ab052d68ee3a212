"""Table renderers: Table1D (flat) and TablePivot (cross-tab), with
totals, measure sorting and pagination.

Re-expression of /root/reference/bacon/observers/tables.py. The reference
walks the nested Slice dict, computing totals by merging accumulator
objects (tables.py:285-296,457-473). Here rendering is driver-side over the
*collected result* (cube results are small — bounded by group count, not
input size), and totals come from a second dim=0 engine aggregate over the
same filters — exact for every accumulator, and one extra Spark job over
the already-cached/filtered input rather than a Python merge loop.

StdDev totals render as None: the reference's StdDev merge yields
Inconsistent (/root/reference/bacon/accumulators.py:227-228), and we honor
that observable behavior even though Spark could merge correctly.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..accumulators import StdDev
from ..cubequery import CubeQuery
from ..engine import CuttingBoard


@dataclass
class Page:
    """Pagination state ``limit:offset:nrows``
    (/root/reference/bacon/observers/tables.py:16-130)."""

    limit: int | None = None
    offset: int = 0
    nrows: int | None = None

    @classmethod
    def parse(cls, s: str | None) -> Page:
        if not s:
            return cls()
        parts = (s.split(":") + ["", "", ""])[:3]
        limit = int(parts[0]) if parts[0] else None
        offset = int(parts[1]) if parts[1] else 0
        nrows = int(parts[2]) if parts[2] else None
        return cls(limit, offset, nrows)

    def unparse(self) -> str:
        return ":".join(
            "" if v is None else str(v) for v in (self.limit, self.offset, self.nrows)
        )

    def slice(self, rows: list, total: int) -> list:
        # offset reset when the row count changed under us
        offset = self.offset if self.nrows in (None, total) else 0
        if self.limit is None:
            return rows[offset:]
        return rows[offset : offset + self.limit]


def _totals_record(board: CuttingBoard, query: CubeQuery) -> dict:
    """Grand-total record: the dim=0 form of the query (same filters),
    with StdDev measures nulled (reference merge behavior)."""
    q0 = query
    for a in list(q0.axes):
        q0 = q0.remove_axis(a)
    record = board.slice(q0).record
    for v in query.values:
        if isinstance(board.cubedef.get_value(v).acc, StdDev):
            record[v] = None
    return record


class Table1D:
    """Flat table: one row per leading-axis value
    (/root/reference/bacon/observers/tables.py:246-315)."""

    #: render-path cardinality guard (see TablePivot.MAX_RENDER_ROWS):
    #: pagination happens AFTER the driver-side collect, so the collect
    #: itself must be bounded
    MAX_RENDER_ROWS = 200_000

    def __init__(
        self,
        board: CuttingBoard,
        query: CubeQuery,
        page: Page | None = None,
        max_render_rows: int | None = None,
    ):
        self.board = board
        self.query = query
        self.page = page or Page()
        self.axes = query.row_axes
        self.values = query.visible_values
        sl = board.slice(query)
        self._rows = sl.rows(
            max_rows=self.MAX_RENDER_ROWS if max_render_rows is None else max_render_rows
        )

    @property
    def nrows(self) -> int:
        return len(self._rows)

    def rows(self) -> list[dict]:
        return self.page.slice(self._rows, self.nrows)

    def totals(self) -> dict:
        return _totals_record(self.board, self.query)

    def pretty_rows(self) -> list[list[str]]:
        """Rows with label-pretty rendering (presentation parity with the
        reference's LabeledValue cells,
        /root/reference/bacon/cutting.py:648-688)."""
        out = []
        for r in self.rows():
            cells = [self.board.cubedef.get_label(a).pretty(r[a]) for a in self.axes]
            cells += [
                "" if r[v] is None else str(r[v]) for v in self.values
            ]
            out.append(cells)
        return out

    def header(self) -> list[str]:
        cd = self.board.cubedef
        return [cd.get_label(a).title for a in self.axes] + [
            cd.get_value(v).title for v in self.values
        ]


class TablePivot:
    """Cross-tab: trailing pivot axes become column groups — one group per
    OBSERVED pivot-value combination, ordered by the pivot labels' sort
    keys rightmost-first (/root/reference/bacon/cutting.py:597-627,
    observers/tables.py:325-508). Includes per-row totals (across column
    groups) and a column-totals row."""

    #: render-path cardinality guard: a pivot whose slice exceeds this
    #: refuses to collect (QueryError) instead of materializing millions
    #: of rows driver-side — the caller should filter, page, or drop an
    #: axis. Overridable per renderer via ``max_render_rows``.
    MAX_RENDER_ROWS = 200_000

    def __init__(
        self,
        board: CuttingBoard,
        query: CubeQuery,
        page: Page | None = None,
        max_render_rows: int | None = None,
    ):
        if not query.pivots:
            raise ValueError("TablePivot requires a pivoted query")
        self.board = board
        self.query = query
        self.page = page or Page()
        self.row_axes = query.row_axes
        self.pivots = query.pivots
        self.values = query.visible_values
        self.max_render_rows = (
            self.MAX_RENDER_ROWS if max_render_rows is None else max_render_rows
        )
        self._build()

    def _build(self):
        sl = self.board.slice(self.query)
        raw = sl.collect(max_rows=self.max_render_rows)
        cd = self.board.cubedef

        # observed pivot combos, stable-sorted rightmost key first
        combos = {tuple(r[p] for p in self.pivots) for r in raw}
        combos = list(combos)
        for i in range(len(self.pivots) - 1, -1, -1):
            label = cd.get_label(self.pivots[i])
            combos.sort(
                key=lambda c, i=i: (c[i] is not None, c[i]), reverse=label.reverse
            )
        self.columns: list[tuple] = combos

        cells: dict[tuple, dict[tuple, dict]] = {}
        row_keys: list[tuple] = []
        for r in raw:
            rk = tuple(r[a] for a in self.row_axes)
            pk = tuple(r[p] for p in self.pivots)
            if rk not in cells:
                cells[rk] = {}
                row_keys.append(rk)
            cells[rk][pk] = {v: r[v] for v in self.values}
        # row order: the engine already sorted by axes (or measure order)
        seen = set()
        self.row_keys = [k for k in row_keys if not (k in seen or seen.add(k))]
        self.cells = cells

        # per-row totals across pivot groups = the query without its pivot
        # axes (re-aggregation via the engine, sound for all accumulators)
        qrow = self.query
        for p in self.pivots:
            qrow = qrow.remove_axis(p)
        self._row_totals = {
            tuple(r[a] for a in self.row_axes): {v: r[v] for v in self.values}
            for r in self.board.slice(qrow).collect(max_rows=self.max_render_rows)
        }
        # per-column totals = the query without its row axes
        qcol = self.query
        for a in self.row_axes:
            qcol = qcol.remove_axis(a)
        self._col_totals = {
            tuple(r[p] for p in self.pivots): {v: r[v] for v in self.values}
            for r in self.board.slice(qcol).collect(max_rows=self.max_render_rows)
        }

    @property
    def nrows(self) -> int:
        return len(self.row_keys)

    def rows(self) -> list[tuple]:
        """Paginated row keys, honoring order-by-measure within one pivot
        column group (/root/reference/bacon/cubequery.py:278-302)."""
        keys = self.row_keys
        if self.query.order:
            sign, value_name, pivot_values = self.query.order
            if value_name in self.values and pivot_values:
                pk = tuple(pivot_values)

                def sort_key(rk):
                    cell = self.cells.get(rk, {}).get(pk, {})
                    v = cell.get(value_name)
                    return 0 if v is None else v

                keys = sorted(keys, key=sort_key, reverse=sign < 0)
        return self.page.slice(keys, self.nrows)

    def cell(self, row_key: tuple, combo: tuple) -> dict | None:
        return self.cells.get(tuple(row_key), {}).get(tuple(combo))

    def row_total(self, row_key: tuple) -> dict | None:
        return self._row_totals.get(tuple(row_key))

    def col_total(self, combo: tuple) -> dict | None:
        return self._col_totals.get(tuple(combo))

    def grand_total(self) -> dict:
        return _totals_record(self.board, self.query)


def page_list(page: Page, total: int, max_pages: int = 10) -> list[Page]:
    """Page links around the current offset (reference page-list UI,
    /root/reference/bacon/observers/tables.py:16-130): one Page per
    offset step, capped at max_pages centered on the current page."""
    if not page.limit or total <= page.limit:
        return []
    n_pages = (total + page.limit - 1) // page.limit
    cur = page.offset // page.limit
    start = max(0, min(cur - max_pages // 2, n_pages - max_pages))
    out = []
    for i in range(start, min(start + max_pages, n_pages)):
        out.append(Page(limit=page.limit, offset=i * page.limit, nrows=total))
    return out
