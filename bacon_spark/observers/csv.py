"""CSV sink: render Table1D/TablePivot to a csv.writer
(reference /root/reference/bacon/observers/csv.py:8-102).

Driver-side presentation over collected (small, aggregated) results; for
bulk raw data exports use ``df.write.csv`` — exposed as ``write_rows_csv``
which stays fully distributed.
"""

from __future__ import annotations

import csv
from typing import IO

from pyspark.sql import DataFrame

from .tables import Table1D, TablePivot


def render_csv(out: IO[str], table: Table1D | TablePivot, totals: bool = True) -> None:
    w = csv.writer(out)
    if isinstance(table, Table1D):
        _render_1d(w, table, totals)
    else:
        _render_pivot(w, table, totals)


def _fmt(v) -> str:
    return "" if v is None else str(v)


def _render_1d(w, table: Table1D, totals: bool) -> None:
    w.writerow(table.header())
    cd = table.board.cubedef
    for r in table.rows():
        w.writerow(
            [cd.get_label(a).pretty(r[a]) for a in table.axes]
            + [_fmt(r[v]) for v in table.values]
        )
    if totals and table.values:
        t = table.totals()
        w.writerow(["Total"] + [""] * (len(table.axes) - 1) + [_fmt(t[v]) for v in table.values])


def _render_pivot(w, table: TablePivot, totals: bool) -> None:
    cd = table.board.cubedef
    # header: row-axis titles, then one group of value titles per combo
    head = [cd.get_label(a).title for a in table.row_axes]
    for combo in table.columns:
        label = " / ".join(
            cd.get_label(p).pretty(v) for p, v in zip(table.pivots, combo)
        )
        for v in table.values:
            head.append(f"{label}: {cd.get_value(v).title}")
    if totals:
        head += [f"Total: {cd.get_value(v).title}" for v in table.values]
    w.writerow(head)

    for rk in table.rows():
        row = [cd.get_label(a).pretty(k) for a, k in zip(table.row_axes, rk)]
        for combo in table.columns:
            cell = table.cell(rk, combo)
            row += [_fmt(cell[v]) if cell else "" for v in table.values]
        if totals:
            rt = table.row_total(rk) or {}
            row += [_fmt(rt.get(v)) for v in table.values]
        w.writerow(row)

    if totals:
        row = ["Total"] + [""] * (len(table.row_axes) - 1)
        for combo in table.columns:
            ct = table.col_total(combo) or {}
            row += [_fmt(ct.get(v)) for v in table.values]
        gt = table.grand_total()
        row += [_fmt(gt.get(v)) for v in table.values]
        w.writerow(row)


def write_rows_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """Distributed CSV export of raw rows (the scale path — never collect
    bulk data to the driver)."""
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)
