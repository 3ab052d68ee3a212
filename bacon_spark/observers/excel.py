"""Excel sink — stdlib-only xlsx writer (zip + OOXML, no xlwt/openpyxl).

Mirrors the reference Excel observer semantics
(/root/reference/bacon/observers/excel.py:12-133): bold centered title
row, frozen below the titles, ``#,##0.00`` number format on measure
cells, a bold totals row, ``DD/MM/YY`` format for date labels, and a
"Report generated on ..." footer line. Styling beyond that (autofit,
merged pivot headers) is presentation sugar the reference marks optional;
the pivot sheet uses the same flat one-row header as the CSV sink.

Driver-side presentation over collected result-sized slices only — the
same contract as every other renderer in this package (the reference
renders fully materialized tables too). Bulk raw exports belong to
``df.write`` paths, not a spreadsheet.
"""

from __future__ import annotations

import datetime as dt
import io
import zipfile
from typing import IO
from xml.sax.saxutils import escape

from .tables import Table1D, TablePivot

# style indexes into cellXfs below
S_DEFAULT, S_TITLE, S_VALUE, S_TOTAL, S_DATE = 0, 1, 2, 3, 4

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
</Relationships>"""

# numFmt 164 = measure cells, 165 = date labels (reference style_value /
# style_label_date); font 1 = bold; xf order pins S_* above
_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<numFmts count="2">
<numFmt numFmtId="164" formatCode="#,##0.00"/>
<numFmt numFmtId="165" formatCode="DD/MM/YY"/>
</numFmts>
<fonts count="2"><font><sz val="11"/><name val="Calibri"/></font>
<font><b/><sz val="11"/><name val="Calibri"/></font></fonts>
<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf/></cellStyleXfs>
<cellXfs count="5">
<xf numFmtId="0" fontId="0"/>
<xf numFmtId="0" fontId="1" applyFont="1" applyAlignment="1"><alignment horizontal="center"/></xf>
<xf numFmtId="164" fontId="0" applyNumberFormat="1"/>
<xf numFmtId="164" fontId="1" applyNumberFormat="1" applyFont="1"/>
<xf numFmtId="165" fontId="0" applyNumberFormat="1"/>
</cellXfs>
</styleSheet>"""

_EPOCH = dt.date(1899, 12, 30)  # Excel serial-date epoch (1900 system)


def _col_name(i: int) -> str:
    """0-based column index -> A1-style column letters."""
    name = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        name = chr(ord("A") + rem) + name
    return name


def _cell_xml(ref: str, value, style: int) -> str:
    if value is None:
        return f'<c r="{ref}" s="{style}"/>'
    if isinstance(value, bool):
        return f'<c r="{ref}" s="{style}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, dt.datetime):
        serial = (value.date() - _EPOCH).days + (
            value - dt.datetime.combine(value.date(), dt.time())
        ).total_seconds() / 86400.0
        return f'<c r="{ref}" s="{S_DATE}"><v>{serial}</v></c>'
    if isinstance(value, dt.date):
        return f'<c r="{ref}" s="{S_DATE}"><v>{(value - _EPOCH).days}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}" s="{style}"><v>{value!r}</v></c>'
    return (
        f'<c r="{ref}" s="{style}" t="inlineStr">'
        f"<is><t xml:space=\"preserve\">{escape(str(value))}</t></is></c>"
    )


class _Sheet:
    """Row-at-a-time sheet builder (the reference's WSWrapper shape:
    write / newline / freeze_titles)."""

    def __init__(self):
        self._rows: list[str] = []
        self._cur: list[str] = []
        self._frozen_at: int | None = None

    def write(self, value, style: int = S_DEFAULT) -> None:
        ref = f"{_col_name(len(self._cur))}{len(self._rows) + 1}"
        self._cur.append(_cell_xml(ref, value, style))

    def newline(self) -> None:
        self._rows.append(
            f'<row r="{len(self._rows) + 1}">' + "".join(self._cur) + "</row>"
        )
        self._cur = []

    def freeze_titles(self) -> None:
        self._frozen_at = len(self._rows)  # freeze above current row

    def to_xml(self) -> str:
        if self._cur:
            self.newline()
        pane = ""
        if self._frozen_at:
            pane = (
                f'<sheetViews><sheetView workbookViewId="0">'
                f'<pane ySplit="{self._frozen_at}" '
                f'topLeftCell="A{self._frozen_at + 1}" state="frozen"/>'
                f"</sheetView></sheetViews>"
            )
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            + pane
            + "<sheetData>"
            + "".join(self._rows)
            + "</sheetData></worksheet>"
        )


def render_excel(table: Table1D | TablePivot, title: str = "Sheet", now: dt.datetime | None = None) -> bytes:
    """Render a table to xlsx bytes. ``now`` injects the footer timestamp
    (tests pass a fixed one; None = wall clock, like the reference)."""
    ws = _Sheet()
    if isinstance(table, Table1D):
        _render_1d(ws, table)
    else:
        _render_pivot(ws, table)
    ws.newline()
    stamp = (now or dt.datetime.now()).strftime("%d/%m/%Y %H:%M")
    ws.write(f"Report generated on {stamp}")
    ws.newline()
    return _package(ws, title)


def save_excel(table: Table1D | TablePivot, out: IO[bytes] | str, title: str = "Sheet") -> None:
    data = render_excel(table, title)
    if isinstance(out, str):
        with open(out, "wb") as f:
            f.write(data)
    else:
        out.write(data)


def _render_1d(ws: _Sheet, table: Table1D) -> None:
    for t in table.header():
        ws.write(t, S_TITLE)
    ws.newline()
    ws.freeze_titles()
    for r in table.rows():
        for a in table.axes:
            ws.write(r[a], S_DEFAULT)
        for v in table.values:
            ws.write(r[v], S_VALUE)
        ws.newline()
    if table.values:
        t = table.totals()
        ws.write("Total", S_TOTAL)
        for _ in range(len(table.axes) - 1):
            ws.write(None, S_TOTAL)
        for v in table.values:
            ws.write(t[v], S_TOTAL)
        ws.newline()


def _render_pivot(ws: _Sheet, table: TablePivot) -> None:
    cd = table.board.cubedef
    for a in table.row_axes:
        ws.write(cd.get_label(a).title, S_TITLE)
    for combo in table.columns:
        label = " / ".join(
            cd.get_label(p).pretty(v) for p, v in zip(table.pivots, combo)
        )
        for v in table.values:
            ws.write(f"{label}: {cd.get_value(v).title}", S_TITLE)
    for v in table.values:
        ws.write(f"Total: {cd.get_value(v).title}", S_TITLE)
    ws.newline()
    ws.freeze_titles()

    for rk in table.rows():
        for k in rk:
            ws.write(k, S_DEFAULT)
        for combo in table.columns:
            cell = table.cell(rk, combo)
            for v in table.values:
                ws.write(cell[v] if cell else None, S_VALUE)
        rt = table.row_total(rk) or {}
        for v in table.values:
            ws.write(rt.get(v), S_TOTAL)
        ws.newline()

    ws.write("Total", S_TOTAL)
    for _ in range(len(table.row_axes) - 1):
        ws.write(None, S_TOTAL)
    for combo in table.columns:
        ct = table.col_total(combo) or {}
        for v in table.values:
            ws.write(ct.get(v), S_TOTAL)
    gt = table.grand_total()
    for v in table.values:
        ws.write(gt.get(v), S_TOTAL)
    ws.newline()


def _package(ws: _Sheet, title: str) -> bytes:
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(title)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/styles.xml", _STYLES)
        z.writestr("xl/worksheets/sheet1.xml", ws.to_xml())
    return buf.getvalue()
