"""HTML table → dense grid with rowspan/colspan expansion.

qx09 mines raw cell TEXT; turning a table into DATA needs the grid
semantics browsers implement: a ``rowspan``/``colspan`` cell occupies a
RECTANGLE, later cells in the same row shift right past occupied slots,
and later ROWS find those slots already taken. Extractors that ignore
spans misalign every column after the first spanned cell — the classic
web-table corruption in naive corpora.

Algorithm (the HTML5 table-processing model, simplified to the subset
static tables use): walk ``<tr>``/``<td>``/``<th>`` in document order;
for each cell, advance to the first unoccupied column of the current
row, then mark ``rowspan x colspan`` slots occupied with the cell's
text (span counts clamped to ``SPAN_CAP`` against span bombs). The
result is a dense matrix; ragged bottoms leave empty strings.

Cell text is tag-stripped and entity-unescaped (shared with the DOCX
tier); the grid is certified by md5 over a 0x1F/0x1E canonical stream
(the qx50/qx52 move).
"""

from __future__ import annotations

import hashlib
import re

from pdf_spark.core.docx import _unescape

__all__ = ["table_grid", "SPAN_CAP", "CELL_CAP"]

SPAN_CAP = 64  # rowspan/colspan bomb clamp
CELL_CAP = 10_000

_TABLE = re.compile(r"<table\b[^>]*>(.*?)</table>", re.S | re.I)
_TR = re.compile(r"<tr\b[^>]*>(.*?)(?=<tr\b|</table|$)", re.S | re.I)
_CELL = re.compile(
    r"<(td|th)\b([^>]*)>(.*?)(?=<td\b|<th\b|</tr|</table|$)", re.S | re.I
)
_SPAN = re.compile(r'(row|col)span\s*=\s*"?(\d{1,4})', re.I)
_TAG = re.compile(r"<[^>]+>")


def _cell_text(raw: str) -> str:
    return _unescape(_TAG.sub("", raw)).strip()


def table_grid(html: str) -> dict:
    """First <table> → dense grid + certification (report-don't-raise)."""
    null = {
        "has_table": 0,
        "n_rows": None,
        "n_cols": None,
        "n_spanned": None,
        "grid_md5": None,
    }
    tm = _TABLE.search(html)
    if not tm:
        return null
    # occupancy: grid[r][c] = text (None = free)
    grid: list[list[str | None]] = []
    n_spanned = 0
    n_cells = 0
    for r, rm in enumerate(_TR.finditer(tm.group(1))):
        while len(grid) <= r:
            grid.append([])
        col = 0
        for cm in _CELL.finditer(rm.group(1)):
            if n_cells >= CELL_CAP:
                break
            n_cells += 1
            spans = {
                k.lower(): min(max(int(v), 1), SPAN_CAP)
                for k, v in _SPAN.findall(cm.group(2))
            }
            rs = spans.get("row", 1)
            cs = spans.get("col", 1)
            if rs > 1 or cs > 1:
                n_spanned += 1
            row = grid[r]
            while col < len(row) and row[col] is not None:
                col += 1  # skip slots occupied by earlier rowspans
            text = _cell_text(cm.group(3))
            for dr in range(rs):
                while len(grid) <= r + dr:
                    grid.append([])
                target = grid[r + dr]
                while len(target) < col + cs:
                    target.append(None)
                for dc in range(cs):
                    if target[col + dc] is None:
                        target[col + dc] = text
            col += cs
    n_cols = max((len(row) for row in grid), default=0)
    dense = [
        [(cell if cell is not None else "") for cell in row]
        + [""] * (n_cols - len(row))
        for row in grid
    ]
    canon = "\x1e".join("\x1f".join(row) for row in dense)
    return {
        "has_table": 1,
        "n_rows": len(dense),
        "n_cols": n_cols,
        "n_spanned": n_spanned,
        "grid_md5": hashlib.md5(canon.encode("utf-8")).hexdigest(),
    }
