"""CSV/TSV payload sniffing + RFC 4180 parse — the tabular-text tier.

Crawls serve bare ``.csv``/``.tsv`` data files; before any schema work
the pipeline needs a DIALECT audit: which delimiter, how many rows and
columns, is the first row a header. The sniff is parse-based, not
count-based: each candidate delimiter is run through the full quoted
parser and scored by COLUMN CONSISTENCY (every logical row the same
width, width >= 2) — the only signal that survives quoted delimiters
and embedded newlines, which naive per-line ``count(',')`` sniffers
get wrong.

RFC 4180 (public): fields optionally double-quoted; quoted fields may
contain the delimiter, CR/LF, and ``""`` as an escaped quote. CRLF and
bare-LF row endings both accepted; a trailing newline does not create
an empty row.

Header heuristic (conservative, documented): claimed only when the
first row is entirely non-numeric AND some later row contains a
numeric cell — an all-text table stays header-less rather than
guessing.

The canonical cell matrix is exposed as an md5 over unit/record
separators (0x1F/0x1E) so both engines certify byte-identical parses.
"""

from __future__ import annotations

import hashlib
import re

__all__ = ["parse_delimited", "sniff_table", "CELL_CAP"]

CELL_CAP = 1 << 20  # runaway single-cell bomb
_CANDIDATES = (",", "\t", ";", "|")
_NUMERIC = re.compile(r"^-?\d+(\.\d+)?$")


def parse_delimited(text: str, delim: str) -> list[list[str]]:
    """RFC 4180 state machine → list of rows (lists of cells)."""
    rows: list[list[str]] = []
    cell: list[str] = []
    row: list[str] = []
    quoted = False
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if quoted:
            if ch == '"':
                if i + 1 < n and text[i + 1] == '"':
                    cell.append('"')
                    i += 2
                    continue
                quoted = False
            else:
                cell.append(ch)
            i += 1
            continue
        if ch == '"' and not cell:
            quoted = True
        elif ch == delim:
            row.append("".join(cell))
            cell = []
        elif ch == "\n" or ch == "\r":
            if ch == "\r" and i + 1 < n and text[i + 1] == "\n":
                i += 1
            row.append("".join(cell))
            rows.append(row)
            cell, row = [], []
        else:
            cell.append(ch)
        if len(cell) > CELL_CAP:
            break
        i += 1
    if cell or row:
        row.append("".join(cell))
        rows.append(row)
    return rows


def sniff_table(data: bytes) -> dict:
    """Payload → dialect + shape + canonical-matrix md5."""
    null = {
        "is_tabular": 0,
        "delimiter": None,
        "n_rows": None,
        "n_cols": None,
        "has_header": None,
        "cells_md5": None,
    }
    try:
        text = data.decode("utf-8")
    except UnicodeDecodeError:
        return null
    if "\x00" in text:
        return null
    best: tuple[int, str, list[list[str]]] | None = None
    for delim in _CANDIDATES:
        rows = parse_delimited(text, delim)
        if len(rows) < 2:
            continue
        widths = {len(r) for r in rows}
        if len(widths) != 1:
            continue
        width = widths.pop()
        if width < 2:
            continue
        if best is None or width > best[0]:
            best = (width, delim, rows)
    if best is None:
        return null
    n_cols, delim, rows = best
    first_nonnum = all(not _NUMERIC.match(c.strip()) for c in rows[0])
    later_num = any(
        _NUMERIC.match(c.strip()) for r in rows[1:] for c in r
    )
    has_header = int(first_nonnum and later_num)
    data_rows = rows[1:] if has_header else rows
    canon = "\x1e".join("\x1f".join(r) for r in rows)
    return {
        "is_tabular": 1,
        "delimiter": delim,
        "n_rows": len(data_rows),
        "n_cols": n_cols,
        "has_header": has_header,
        "cells_md5": hashlib.md5(canon.encode("utf-8")).hexdigest(),
    }
