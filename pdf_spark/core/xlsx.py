"""XLSX (SpreadsheetML) cell extraction over the ZIP tier.

Spreadsheets are the tabular half of the office-document crawl tier.
The extraction contract mirrors qx50's CSV audit: shape counts for
routing plus an md5-certified canonical cell stream, so both engines
prove byte-identical parses.

Scope (the cell-text subset of public ECMA-376 SpreadsheetML):

- ``xl/workbook.xml`` ``<sheet>`` entries: sheet count + first sheet
  name (crawl routing needs the inventory, not every grid);
- ``xl/sharedStrings.xml``: ``<si>`` items whose text is the CONCAT of
  all ``<t>`` runs inside (rich-text ``<r>`` runs split one logical
  string across several ``<t>``s — a reader that takes only the first
  run corrupts every formatted cell);
- ``xl/worksheets/sheet1.xml``: ``<row>`` elements; ``<c>`` cells with
  ``r`` refs and type dispatch — ``t="s"`` shared-string index,
  ``t="inlineStr"`` with ``<is><t>``, ``t="str"`` formula-cached text,
  default numeric keeping the RAW ``<v>`` text (no float round-trip);
  ``<f>`` formula bodies are NOT values and are skipped;
- entity unescape shared with the DOCX tier.

Canonical stream: ``ref=value`` joined on 0x1F in document order.
Same tolerance rules as E183: no stdlib XML, bounded, report-don't-
raise. Reference parity: the C reference has no spreadsheet surface.
"""

from __future__ import annotations

import hashlib
import re

from pdf_spark.core.docx import _unescape
from pdf_spark.core.zipread import zip_find

__all__ = ["xlsx_cells", "CELL_CAP"]

CELL_CAP = 100_000  # runaway grid bomb

_SHEET = re.compile(r'<sheet\b[^>]*\bname="([^"]*)"')
_SI = re.compile(r"<si\b[^>]*>(.*?)</si>", re.S)
_T = re.compile(r"<t(?:\s[^>]*)?>(.*?)</t>", re.S)
_ROW = re.compile(r"<row\b")
_CELL = re.compile(r'<c\b([^>]*)>(.*?)</c>|<c\b([^>]*)/>', re.S)
_ATTR = re.compile(r'([a-zA-Z:]+)\s*=\s*"([^"]*)"')
_V = re.compile(r"<v(?:\s[^>]*)?>(.*?)</v>", re.S)
_IS_T = re.compile(r"<is\b[^>]*>.*?</is>", re.S)


def _shared_strings(xml: str) -> list[str]:
    return [
        "".join(_unescape(t) for t in _T.findall(si))
        for si in _SI.findall(xml)
    ]


def xlsx_cells(data: bytes) -> dict:
    """Container → sheet inventory + first-grid certified cell stream."""
    null = {
        "is_xlsx": 0,
        "n_sheets": None,
        "sheet_name": None,
        "n_rows": None,
        "n_cells": None,
        "cells_md5": None,
    }
    wb = zip_find(data, "xl/workbook.xml")
    sheet = zip_find(data, "xl/worksheets/sheet1.xml")
    if wb is None or sheet is None:
        return null
    names = _SHEET.findall(wb.decode("utf-8", "replace"))
    shared: list[str] = []
    ss = zip_find(data, "xl/sharedStrings.xml")
    if ss is not None:
        shared = _shared_strings(ss.decode("utf-8", "replace"))
    grid = sheet.decode("utf-8", "replace")
    parts: list[str] = []
    for m in _CELL.finditer(grid):
        if len(parts) >= CELL_CAP:
            break
        attrs_raw = m.group(1) if m.group(1) is not None else m.group(3)
        inner = m.group(2) or ""
        attrs = dict(_ATTR.findall(attrs_raw or ""))
        ref = attrs.get("r", "")
        ctype = attrs.get("t", "n")
        value: str | None = None
        if ctype == "inlineStr":
            ism = _IS_T.search(inner)
            if ism:
                value = "".join(
                    _unescape(t) for t in _T.findall(ism.group(0))
                )
        else:
            vm = _V.search(inner)
            if vm:
                raw = _unescape(vm.group(1))
                if ctype == "s":
                    try:
                        value = shared[int(raw)]
                    except (ValueError, IndexError):
                        value = None
                else:  # n / str / b: keep RAW text, no float round-trip
                    value = raw
        if value is not None:
            parts.append(f"{ref}={value}")
    canon = "\x1f".join(parts)
    return {
        "is_xlsx": 1,
        "n_sheets": len(names),
        "sheet_name": names[0] if names else None,
        "n_rows": len(_ROW.findall(grid)),
        "n_cells": len(parts),
        "cells_md5": hashlib.md5(canon.encode("utf-8")).hexdigest(),
    }
