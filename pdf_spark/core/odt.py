"""ODT (OpenDocument Text) extraction — the LibreOffice/OpenOffice tier.

ODF (OASIS, public spec) is the other zip+XML word-processor family a
crawl serves. Unlike WordprocessingML (E183), document text in
``content.xml`` sits BARE between elements rather than inside ``w:t``
runs, so the scanner tracks whether it is inside an open
``<text:p>``/``<text:h>`` and accumulates raw character data there:

- ``</text:p>`` / ``</text:h>`` close a paragraph (headings count
  separately for routing);
- ``<text:tab/>`` → TAB, ``<text:line-break/>`` → newline,
  ``<text:s text:c="N"/>`` → N spaces (run-length-encoded whitespace,
  default 1);
- ``<office:annotation>…</office:annotation>`` (margin comments) are
  dropped wholesale — they are reviewer chatter, not document text;
- entity unescape shared with the DOCX tier;
- ``<dc:title>`` from ``meta.xml``.

Same tolerance rules as E183: no stdlib XML parser, bounded scans,
``is_odt=0`` + NULLs for non-ODT payloads.

Reference parity note: the C reference (someone13574/pdf) has no ODF
surface — net-new alongside E183/E184/E185/E186.
"""

from __future__ import annotations

import re

from pdf_spark.core.docx import _unescape
from pdf_spark.core.zipread import zip_find

__all__ = ["odt_text", "content_xml_text"]

_SCAN = re.compile(
    r"<office:annotation(?:\s[^>]*)?>.*?</office:annotation>"
    r"|<text:(p|h)(?:\s[^>]*)?>"
    r"|</text:(p|h)>"
    r"|<text:tab(?:\s[^>]*)?/>"
    r"|<text:line-break(?:\s[^>]*)?/>"
    r"|<text:s(\s[^>]*)?/>"
    r"|<[^>]+>"
    r"|([^<]+)",
    re.S,
)
_SPACE_COUNT = re.compile(r'text:c="(\d{1,4})"')
_TITLE = re.compile(r"<dc:title(?:\s[^>]*)?>(.*?)</dc:title>", re.S)


def content_xml_text(xml: str) -> tuple[str, int, int]:
    """content.xml → (text, n_paragraphs, n_headings)."""
    paras: list[str] = []
    parts: list[str] = []
    depth = 0  # open text:p/text:h nesting (list items nest p-in-p)
    n_heads = 0
    for m in _SCAN.finditer(xml):
        tok = m.group(0)
        open_ph, close_ph, s_attrs, text = (
            m.group(1),
            m.group(2),
            m.group(3),
            m.group(4),
        )
        if tok.startswith("<office:annotation"):
            continue
        if open_ph:
            depth += 1
            if open_ph == "h":
                n_heads += 1
            continue
        if close_ph:
            if depth:
                depth -= 1
            if depth == 0:
                paras.append("".join(parts))
                parts = []
            continue
        if not depth:
            continue
        # Prefix checks must be name-boundary exact: <text:span> begins
        # with "<text:s" and <text:tab-stop> with "<text:tab".
        if tok.startswith(("<text:tab/", "<text:tab ")):
            parts.append("\t")
        elif tok.startswith(("<text:line-break/", "<text:line-break ")):
            parts.append("\n")
        elif tok.startswith(("<text:s/", "<text:s ")):
            cm = _SPACE_COUNT.search(s_attrs or "")
            parts.append(" " * (int(cm.group(1)) if cm else 1))
        elif text is not None:
            parts.append(_unescape(text))
        # any other tag (spans, style refs) is transparent
    if parts:
        paras.append("".join(parts))
    return "\n".join(paras), len(paras), n_heads


def odt_text(data: bytes) -> dict:
    """Container → text + routing metadata (report-don't-raise)."""
    content = zip_find(data, "content.xml")
    if content is None:
        return {
            "is_odt": 0,
            "text": None,
            "n_paragraphs": None,
            "n_headings": None,
            "title": None,
        }
    text, n_paras, n_heads = content_xml_text(
        content.decode("utf-8", "replace")
    )
    title = None
    meta = zip_find(data, "meta.xml")
    if meta is not None:
        m = _TITLE.search(meta.decode("utf-8", "replace"))
        if m:
            title = _unescape(m.group(1))
    return {
        "is_odt": 1,
        "text": text,
        "n_paragraphs": n_paras,
        "n_headings": n_heads,
        "title": title,
    }
