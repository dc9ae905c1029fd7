"""DOCX (WordprocessingML) text extraction over the ZIP container tier.

DOCX is the crawl's most common non-PDF "document" payload: a ZIP
(``core/zipread.py``) whose ``word/document.xml`` part carries the text
as ECMA-376 WordprocessingML. The extraction contract mirrors the PDF
tier: deterministic text out, structural counts for routing, report-
don't-raise on malformed input.

Scope (the text-bearing subset of the public ECMA-376 spec):

- ``<w:t>`` run text (attributes like ``xml:space="preserve"``
  tolerated), self-closing empty runs;
- ``<w:tab/>`` → TAB, ``<w:br/>``/``<w:cr/>`` → newline inside the
  paragraph;
- ``</w:p>`` closes a paragraph; paragraphs join with newline —
  table-cell paragraphs flow in document order (the same
  geometry-free reading order the HTML tier uses);
- tracked changes: ``<w:ins>`` content is the ACCEPTED text and flows
  through; ``<w:del>`` blocks (holding ``<w:delText>``) are dropped
  wholesale — extract what a reader would see;
- XML entities: the five named forms plus decimal/hex character
  references, single-pass (no double-unescape);
- ``<w:tbl>`` opens counted for routing (``<w:tblPr>`` etc. do not
  match — the name must end at whitespace or ``>``);
- ``docProps/core.xml`` ``<dc:title>`` for document metadata.

No stdlib XML parser on the read path: crawled OOXML is full of
undeclared-entity and encoding damage that makes ``xml.etree`` raise;
a token scan over the text-bearing elements is bounded and tolerant
(the ``core/htmltext.py`` design, applied to WordprocessingML).

Reference parity note: the C reference (someone13574/pdf) reads bare
PDFs only — net-new surface in the E19 (HTML) / E182 (ZIP) tradition.
"""

from __future__ import annotations

import re

from pdf_spark.core.zipread import zip_find

__all__ = ["docx_text", "doc_xml_text"]

# One alternation pass over document.xml. <w:del...>...</w:del> is
# dropped wholesale; <w:delText> can't false-match the w:del arm (the
# arm requires '>' or whitespace right after "del").
_SCAN = re.compile(
    r"<w:del(?:\s[^>]*)?>.*?</w:del>"
    r"|<w:t(?:\s[^>]*)?>(?P<t>.*?)</w:t>"
    r"|<w:t(?:\s[^>]*)?/>"
    r"|<w:tab(?:\s[^>]*)?/>"
    r"|<w:br(?:\s[^>]*)?/>"
    r"|<w:cr(?:\s[^>]*)?/>"
    r"|</w:p>",
    re.S,
)

_TBL_OPEN = re.compile(r"<w:tbl[\s>]")
_TITLE = re.compile(r"<dc:title(?:\s[^>]*)?>(.*?)</dc:title>", re.S)

_NAMED = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}
_ENTITY = re.compile(r"&(?:#x([0-9a-fA-F]{1,6})|#([0-9]{1,7})|([a-z]{2,4}));")


def _unescape(s: str) -> str:
    def sub(m: re.Match) -> str:
        if m.group(1):
            return chr(min(int(m.group(1), 16), 0x10FFFF))
        if m.group(2):
            return chr(min(int(m.group(2)), 0x10FFFF))
        return _NAMED.get(m.group(3), m.group(0))

    return _ENTITY.sub(sub, s)


def doc_xml_text(xml: str) -> tuple[str, int]:
    """WordprocessingML → (text, n_paragraphs). Paragraphs join on \\n."""
    paras: list[str] = []
    parts: list[str] = []
    for m in _SCAN.finditer(xml):
        tok = m.group(0)
        if tok.startswith("<w:del"):
            continue
        if m.group("t") is not None:
            parts.append(_unescape(m.group("t")))
        elif tok.startswith("<w:tab"):
            parts.append("\t")
        elif tok.startswith(("<w:br", "<w:cr")):
            parts.append("\n")
        elif tok == "</w:p>":
            paras.append("".join(parts))
            parts = []
        # else: self-closing empty <w:t/>
    if parts:  # unterminated trailing paragraph (truncated part)
        paras.append("".join(parts))
    return "\n".join(paras), len(paras)


def docx_text(data: bytes) -> dict:
    """Container → text + routing metadata (report-don't-raise).

    ``is_docx=0`` rows (not a zip, or no ``word/document.xml`` member)
    carry NULL metadata, the qx02 error-histogram discipline.
    """
    doc = zip_find(data, "word/document.xml")
    if doc is None:
        return {
            "is_docx": 0,
            "text": None,
            "n_paragraphs": None,
            "n_tables": None,
            "title": None,
        }
    xml = doc.decode("utf-8", "replace")
    text, n_paras = doc_xml_text(xml)
    title = None
    core = zip_find(data, "docProps/core.xml")
    if core is not None:
        m = _TITLE.search(core.decode("utf-8", "replace"))
        if m:
            title = _unescape(m.group(1))
    return {
        "is_docx": 1,
        "text": text,
        "n_paragraphs": n_paras,
        "n_tables": len(_TBL_OPEN.findall(xml)),
        "title": title,
    }
