"""PPTX (PresentationML/DrawingML) slide-text extraction.

Slide decks complete the office trio (E183 DOCX, E200 XLSX). Deck text
lives in ``ppt/slides/slideN.xml`` as DrawingML runs: ``<a:t>`` inside
``<a:r>`` inside ``<a:p>`` paragraphs — the same run/paragraph shape as
WordprocessingML with different element names, plus ``<a:br/>`` line
breaks. Slides are ordered by their MEMBER NUMBER (slide1, slide2, …,
numerically — slide10 after slide9, not after slide1), discovered from
the zip directory rather than the relationship graph: crawl-grade decks
routinely ship broken .rels, and the numbered members ARE the
presentation order for every mainstream writer.

Same tolerance rules as the rest of the tier: no stdlib XML, bounded
(``SLIDE_CAP``), report-don't-raise.
"""

from __future__ import annotations

import re

from pdf_spark.core.docx import _unescape
from pdf_spark.core.zipread import zip_entries, zip_extract

__all__ = ["pptx_text", "SLIDE_CAP"]

SLIDE_CAP = 1000  # adversarial slide-count bomb

_SLIDE_NAME = re.compile(r"^ppt/slides/slide(\d{1,5})\.xml$")
_SCAN = re.compile(
    r"<a:t(?:\s[^>]*)?>(?P<t>.*?)</a:t>"
    r"|<a:br(?:\s[^>]*)?/>"
    r"|</a:p>",
    re.S,
)


def _slide_text(xml: str) -> tuple[str, int]:
    """One slide → (text, n_paragraphs). Empty paragraphs dropped."""
    paras: list[str] = []
    parts: list[str] = []
    for m in _SCAN.finditer(xml):
        if m.group("t") is not None:
            parts.append(_unescape(m.group("t")))
        elif m.group(0).startswith("<a:br"):
            parts.append("\n")
        else:  # </a:p>
            joined = "".join(parts)
            if joined.strip():
                paras.append(joined)
            parts = []
    if parts and "".join(parts).strip():
        paras.append("".join(parts))
    return "\n".join(paras), len(paras)


def pptx_text(data: bytes) -> dict:
    """Container → slide-ordered text (report-don't-raise)."""
    slides: list[tuple[int, dict]] = []
    for entry in zip_entries(data):
        m = _SLIDE_NAME.match(entry["name"])
        if m:
            slides.append((int(m.group(1)), entry))
    if not slides:
        return {
            "is_pptx": 0,
            "n_slides": None,
            "n_paragraphs": None,
            "text": None,
        }
    slides.sort(key=lambda s: s[0])
    texts: list[str] = []
    n_paras = 0
    for _num, entry in slides[:SLIDE_CAP]:
        blob = zip_extract(data, entry)
        if blob is None:
            continue
        text, n = _slide_text(blob.decode("utf-8", "replace"))
        n_paras += n
        if text:
            texts.append(text)
    return {
        "is_pptx": 1,
        "n_slides": len(slides),
        "n_paragraphs": n_paras,
        "text": "\n\n".join(texts),
    }
