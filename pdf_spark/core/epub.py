"""EPUB text extraction — packaged-XHTML books over the ZIP tier.

EPUB (IDPF/W3C, public spec) is a ZIP with a fixed discovery chain:
``META-INF/container.xml`` names the OPF package document; the OPF's
``<manifest>`` maps ids to hrefs and its ``<spine>`` gives the READING
ORDER as a sequence of idrefs — document order inside the zip is
meaningless, the spine is the contract (the same reading-order problem
the PDF page tree solves). Chapter XHTML is stripped with the HTML
tier's block segmenter (``core/htmltext.py``) WITHOUT the boilerplate
classifier: ebook chapters are body text, there is no nav chrome to
strip, and the classifier's length priors would bite short chapters.

Tolerances (crawl-grade): the ``mimetype`` member is not required,
hrefs resolve relative to the OPF's own directory (posix semantics),
spine idrefs pointing at missing manifest items or missing members are
dropped, chapter count is bomb-capped.

Reference parity note: the C reference (someone13574/pdf) has no EPUB
surface — net-new in the E19/E182/E183 container-tier tradition.
"""

from __future__ import annotations

import posixpath
import re

from pdf_spark.core.htmltext import decode_html, segment_blocks
from pdf_spark.core.zipread import zip_find

__all__ = ["epub_text", "CHAPTER_CAP"]

CHAPTER_CAP = 512  # adversarial spine bomb

_ROOTFILE = re.compile(r'<rootfile\b[^>]*full-path="([^"]+)"')
_ITEM = re.compile(r"<item\b([^>]*)/?>")
_ITEMREF = re.compile(r'<itemref\b[^>]*idref="([^"]+)"')
_ATTR = re.compile(r'([a-zA-Z-]+)\s*=\s*"([^"]*)"')
_TITLE = re.compile(r"<dc:title(?:\s[^>]*)?>(.*?)</dc:title>", re.S)
_LANG = re.compile(r"<dc:language(?:\s[^>]*)?>(.*?)</dc:language>", re.S)


def _chapter_text(data: bytes) -> str:
    """All block text, document order — no boilerplate classifier."""
    return "\n".join(
        b.text for b in segment_blocks(decode_html(data)) if b.text
    )


def epub_text(data: bytes) -> dict:
    """Container → spine-ordered text + metadata (report-don't-raise)."""
    null = {
        "is_epub": 0,
        "title": None,
        "language": None,
        "n_chapters": None,
        "text": None,
    }
    container = zip_find(data, "META-INF/container.xml")
    if container is None:
        return null
    m = _ROOTFILE.search(container.decode("utf-8", "replace"))
    if not m:
        return null
    opf_path = m.group(1)
    opf = zip_find(data, opf_path)
    if opf is None:
        return null
    opf_xml = opf.decode("utf-8", "replace")
    base = posixpath.dirname(opf_path)

    hrefs: dict[str, str] = {}
    for im in _ITEM.finditer(opf_xml):
        attrs = dict(_ATTR.findall(im.group(1)))
        if "id" in attrs and "href" in attrs:
            hrefs[attrs["id"]] = attrs["href"]

    chapters: list[str] = []
    for idref in _ITEMREF.findall(opf_xml)[:CHAPTER_CAP]:
        href = hrefs.get(idref)
        if href is None:
            continue
        member = posixpath.normpath(posixpath.join(base, href))
        blob = zip_find(data, member)
        if blob is None:
            continue
        chapters.append(_chapter_text(blob))

    tm = _TITLE.search(opf_xml)
    lm = _LANG.search(opf_xml)
    return {
        "is_epub": 1,
        "title": tm.group(1).strip() if tm else None,
        "language": lm.group(1).strip() if lm else None,
        "n_chapters": len(chapters),
        "text": "\n\n".join(chapters),
    }
