"""Sitemap parsing (sitemaps.org XML protocol).

The third leg of the crawl-frontier stack next to the link graph (E20/
E22) and robots.txt (E27): ``<urlset>`` entries feed the frontier,
``<sitemapindex>`` entries fan out to more sitemaps. Archives store them
as ``sitemap.xml`` or ``sitemap.xml.gz`` payloads, so the gzip transport
unwrap is shared with the page path.

Regex-scanner parse in the spirit of the XMP reader — sitemaps in the
wild are machine-written, flat, and frequently slightly malformed, so a
tolerant linear scan beats a strict XML parser (which would error-row
half the real corpus). Never raises; entity-decodes ``loc`` values
(ampersands in query strings are the common case).
"""

from __future__ import annotations

import re
from typing import Optional

_LOC_BLOCK_RE = re.compile(
    rb"<(url|sitemap)\b[^>]*>(.*?)</\1\s*>", re.S | re.I
)
_LOC_RE = re.compile(rb"<loc\b[^>]*>\s*(.*?)\s*</loc\s*>", re.S | re.I)
_LASTMOD_RE = re.compile(rb"<lastmod\b[^>]*>\s*(.*?)\s*</lastmod\s*>", re.S | re.I)

_ENTITIES = {
    b"&amp;": "&", b"&lt;": "<", b"&gt;": ">",
    b"&apos;": "'", b"&quot;": '"',
}

MAX_ENTRIES = 50_000  # protocol cap per sitemap file; also our bomb guard


def _text(raw: bytes) -> str:
    s = raw.decode("utf-8", "replace")
    for ent, ch in _ENTITIES.items():
        s = s.replace(ent.decode(), ch)
    return s


def parse_sitemap(data: bytes) -> tuple:
    """Sitemap bytes (plain or gzip) -> (kind, entries).

    kind is ``'urlset'``, ``'index'``, or ``''`` (not a sitemap); entries
    are (loc, lastmod-or-None) tuples in document order, capped at the
    protocol's 50k. An index's entries are the CHILD sitemap locations —
    at crawl scale the caller fans those out as new file tasks."""
    if data[:2] == b"\x1f\x8b":
        from pdf_spark.core.extract import DEFAULT_MAX_BYTES, gunzip_payload

        inner = gunzip_payload(data, DEFAULT_MAX_BYTES)
        if inner is None:
            return "", []
        data = inner
    head = data[:4096].lower()
    if b"<urlset" in head:
        kind = "urlset"
    elif b"<sitemapindex" in head:
        kind = "index"
    else:
        return "", []
    entries = []
    for m in _LOC_BLOCK_RE.finditer(data):
        block = m.group(2)
        locm = _LOC_RE.search(block)
        if locm is None:
            continue
        loc = _text(locm.group(1))
        if not loc:
            continue
        lm = _LASTMOD_RE.search(block)
        lastmod: Optional[str] = _text(lm.group(1)) if lm else None
        entries.append((loc, lastmod))
        if len(entries) >= MAX_ENTRIES:
            break
    return kind, entries


# --- RSS / Atom feeds ---------------------------------------------------------

_ITEM_RE = re.compile(rb"<(item|entry)\b[^>]*>(.*?)</\1\s*>", re.S | re.I)
_TITLE_RE = re.compile(rb"<title\b[^>]*>\s*(.*?)\s*</title\s*>", re.S | re.I)
_LINK_PAIR_RE = re.compile(rb"<link\b[^>]*>\s*(.*?)\s*</link\s*>", re.S | re.I)
_LINK_HREF_RE = re.compile(
    rb"""<link\b[^>]*?href\s*=\s*("([^"]*)"|'([^']*)')""", re.S | re.I
)
_CDATA_RE = re.compile(rb"^<!\[CDATA\[(.*?)\]\]>$", re.S)


def parse_feed(data: bytes) -> tuple:
    """RSS 2.0 / Atom feed bytes (plain or gzip) -> (kind, entries).

    kind is ``'rss'``, ``'atom'``, or ``''``; entries are (link, title)
    tuples in document order — the same crawl-frontier shape as
    ``parse_sitemap``. RSS carries the URL as ``<link>text</link>``, Atom
    as ``<link href="...">``; titles may be CDATA-wrapped. Tolerant linear
    scan, capped, never raises."""
    if data[:2] == b"\x1f\x8b":
        from pdf_spark.core.extract import DEFAULT_MAX_BYTES, gunzip_payload

        inner = gunzip_payload(data, DEFAULT_MAX_BYTES)
        if inner is None:
            return "", []
        data = inner
    head = data[:4096].lower()
    if b"<rss" in head or b"<rdf:rdf" in head:
        kind = "rss"
    elif b"<feed" in head:
        kind = "atom"
    else:
        return "", []
    entries = []
    for m in _ITEM_RE.finditer(data):
        block = m.group(2)
        link = None
        if kind == "atom":
            hm = _LINK_HREF_RE.search(block)
            if hm:
                link = _text(hm.group(2) if hm.group(2) is not None else hm.group(3))
        else:
            lm = _LINK_PAIR_RE.search(block)
            if lm:
                link = _text(lm.group(1))
        if not link:
            continue
        title = None
        tm = _TITLE_RE.search(block)
        if tm:
            raw = tm.group(1)
            cm = _CDATA_RE.match(raw)
            title = _text(cm.group(1) if cm else raw).strip() or None
        entries.append((link, title))
        if len(entries) >= MAX_ENTRIES:
            break
    return kind, entries
