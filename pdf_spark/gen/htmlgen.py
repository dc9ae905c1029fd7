"""Deterministic HTML page writer for the corpus variant matrix.

Mirrors ``pdfgen``: each builder takes the wrapped payload lines and
returns page bytes whose *expected* extracted text is computable at
generation time without running the extractor. The expected text for
every HTML variant is::

    "\\n".join(" ".join(line.split()) for line in lines)

i.e. the payload lines in order, whitespace-normalised (the extractor
collapses intra-block whitespace runs), with every boilerplate block
stripped. Each builder places exactly one payload line per content block
and surrounds them with boilerplate the classifier must kill:

- ``html_article``  — HTML5 semantic page: head (title/style/script),
  link-dense ``<nav>``, cookie-hinted div, ``<main><article>`` with one
  ``<p>`` per line, ``<aside>`` and ``<footer>`` boilerplate.
- ``html_messy``    — pre-HTML5 tag soup: no semantic containers,
  unclosed ``<p>``s, entities in the payload, comments and a mid-body
  ``<script>``, attribute values containing ``>``; content survives via
  the length/propagation rules, the link farm dies via link density.
- ``html_table_list`` — content carried in ``<li>`` and ``<td>`` cells
  (implied end tags), boilerplate in a hinted sidebar list.

Payload text is HTML-escaped at generation (& < > -> entities); the
extractor unescapes, so round-trip equality is exact.
"""

from __future__ import annotations

from html import escape


def expected_html_text(lines: list[str]) -> str:
    return "\n".join(" ".join(l.split()) for l in lines)


# Non-semantic variants (no <main>/<article>) open with a fixed long
# paragraph: pages whose payload wraps to only SHORT blocks (<=10 chars)
# need one decided-good neighbour for jusText-style propagation — exactly
# how a real article's lede anchors its short trailing lines. It is part
# of the page text, so it is part of the expected text too.
INTRO_LINE = (
    "This page describes the subject matter in careful detail for"
    " interested readers everywhere."
)


# html_win1251 payload substitution: Latin -> Cyrillic homoglyphs, all
# encodable in windows-1251 and all OUTSIDE cp1252, so a wrong decode
# (the UTF-8 or cp1252 fallback) produces visibly different text — the
# variant discriminates the meta-charset sniff end to end.
WIN1251_SUBST = {"a": "а", "e": "е", "o": "о", "c": "с"}


# html_mojibake payload substitution: Latin -> accented latin-1 chars whose
# UTF-8 encodings, re-read as latin-1, produce the classic 'Ã©'-style
# digraphs — the variant discriminates the double-UTF-8 repair end to end
# (an unrepaired decode yields the digraphs, not the expected text).
MOJIBAKE_SUBST = {"a": "á", "e": "é", "o": "ó", "u": "ú", "c": "ç"}

# Fixed intro paragraph for the mojibake variant (the html_messy
# INTRO_LINE pattern): its substitution carries many accented chars, so
# the document ALWAYS crosses `_repair_double_utf8`'s >=3-signature gate
# — a degenerate payload ("empty" fallback has a single accent) would
# otherwise stay deliberately unrepaired and diverge from the expected
# text, which assumes repair.
MOJIBAKE_INTRO = (
    "Each annotated catalogue conveys accurate outcomes because"
    " educators around our coast document everything."
)


def expected_for_variant(name: str, lines: list[str]) -> str:
    if name in ("html_messy", "html_table_list"):
        lines = [INTRO_LINE] + lines
    elif name == "html_win1251":
        lines = [
            "".join(WIN1251_SUBST.get(c, c) for c in l) for l in lines
        ]
    elif name == "html_mojibake":
        lines = [
            "".join(MOJIBAKE_SUBST.get(c, c) for c in l)
            for l in [MOJIBAKE_INTRO] + lines
        ]
    return expected_html_text(lines)


def expected_markdown_for_variant(name: str, lines: list[str]) -> str:
    """Expected ``extract_markdown`` output per variant (same content as
    the plain expected text, structural prefixes per carrier)."""
    norm = [" ".join(l.split()) for l in lines]
    if name in ("html_article", "html_messy"):
        if name == "html_messy":
            norm = [" ".join(INTRO_LINE.split())] + norm
        return "\n\n".join(norm)
    if name == "html_win1251":
        return "\n\n".join(
            " ".join("".join(WIN1251_SUBST.get(c, c) for c in l).split())
            for l in lines
        )
    if name == "html_mojibake":
        return "\n\n".join(
            " ".join("".join(MOJIBAKE_SUBST.get(c, c) for c in l).split())
            for l in [MOJIBAKE_INTRO] + lines
        )
    if name == "html_table_list":
        # INTRO <p>, then alternating <td> (plain) / single-item <ul><li>
        out = [" ".join(INTRO_LINE.split())]
        for i, l in enumerate(norm):
            out.append(("- " + l) if i % 2 else l)
        return "\n\n".join(out)
    if name == "html_structured":
        pieces = []
        for i, l in enumerate(norm):
            k = i % 4
            if k == 0:
                pieces.append(("\n\n", "## " + l))
            elif k == 1:
                pieces.append(("\n\n", "- " + l))
            elif k == 2:
                pieces.append(("\n", "- " + l))  # same <ul> -> single \n
            else:
                pieces.append(("\n\n", l))
        return "".join(
            p if j == 0 else sep + p for j, (sep, p) in enumerate(pieces)
        )
    raise ValueError(name)


_NAV = (
    '<nav class="topnav"><ul>'
    '<li><a href="/">Home</a></li>'
    '<li><a href="/about">About our company</a></li>'
    '<li><a href="/products">Products and services</a></li>'
    '<li><a href="/contact">Contact us today</a></li>'
    "</ul></nav>"
)
_COOKIE = (
    '<div class="cookie-banner">We use cookies to improve your experience.'
    ' <a href="/privacy">Learn more</a></div>'
)
_ASIDE = (
    '<aside><h3>Related articles</h3><ul>'
    '<li><a href="/a1">Ten things you did not know</a></li>'
    '<li><a href="/a2">The complete guide</a></li>'
    "</ul></aside>"
)
_FOOTER = (
    "<footer><p>Copyright 2026 Example Corp. All rights reserved.</p>"
    '<p><a href="/terms">Terms</a> <a href="/privacy">Privacy</a></p></footer>'
)
_HEAD = (
    "<head><title>Example page title</title>"
    "<style>body { margin: 0; } .x > span { color: red; }</style>"
    '<script>if (1 < 2) { document.write("<p>injected</p>"); }</script>'
    '<meta charset="utf-8"></head>'
)


def html_article(lines: list[str]) -> bytes:
    paras = "".join(f"<p>{escape(l)}</p>" for l in lines)
    page = (
        "<!DOCTYPE html><html lang=\"en\">"
        + _HEAD
        + "<body>"
        + '<header><h1><a href="/">Example Site</a></h1></header>'
        + _NAV
        + _COOKIE
        + f"<main><article>{paras}</article></main>"
        + _ASIDE
        + _FOOTER
        + "</body></html>"
    )
    return page.encode("utf-8")


def html_mojibake(lines: list[str]) -> bytes:
    """Double-encoded UTF-8 page (the crawl-scale mojibake class): the
    accented payload's UTF-8 bytes were read as latin-1 by a broken
    origin stack and re-served as UTF-8 under a ``charset=utf-8`` meta.
    Only the ``_repair_double_utf8`` pass yields the expected text; a
    naive decode extracts 'Ã©'-style digraphs."""
    subst = [
        "".join(MOJIBAKE_SUBST.get(c, c) for c in l)
        for l in [MOJIBAKE_INTRO] + lines
    ]
    paras = "".join(f"<p>{escape(l)}</p>" for l in subst)
    page = (
        "<!DOCTYPE html><html>"
        + _HEAD
        + "<body>"
        + _NAV
        + f"<main><article>{paras}</article></main>"
        + _FOOTER
        + "</body></html>"
    )
    return page.encode("utf-8").decode("latin-1").encode("utf-8")


def html_messy(lines: list[str]) -> bytes:
    # unclosed <p> tags, soup attributes, comments, mid-body script
    paras = "".join(f"<p>{escape(l)}\n" for l in [INTRO_LINE] + lines)
    page = (
        "<html><head><title>messy</title></head>"
        "<body bgcolor=white>"
        "<!-- header starts -->"
        '<div class="menu"><a href="/x">one link</a> <a href="/y">two '
        'link</a> <a href="/z">three link</a></div>'
        '<div title="a > b" data-x=\'c > d\'>'
        + paras
        + "</div>"
        "<script type=text/javascript>var s = '<div>not text</div>';</script>"
        "<!-- trailing comment"
        "</body></html>"
    )
    return page.encode("utf-8")


def html_win1251(lines: list[str]) -> bytes:
    """Legacy-charset page: windows-1251 body with a <meta charset> tag.

    The payload is substituted to Cyrillic homoglyphs (WIN1251_SUBST), so
    only the sniffed-charset decode yields the expected text."""
    subst = ["".join(WIN1251_SUBST.get(c, c) for c in l) for l in lines]
    paras = "".join(f"<p>{escape(l)}</p>" for l in subst)
    page = (
        "<!DOCTYPE html><html><head><title>Пример</title>"
        '<meta http-equiv="Content-Type" content="text/html; charset=windows-1251">'
        "</head><body>"
        + _NAV
        + f"<main><article>{paras}</article></main>"
        + _FOOTER
        + "</body></html>"
    )
    return page.encode("windows-1251")


def html_structured(lines: list[str]) -> bytes:
    """Structure-rich page for the markdown tier: payload lines cycle
    through h2 / two-item ul / p carriers inside <main><article>, with
    the standard nav/footer boilerplate around them."""
    body = []
    i = 0
    n = len(lines)
    while i < n:
        k = i % 4
        if k == 0:
            body.append(f"<h2>{escape(lines[i])}</h2>")
            i += 1
        elif k == 1:
            items = f"<li>{escape(lines[i])}</li>"
            if i + 1 < n:
                items += f"<li>{escape(lines[i + 1])}</li>"
                i += 2
            else:
                i += 1
            body.append(f"<ul>{items}</ul>")
        else:  # k == 3
            body.append(f"<p>{escape(lines[i])}</p>")
            i += 1
    page = (
        "<!DOCTYPE html><html>"
        + _HEAD
        + "<body>"
        + _NAV
        + "<main><article>"
        + "".join(body)
        + "</article></main>"
        + _FOOTER
        + "</body></html>"
    )
    return page.encode("utf-8")


def html_table_list(lines: list[str]) -> bytes:
    # alternate carriers in strict line order: odd-indexed lines ride in
    # <li> (implied end tags exercised), even-indexed in <td> cells
    body = [f"<p>{escape(INTRO_LINE)}</p>"]
    for i, l in enumerate(lines):
        if i % 2:
            body.append(f"<ul><li>{escape(l)}</ul>")
        else:
            body.append(f"<table><tr><td>{escape(l)}</table>")
    page = (
        "<!doctype html><html><head><title>t</title></head><body>"
        '<ul class="sidebar-widget"><li>Popular posts<li>Archive<li>Tags</ul>'
        + "".join(body)
        + _FOOTER
        + "</body></html>"
    )
    return page.encode("utf-8")
