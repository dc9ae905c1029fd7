"""core/epub.py — spine-ordered EPUB extraction vs honest zipfile-built
containers."""

import io
import zipfile

from pdf_spark.core.epub import epub_text

_CONTAINER = (
    '<?xml version="1.0"?><container version="1.0" '
    'xmlns="urn:oasis:names:tc:opendocument:xmlns:container"><rootfiles>'
    '<rootfile full-path="{opf}" media-type="application/oebps-package+xml"/>'
    "</rootfiles></container>"
)


def _epub(opf_path, opf_xml, chapters):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("mimetype", "application/epub+zip")
        z.writestr("META-INF/container.xml", _CONTAINER.format(opf=opf_path))
        z.writestr(opf_path, opf_xml)
        for name, html in chapters:
            z.writestr(name, html)
    return buf.getvalue()


def _opf(items, spine, title="T", lang="en"):
    manifest = "".join(
        f'<item id="{i}" href="{h}" media-type="application/xhtml+xml"/>'
        for i, h in items
    )
    refs = "".join(f'<itemref idref="{i}"/>' for i in spine)
    return (
        '<?xml version="1.0"?><package xmlns="http://www.idpf.org/2007/opf" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/" version="3.0">'
        f"<metadata><dc:title>{title}</dc:title>"
        f"<dc:language>{lang}</dc:language></metadata>"
        f"<manifest>{manifest}</manifest><spine>{refs}</spine></package>"
    )


def test_spine_order_wins_over_zip_order():
    data = _epub(
        "OEBPS/content.opf",
        _opf([("c1", "ch1.xhtml"), ("c2", "ch2.xhtml")], ["c2", "c1"]),
        [
            ("OEBPS/ch1.xhtml", "<html><body><p>First file</p></body></html>"),
            ("OEBPS/ch2.xhtml", "<html><body><p>Second file</p></body></html>"),
        ],
    )
    meta = epub_text(data)
    assert meta["is_epub"] == 1
    assert meta["text"] == "Second file\n\nFirst file"
    assert meta["n_chapters"] == 2
    assert meta["title"] == "T" and meta["language"] == "en"


def test_relative_href_resolution_and_missing_member_dropped():
    data = _epub(
        "OEBPS/content.opf",
        _opf(
            [("c1", "text/ch1.xhtml"), ("gone", "text/missing.xhtml")],
            ["c1", "gone", "undeclared"],
        ),
        [("OEBPS/text/ch1.xhtml", "<html><body><p>Deep one</p></body></html>")],
    )
    meta = epub_text(data)
    assert meta["text"] == "Deep one" and meta["n_chapters"] == 1


def test_multi_paragraph_chapter_blocks():
    data = _epub(
        "content.opf",
        _opf([("c1", "c.xhtml")], ["c1"], title="Multi", lang="fr"),
        [("c.xhtml", "<html><body><h1>Head</h1><p>One</p><p>Two</p></body></html>")],
    )
    meta = epub_text(data)
    assert meta["text"] == "Head\nOne\nTwo"
    assert meta["title"] == "Multi" and meta["language"] == "fr"


def test_not_epub_routes_nulls():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.txt", b"zip but no container.xml")
    for blob in (buf.getvalue(), b"not a zip at all"):
        meta = epub_text(blob)
        assert meta["is_epub"] == 0 and meta["text"] is None
