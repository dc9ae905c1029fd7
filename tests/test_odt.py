"""core/odt.py — OpenDocument extraction vs honest zipfile containers."""

import io
import zipfile

from pdf_spark.core.odt import content_xml_text, odt_text

_PRE = (
    '<?xml version="1.0"?><office:document-content '
    'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
    'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
    "<office:body><office:text>"
)
_POST = "</office:text></office:body></office:document-content>"


def _odt(body: str, title: str | None = None) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        z.writestr("content.xml", _PRE + body + _POST)
        if title is not None:
            z.writestr(
                "meta.xml",
                '<?xml version="1.0"?><office:document-meta '
                'xmlns:dc="http://purl.org/dc/elements/1.1/">'
                f"<office:meta><dc:title>{title}</dc:title></office:meta>"
                "</office:document-meta>",
            )
    return buf.getvalue()


def test_paragraphs_and_spans_transparent():
    body = (
        '<text:p text:style-name="P1">Hello <text:span text:style-name="T1">'
        "bold</text:span> world</text:p><text:p>Second</text:p>"
    )
    text, n_p, n_h = content_xml_text(_PRE + body + _POST)
    assert text == "Hello bold world\nSecond"
    assert n_p == 2 and n_h == 0


def test_tab_linebreak_runlength_spaces_entities():
    body = (
        "<text:p>A<text:tab/>B<text:line-break/>C"
        '<text:s text:c="3"/>D<text:s/>E &amp;&#x41;</text:p>'
    )
    text, n_p, _ = content_xml_text(_PRE + body + _POST)
    assert text == "A\tB\nC   D E &A" and n_p == 1


def test_heading_counted_and_annotation_dropped():
    body = (
        '<text:h text:outline-level="1">Title here</text:h>'
        "<text:p>Body<office:annotation><dc:creator>R</dc:creator>"
        "<text:p>margin note</text:p></office:annotation> text</text:p>"
    )
    text, n_p, n_h = content_xml_text(_PRE + body + _POST)
    assert text == "Title here\nBody text"
    assert n_p == 2 and n_h == 1


def test_style_section_text_outside_paragraphs_ignored():
    xml = (
        '<?xml version="1.0"?><office:automatic-styles>stray</office:automatic-styles>'
        + _PRE
        + "<text:p>real</text:p>"
        + _POST
    )
    text, n_p, _ = content_xml_text(xml)
    assert text == "real" and n_p == 1


def test_full_container_with_title():
    meta = odt_text(_odt("<text:p>Doc body</text:p>", title="My &amp; Title"))
    assert meta["is_odt"] == 1
    assert meta["text"] == "Doc body"
    assert meta["title"] == "My & Title"


def test_not_odt_routes_nulls():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("other.xml", b"<x/>")
    for blob in (buf.getvalue(), b"not a zip"):
        meta = odt_text(blob)
        assert meta["is_odt"] == 0 and meta["text"] is None
