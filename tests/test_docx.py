"""core/docx.py — WordprocessingML text extraction vs hand-built honest
containers (stdlib zipfile writer; reader shares no code with it)."""

import io
import zipfile

from pdf_spark.core.docx import doc_xml_text, docx_text

_NS = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'


def _wrap(body: str) -> str:
    return f'<?xml version="1.0"?><w:document {_NS}><w:body>{body}</w:body></w:document>'


def _docx(body: str, title: str | None = None) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        )
        z.writestr("word/document.xml", _wrap(body))
        if title is not None:
            z.writestr(
                "docProps/core.xml",
                '<?xml version="1.0"?><cp:coreProperties '
                'xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" '
                'xmlns:dc="http://purl.org/dc/elements/1.1/">'
                f"<dc:title>{title}</dc:title></cp:coreProperties>",
            )
    return buf.getvalue()


def test_plain_paragraphs_and_split_runs():
    body = (
        "<w:p><w:r><w:t>Hello </w:t></w:r><w:r><w:t>world</w:t></w:r></w:p>"
        "<w:p><w:r><w:t>Second</w:t></w:r></w:p>"
    )
    text, n = doc_xml_text(_wrap(body))
    assert text == "Hello world\nSecond" and n == 2


def test_tab_br_preserve_space_and_entities():
    body = (
        '<w:p><w:r><w:t xml:space="preserve">A&amp;B&lt;C </w:t></w:r>'
        "<w:r><w:tab/><w:t>D&#65;&#x42;</w:t><w:br/><w:t>E</w:t></w:r></w:p>"
    )
    text, n = doc_xml_text(_wrap(body))
    assert text == "A&B<C \tDAB\nE" and n == 1


def test_tracked_changes_accepted_view():
    body = (
        "<w:p><w:ins><w:r><w:t>kept</w:t></w:r></w:ins>"
        "<w:del><w:r><w:delText>gone</w:delText></w:r></w:del>"
        "<w:r><w:t> tail</w:t></w:r></w:p>"
    )
    text, n = doc_xml_text(_wrap(body))
    assert text == "kept tail" and n == 1


def test_table_cells_flow_and_tbl_count():
    body = (
        "<w:p><w:r><w:t>Head</w:t></w:r></w:p>"
        "<w:tbl><w:tblPr/><w:tr>"
        "<w:tc><w:p><w:r><w:t>c1</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>c2</w:t></w:r></w:p></w:tc>"
        "</w:tr></w:tbl>"
    )
    meta = docx_text(_docx(body, title="T&amp;1"))
    assert meta["is_docx"] == 1
    assert meta["text"] == "Head\nc1\nc2"
    assert meta["n_paragraphs"] == 3
    assert meta["n_tables"] == 1  # tblPr must not double-count
    assert meta["title"] == "T&1"


def test_empty_selfclosing_t_and_empty_paragraph():
    body = "<w:p><w:r><w:t/></w:r></w:p><w:p><w:r><w:t>x</w:t></w:r></w:p>"
    text, n = doc_xml_text(_wrap(body))
    assert text == "\nx" and n == 2


def test_not_docx_routes_nulls():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.txt", b"plain zip, no word part")
    for blob in (buf.getvalue(), b"\x89PNG not a zip"):
        meta = docx_text(blob)
        assert meta["is_docx"] == 0 and meta["text"] is None


def test_truncated_document_part_keeps_prefix_text():
    # Unterminated trailing paragraph still yields its accumulated runs.
    xml = _wrap("<w:p><w:r><w:t>partial</w:t></w:r>")
    text, n = doc_xml_text(xml)
    assert text == "partial" and n == 1
