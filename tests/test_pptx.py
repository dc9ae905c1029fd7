"""core/pptx.py — DrawingML slide text vs honest containers."""

import io
import zipfile

from pdf_spark.core.pptx import pptx_text

_NS = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'


def _slide(*paras):
    body = "".join(
        "<a:p>" + "".join(f"<a:r><a:t>{t}</a:t></a:r>" for t in runs)
        + "</a:p>"
        for runs in paras
    )
    return f'<?xml version="1.0"?><p:sld {_NS}><p:txBody>{body}</p:txBody></p:sld>'


def _pptx(slides):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("ppt/presentation.xml", "<p:presentation/>")
        for num, xml in slides:
            z.writestr(f"ppt/slides/slide{num}.xml", xml)
    return buf.getvalue()


def test_slides_numeric_order_not_lexicographic():
    # slide10 must come AFTER slide9 (lexicographic would put it second)
    data = _pptx(
        [
            (10, _slide(("Tenth",))),
            (1, _slide(("First",))),
            (9, _slide(("Ninth",))),
        ]
    )
    m = pptx_text(data)
    assert m["is_pptx"] == 1 and m["n_slides"] == 3
    assert m["text"] == "First\n\nNinth\n\nTenth"


def test_split_runs_break_and_entities():
    xml = (
        f'<?xml version="1.0"?><p:sld {_NS}><p:txBody>'
        "<a:p><a:r><a:t>Hel</a:t></a:r><a:r><a:t>lo &amp; hi</a:t></a:r>"
        "<a:br/><a:r><a:t>next</a:t></a:r></a:p>"
        "<a:p></a:p>"  # empty paragraph dropped
        "<a:p><a:r><a:t>Second</a:t></a:r></a:p>"
        "</p:txBody></p:sld>"
    )
    m = pptx_text(_pptx([(1, xml)]))
    assert m["text"] == "Hel" + "lo & hi\nnext\nSecond"
    assert m["n_paragraphs"] == 2


def test_not_pptx_routes_nulls():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/workbook.xml", b"<wb/>")
    for blob in (buf.getvalue(), b"junk"):
        m = pptx_text(blob)
        assert m["is_pptx"] == 0 and m["text"] is None
