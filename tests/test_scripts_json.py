"""core/scripts.py script-mix audit + qx55 JSON shape profile."""

from pdf_spark.core.scripts import script_mix
from pdf_spark.functions.docformats import _qx55_profile


def test_pure_latin_and_neutral_tokens():
    m = script_mix("hello world 123 !!!")
    assert m["n_tokens"] == 2 and m["n_latin"] == 2
    assert m["n_mixed"] == 0 and m["has_spoof"] == 0


def test_homoglyph_token_flags_mixed():
    # 'pаypal' carries U+0430 CYRILLIC SMALL A between Latin letters
    m = script_mix("login pаypal привет")
    assert m["n_mixed"] == 1 and m["has_spoof"] == 1
    assert m["n_cyrillic"] == 1 and m["n_latin"] == 1


def test_single_script_nonlatin_is_not_spoof():
    m = script_mix("καλημέρα κόσμε")
    assert m["n_tokens"] == 2 and m["n_mixed"] == 0


def test_latin_extended_accents_stay_latin():
    m = script_mix("café naïve")
    assert m["n_latin"] == 2 and m["n_mixed"] == 0


def test_json_shape_profile():
    m = _qx55_profile('{"a": 1, "b": {"c": [null, 2]}}')
    assert m["top_type"] == "object"
    assert m["max_depth"] == 3  # object > object > array
    assert m["n_keys"] == 3 and m["n_arrays"] == 1 and m["n_nulls"] == 1
    assert _qx55_profile("[1, 2]")["top_type"] == "array"
    assert _qx55_profile("42")["max_depth"] == 0
    assert _qx55_profile("{bad")["is_json"] == 0


def test_document_router_families():
    from pdf_spark.functions.docformats import (
        _qx43_make_docx,
        _qx44_make_epub,
        _qx45_make_eml,
        _qx46_make_rtf,
        _qx47_make_odt,
        _qx52_make_xlsx,
        _qx53_make_pptx,
        _qx54_make_ical,
        route_document,
    )

    assert route_document(_qx43_make_docx(0)) == "docx"
    assert route_document(_qx52_make_xlsx(0)) == "xlsx"
    assert route_document(_qx53_make_pptx(0)) == "pptx"
    assert route_document(_qx44_make_epub(0)) == "epub"
    assert route_document(_qx47_make_odt(0)) == "odt"
    assert route_document(b"%PDF-1.7\nx") == "pdf"
    assert route_document(rb"{\rtf1 x}") == "rtf"
    assert route_document(_qx54_make_ical(0)) == "ical"
    assert route_document(b"<!DOCTYPE html><html></html>") == "html"
    assert route_document(_qx45_make_eml(0)) == "eml"
    assert route_document(b"HTTP/1.1 200 OK\r\n\r\n") == "http"
    assert route_document(b"just words") == "text"
    # generic zip: neither office nor epub members
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("data/readme.txt", b"x")
    assert route_document(buf.getvalue()) == "zip"
