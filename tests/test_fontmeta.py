"""core/fontmeta.py::font_meta — name/head/maxp identification + WOFF1 unwrap
vs the honest sfnt/WOFF writers in functions/docformats.py."""

from pdf_spark.core.fontmeta import font_meta
from pdf_spark.functions.docformats import (
    _build_name_table,
    _build_sfnt,
    _build_woff,
    _font_tables,
)


def test_raw_ttf_identification():
    data = _build_sfnt(
        b"\x00\x01\x00\x00", _font_tables("Family X", "Regular", 123, 1000)
    )
    m = font_meta(data)
    assert m == {
        "is_font": 1,
        "is_woff": 0,
        "is_cff": 0,
        "family": "Family X",
        "subfamily": "Regular",
        "n_glyphs": 123,
        "units_per_em": 1000,
    }


def test_otto_flavor_flags_cff():
    data = _build_sfnt(b"OTTO", _font_tables("Serif", "Bold", 9, 2048))
    m = font_meta(data)
    assert m["is_cff"] == 1 and m["family"] == "Serif"


def test_woff1_unwrap_with_zlib_tables():
    data = _build_woff(
        b"\x00\x01\x00\x00", _font_tables("Packed", "Regular", 77, 2048)
    )
    m = font_meta(data)
    assert m["is_woff"] == 1
    assert m["family"] == "Packed" and m["n_glyphs"] == 77
    assert m["units_per_em"] == 2048


def test_mac_roman_fallback_when_no_windows_record():
    name = _build_name_table([(1, 0, 0, 1, "MacOnly"), (1, 0, 0, 2, "Light")])
    tables = [t for t in _font_tables("x", "x", 5, 1000) if t[0] != b"name"]
    data = _build_sfnt(b"\x00\x01\x00\x00", tables + [(b"name", name)])
    m = font_meta(data)
    assert m["family"] == "MacOnly" and m["subfamily"] == "Light"


def test_not_font_and_truncated():
    assert font_meta(b"\x89PNG junk")["is_font"] == 0
    data = _build_sfnt(
        b"\x00\x01\x00\x00", _font_tables("F", "R", 10, 1000)
    )
    m = font_meta(data[:30])  # directory cut mid-entry
    assert m["is_font"] == 1 and m["family"] is None


def test_ttc_collection_sharing_and_truncation():
    from pdf_spark.core.fontmeta import encode_ttc, ttc_audit

    shared = b"\x01" * 40
    head = b"\x03" * 12
    f = encode_ttc(
        [
            [(b"cmap", shared), (b"glyf", b"\x02" * 20), (b"head", head)],
            [(b"cmap", shared), (b"glyf", b"\x04" * 24), (b"head", head)],
        ]
    )
    a = ttc_audit(f)
    assert a["is_ttc"] == 1 and a["n_fonts"] == 2
    assert a["n_valid_faces"] == 2 and a["n_table_records"] == 6
    assert a["shared_permille"] == 333  # cmap + head pooled
    # fully shared faces
    face = [(b"cmap", shared), (b"head", head)]
    a = ttc_audit(encode_ttc([face, list(face), list(face)]))
    assert a["shared_permille"] == 666 and a["n_valid_faces"] == 3
    # truncation inside the face directory + rejects
    a = ttc_audit(f[:40])
    assert a["truncated"] == 1 and a["n_valid_faces"] == 0
    assert ttc_audit(b"\x00\x01\x00\x00 sfnt")["is_ttc"] == 0
    assert ttc_audit(b"ttcf")["is_ttc"] == 0
