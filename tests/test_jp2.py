"""JPEG 2000 structural parse (core/jp2.py) vs its own encoders.

The reference has no JPEG 2000 surface (filters.c: ASCIIHex+Flate only);
this closes the /JPXDecode route at the qm20/qm35 header-walk tier.
"""

import struct

from pdf_spark.core.jp2 import encode_j2k, encode_jp2, jp2_meta


def test_jp2_container_roundtrip():
    m = jp2_meta(encode_jp2(200, 300, n_comp=3, prog=2, levels=4, layers=8))
    assert m["valid"] == 1 and m["error"] is None
    assert m["container"] == "jp2"
    assert (m["w"], m["h"], m["n_comp"]) == (200, 300, 3)
    assert m["n_tiles"] == 4 * 5  # 64px tiles
    assert m["prog"] == "RPCL"
    assert m["n_levels"] == 4 and m["n_layers"] == 8
    assert m["has_qcd"] == 1 and m["truncated"] == 0


def test_raw_codestream_and_tile_parts():
    m = jp2_meta(encode_j2k(100, 50, tile=32, n_tile_parts=3))
    assert m["container"] == "j2k" and m["valid"] == 1
    assert m["n_tiles"] == 4 * 2
    assert m["n_sot"] == 3


def test_truncation_no_eoc():
    m = jp2_meta(encode_j2k(64, 64, with_eoc=False))
    assert m["valid"] == 0 and m["error"] == "truncated"
    assert m["truncated"] == 1
    assert m["w"] == 64  # headers still recovered


def test_ihdr_siz_mismatch_detected():
    bad = encode_jp2(128, 128, ihdr_override=(64, 64, 1))
    m = jp2_meta(bad)
    assert m["valid"] == 0 and m["error"] == "ihdr_mismatch"


def test_garbage_and_bounds():
    assert jp2_meta(b"")["error"] == "bad_magic"
    assert jp2_meta(b"\x89PNG\r\n\x1a\n")["error"] == "bad_magic"
    assert jp2_meta(struct.pack(">H", 0xFF4F))["error"] == "short"
    # box that claims past the end
    blob = bytearray(encode_jp2(64, 64))
    struct.pack_into(">I", blob, 12, 1 << 30)
    assert jp2_meta(bytes(blob))["error"] == "box_bounds"


def test_prog_orders_all():
    for k, name in enumerate(("LRCP", "RLCP", "RPCL", "PCRL", "CPRL")):
        assert jp2_meta(encode_j2k(64, 64, prog=k))["prog"] == name
