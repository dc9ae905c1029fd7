"""HTTP chunked decoding + WOFF container audit unit tests."""

import struct

from pdf_spark.core.httpwire import dechunk, encode_chunked
from pdf_spark.core.woff import encode_woff, woff_audit


def test_dechunk_roundtrip_and_trailer():
    f = encode_chunked([b"hello ", b"world", b"x" * 300], trailer=b"X-S: 1")
    r = dechunk(f)
    assert r["ok"] == 1 and r["malformed"] == 0
    assert r["n_chunks"] == 3 and r["has_trailer"] == 1
    assert r["body"] == b"hello world" + b"x" * 300


def test_dechunk_tolerances():
    # bare LF + chunk extension; hex sizes upper/lower
    r = dechunk(b"5;ext=a\nhello\nA\n0123456789\n0\n\n")
    assert r["ok"] == 1 and r["body"] == b"hello0123456789"
    # empty body, no trailer
    r = dechunk(encode_chunked([]))
    assert r["ok"] == 1 and r["body_len"] == 0 and r["has_trailer"] == 0


def test_dechunk_malformed_and_truncated():
    r = dechunk(b"zz\r\nnope")
    assert r["malformed"] == 1 and r["n_chunks"] == 0
    f = encode_chunked([b"a" * 10, b"b" * 20])
    r = dechunk(f[:25])  # cut inside second chunk's data
    assert r["malformed"] == 1 and r["ok"] == 0
    assert r["body"] == b"a" * 10 + b"b" * 6  # partial retained


def test_woff1_inventory_and_flavors():
    f = encode_woff(
        [(b"cmap", b"\x00" * 12), (b"glyf", b"\x01" * 30)], meta=b"<m/>"
    )
    a = woff_audit(f)
    assert a["woff_version"] == 1 and a["flavor"] == "truetype"
    assert a["n_tables"] == 2 and a["has_metadata"] == 1
    assert a["length_ok"] == 1 and a["truncated"] == 0
    a = woff_audit(encode_woff([(b"CFF ", b"\x02" * 8)], flavor=0x4F54544F))
    assert a["flavor"] == "cff" and a["has_metadata"] == 0


def test_woff_truncation_and_rejects():
    f = encode_woff([(b"cmap", b"\x00" * 12)])
    a = woff_audit(f[:50])  # cut inside the directory
    assert a["truncated"] == 1 and a["length_ok"] == 0
    assert woff_audit(b"\x00\x01\x00\x00 raw sfnt")["is_woff"] == 0
    assert woff_audit(b"wOF")["is_woff"] == 0


def test_woff2_header_only():
    w2 = b"wOF2" + struct.pack(">IIH", 0x4F54544F, 48, 7) + b"\x00" * 34
    a = woff_audit(w2)
    assert a["woff_version"] == 2 and a["flavor"] == "cff"
    assert a["n_tables"] == 7 and a["length_ok"] == 1
    assert a["has_metadata"] is None  # directory lives in the Brotli stream
