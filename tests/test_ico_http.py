"""core/imaging.py::ico_meta + sources/warc.py::http_header_audit."""

import struct

from pdf_spark.core.imaging import ico_meta
from pdf_spark.sources.warc import http_header_audit


def _ico(entries, kind=1):
    hdr = struct.pack("<HHH", 0, kind, len(entries))
    dirb, body = b"", b""
    base = 6 + 16 * len(entries)
    for w, h, payload in entries:
        dirb += struct.pack(
            "<BBBBHHII", w, h, 0, 0, 1, 32, len(payload), base + len(body)
        )
        body += payload
    return hdr + dirb + body


def test_ico_zero_means_256_and_png_frame():
    png = b"\x89PNG\r\n\x1a\n" + b"frame"
    m = ico_meta(_ico([(16, 16, b"bmp"), (0, 0, png)]))
    assert m["is_ico"] == 1 and m["is_cursor"] == 0
    assert m["n_images"] == 2
    assert m["max_width"] == 256 and m["max_height"] == 256
    assert m["has_png_frame"] == 1


def test_cursor_type_and_plain_bmp_frames():
    m = ico_meta(_ico([(32, 32, b"x" * 40)], kind=2))
    assert m["is_cursor"] == 1 and m["has_png_frame"] == 0
    assert m["max_width"] == 32


def test_ico_rejects_nonzero_reserved_truncated_and_junk():
    good = _ico([(16, 16, b"d")])
    assert ico_meta(b"\x01" + good[1:])["is_ico"] == 0
    assert ico_meta(good[:10])["is_ico"] == 0
    assert ico_meta(b"\x89PNG junk")["is_ico"] == 0


def test_http_policy_headers():
    raw = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=UTF-8\r\n"
        b"Cache-Control: public, max-age=360\r\n"
        b"Content-Language: en, fr\r\n"
        b"X-Robots-Tag: noindex, nofollow\r\n"
        b"Content-Encoding: gzip\r\n"
        b"Strict-Transport-Security: max-age=63072000\r\n\r\nbody"
    )
    m = http_header_audit(raw)
    assert m["status"] == 200 and m["mime"] == "text/html"
    assert m["charset"] == "utf-8" and m["lang"] == "en"
    assert m["max_age"] == 360 and m["noindex"] == 1
    assert m["gzipped"] == 1 and m["hsts"] == 1


def test_http_redirect_host_lowercased():
    m = http_header_audit(
        b"HTTP/1.1 301 Moved\r\nLocation: https://CDN2.Example.com/p/9\r\n\r\n"
    )
    assert m["status"] == 301
    assert m["location_host"] == "cdn2.example.com"
    assert m["mime"] is None and m["noindex"] == 0


def test_http_rejects_non_http():
    assert http_header_audit(b"\x89PNG bytes")["is_http"] == 0
    assert http_header_audit(b"")["is_http"] == 0


def test_png_integrity_walk():
    from pdf_spark.core.imaging import encode_png, png_integrity

    ok = encode_png(4, 4, 1, bytes(range(16)))
    m = png_integrity(ok)
    assert m == {
        "is_png": 1,
        "n_chunks": 3,
        "n_bad_crc": 0,
        "has_iend": 1,
        "truncated": 0,
    }
    bad = bytearray(ok)
    bad[-1] ^= 0xFF  # IEND CRC
    m = png_integrity(bytes(bad))
    assert m["n_bad_crc"] == 1 and m["has_iend"] == 1
    m = png_integrity(ok[:40])
    assert m["truncated"] == 1 and m["n_chunks"] == 1
    assert png_integrity(b"JFIF")["is_png"] == 0


def test_jpeg_integrity_walk():
    from pdf_spark.core.imaging import (
        encode_exif_app1,
        encode_jpeg,
        jpeg_integrity,
        splice_exif,
    )

    full = encode_jpeg(32, 16, [(100, 0) for _ in range(8)])
    m = jpeg_integrity(full)
    assert m["has_eoi"] == 1 and m["truncated"] == 0
    assert m["n_segments"] == 5
    ex = splice_exif(full, encode_exif_app1(orientation=3, make="C"))
    m = jpeg_integrity(ex)
    assert m["has_exif"] == 1 and m["n_segments"] == 6
    cut = full[: full.find(b"\xff\xda")]
    m = jpeg_integrity(cut)
    assert m["truncated"] == 1 and m["has_eoi"] == 0
    assert jpeg_integrity(b"\x89PNG")["is_jpeg"] == 0
