"""CCITTFaxDecode (ITU-T T.4/T.6) — round-trips, PDF wiring, fuzz.

The one high-frequency real-corpus decode that was still routed to
"native" (VERDICT r4 task 6): scanned PDFs are overwhelmingly
G4-in-PDF. The reference implements only ASCIIHex+Flate
(libs/pdf/src/stream/filters.c:11-72), so this extends the E10/E11
filter pattern from the public specs.
"""

import random

import pytest

from pdf_spark.core.ccitt import (
    ccitt_decode,
    encode_ccitt_g3_1d,
    encode_ccitt_g4,
)
from pdf_spark.core.errors import PdfError


def _unpack(data, columns, h, black_is_1=False):
    stride = (columns + 7) // 8
    want_black = 1 if black_is_1 else 0
    return [
        [
            1
            if ((data[y * stride + (x >> 3)] >> (7 - (x & 7))) & 1)
            == want_black
            else 0
            for x in range(columns)
        ]
        for y in range(h)
    ]


def _rand_image(rng, w, h, style):
    if style == 0:
        return [[rng.randint(0, 1) for _ in range(w)] for _ in range(h)]
    if style == 1:
        return [
            [1 if (x // 3 + y // 2) % 2 else 0 for x in range(w)]
            for y in range(h)
        ]
    if style == 2:
        return [[0] * w for _ in range(h)]
    return [[1] * w for _ in range(h)]


def test_g4_roundtrip_matrix():
    rng = random.Random(7)
    for trial in range(24):
        w = rng.choice([5, 8, 16, 33, 64, 100, 400])
        h = rng.randint(1, 10)
        img = _rand_image(rng, w, h, trial % 4)
        dec = ccitt_decode(encode_ccitt_g4(img, w), columns=w, rows=h, k=-1)
        assert _unpack(dec, w, h) == img


def test_g4_eofb_terminates_without_rows():
    img = [[1 if x % 5 == 0 else 0 for x in range(40)] for _ in range(6)]
    dec = ccitt_decode(encode_ccitt_g4(img, 40), columns=40, k=-1)
    assert len(dec) == 6 * 5
    assert _unpack(dec, 40, 6) == img


def test_g3_1d_roundtrip_eol_and_noeol():
    rng = random.Random(3)
    for trial in range(16):
        w = rng.choice([7, 16, 33, 80])
        h = rng.randint(1, 6)
        img = _rand_image(rng, w, h, trial % 4)
        for with_eol in (True, False):
            enc = encode_ccitt_g3_1d(img, w, with_eol=with_eol)
            dec = ccitt_decode(enc, columns=w, rows=h, k=0)
            assert _unpack(dec, w, h) == img


def test_byte_align_and_black_is_1():
    img = [[1 if x % 4 == 0 else 0 for x in range(20)] for _ in range(5)]
    enc = encode_ccitt_g3_1d(img, 20, with_eol=False, byte_align=True)
    dec = ccitt_decode(enc, columns=20, rows=5, k=0, byte_align=True)
    assert _unpack(dec, 20, 5) == img
    dec1 = ccitt_decode(
        encode_ccitt_g4(img, 20), columns=20, rows=5, k=-1, black_is_1=True
    )
    assert _unpack(dec1, 20, 5, black_is_1=True) == img


def test_makeup_codes_long_runs():
    # runs needing makeup + terminating pairs, incl. >1728 via ext codes
    for w, t in ((2000, 1800), (1728, 900), (256, 200)):
        img = [[1] * t + [0] * (w - t)]
        dec = ccitt_decode(encode_ccitt_g4(img, w), columns=w, rows=1, k=-1)
        assert _unpack(dec, w, 1) == img


def test_short_rows_raise():
    img = [[0, 1] * 8 for _ in range(4)]
    enc = encode_ccitt_g4(img, 16)
    with pytest.raises(PdfError):
        ccitt_decode(enc, columns=16, rows=9, k=-1)


def test_decode_stream_wiring():
    """decode_stream routes CCITTFaxDecode with PDF-default and explicit
    parms (and resolves them), composing with a transport filter."""
    import zlib

    from pdf_spark.core.filters import decode_stream

    img = [[1] * 4 + [0] * 12 for _ in range(8)]
    fax = encode_ccitt_g4(img, 16)
    out = decode_stream(
        {
            "Filter": "CCITTFaxDecode",
            "DecodeParms": {"K": -1, "Columns": 16, "Rows": 8},
        },
        fax,
    )
    assert _unpack(out, 16, 8) == img
    # chained: FlateDecode transport then fax
    out2 = decode_stream(
        {
            "Filter": ["FlateDecode", "CCITTFaxDecode"],
            "DecodeParms": [None, {"K": -1, "Columns": 16, "Rows": 8}],
        },
        zlib.compress(fax),
    )
    assert out2 == out


def test_fuzz_ccitt_decode_never_hangs():
    """Mutation campaign: truncations, bit flips, random tails — decode
    must finish fast and raise only PdfError."""
    import signal

    def _alarm(*_a):
        raise AssertionError("ccitt_decode hung")

    rng = random.Random(23)
    img = [[rng.randint(0, 1) for _ in range(64)] for _ in range(16)]
    fixtures = [
        encode_ccitt_g4(img, 64),
        encode_ccitt_g3_1d(img, 64),
        encode_ccitt_g3_1d(img, 64, with_eol=False),
    ]
    signal.signal(signal.SIGALRM, _alarm)
    for fi, base in enumerate(fixtures):
        muts = [base[: len(base) // 2], base + b"\xff" * 8, b"", b"\x00" * 64]
        for _ in range(60):
            b = bytearray(base)
            for _k in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            muts.append(bytes(b))
        for blob in muts:
            for k in (-1, 0, 4):
                signal.alarm(5)
                try:
                    ccitt_decode(blob, columns=64, rows=16, k=k)
                except PdfError:
                    pass
                finally:
                    signal.alarm(0)
