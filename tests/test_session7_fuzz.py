"""Mutation campaign over this session's byte-walking analyzers (WASM /
Ogg / WOFF / chunked-HTTP / charset / sentence / data-URI / SPA): seeded
byte flips, truncations, and splices on valid fixtures must return a
result dict — never raise, hang, or allocate unboundedly. The 10^12-blob
corpus guarantees malformed bytes; the audit row IS the contract (same
discipline as test_media_fuzz.py)."""

import random
import signal


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout()


def _mutations(base: bytes, seed: int, n: int = 120):
    rng = random.Random(seed)
    for _ in range(n):
        b = bytearray(base)
        op = rng.randrange(4)
        if op == 0 and b:  # flip bytes
            for _k in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif op == 1 and b:  # truncate
            del b[rng.randrange(len(b)):]
        elif op == 2:  # splice garbage
            pos = rng.randrange(len(b) + 1)
            b[pos:pos] = bytes(rng.randrange(256) for _ in range(8))
        else:  # duplicate a slice
            if len(b) > 4:
                s = rng.randrange(len(b) - 2)
                b[s:s] = b[s:s + rng.randrange(2, 16)]
        yield bytes(b)


def _campaign(fn, fixtures, seed):
    signal.signal(signal.SIGALRM, _alarm)
    for i, base in enumerate(fixtures):
        for blob in _mutations(base, seed + i):
            signal.alarm(5)
            try:
                out = fn(blob)
                assert isinstance(out, dict)
            finally:
                signal.alarm(0)


def test_fuzz_wasm_audit():
    from pdf_spark.core.wasm import encode_wasm, wasm_audit

    fixtures = [
        encode_wasm(
            [(1, b"\x01\x60\x00\x00"), (0, b"\x04name" + b"x" * 200),
             (10, b"\x01\x02\x00\x0b"), (7, b"\x00")]
        ),
        encode_wasm([]),
    ]
    _campaign(wasm_audit, fixtures, seed=11)


def test_fuzz_ogg_audit():
    from pdf_spark.core.oggread import encode_ogg_page, ogg_audit

    fixtures = [
        encode_ogg_page(7, 0, b"\x01vorbis" + b"h" * 20, bos=True)
        + encode_ogg_page(7, 1, b"x" * 300)
        + encode_ogg_page(7, 2, b"tail", eos=True),
    ]
    _campaign(ogg_audit, fixtures, seed=12)


def test_fuzz_woff_audit():
    from pdf_spark.core.woff import encode_woff, woff_audit

    fixtures = [
        encode_woff(
            [(b"cmap", b"\x00" * 12), (b"glyf", b"\x01" * 30)],
            meta=b"<metadata/>",
        ),
    ]
    _campaign(woff_audit, fixtures, seed=13)


def test_fuzz_dechunk():
    from pdf_spark.core.httpwire import dechunk, encode_chunked

    fixtures = [
        encode_chunked([b"hello ", b"world", b"x" * 300], trailer=b"T: 1"),
        encode_chunked([]),
    ]
    _campaign(dechunk, fixtures, seed=14)


def test_fuzz_html_audits():
    from pdf_spark.core.htmlaudit import (
        charset_detect,
        data_uri_inventory,
        hreflang_audit,
        spa_shell_audit,
    )

    base = (
        b'\xef\xbb\xbf<html lang="en"><head>'
        b'<meta charset="utf-8">'
        b'<link rel="alternate" hreflang="fr" href="/fr">'
        b'</head><body><div id="root"></div>'
        b'<img src="data:image/png;base64,QUJDREVGRw==">'
        b"<script>boot();</script></body></html>"
    )
    for fn, seed in (
        (charset_detect, 15),
        (hreflang_audit, 16),
        (spa_shell_audit, 17),
        (data_uri_inventory, 18),
    ):
        _campaign(fn, [base], seed)


def test_fuzz_sentence_split_on_mangled_text():
    from pdf_spark.core.sentseg import sentence_split

    rng = random.Random(19)
    base = "Dr. A met B. The value was 3.5 today! Done... Right? Yes."
    signal.signal(signal.SIGALRM, _alarm)
    for _ in range(200):
        chars = list(base)
        for _k in range(rng.randrange(1, 8)):
            pos = rng.randrange(len(chars))
            chars[pos] = chr(rng.randrange(32, 0x2FF))
        signal.alarm(5)
        try:
            out = sentence_split("".join(chars))
            assert isinstance(out["n_sentences"], int)
        finally:
            signal.alarm(0)


def test_fuzz_mp3_audit():
    from pdf_spark.core.mp3 import encode_mp3_frames, mp3_audit

    fixtures = [
        encode_mp3_frames([128, 192, 128], id3_size=30),
        encode_mp3_frames([64] * 3, samplerate=32000),
    ]
    _campaign(mp3_audit, fixtures, seed=20)


def test_fuzz_ttc_audit():
    from pdf_spark.core.fontmeta import encode_ttc, ttc_audit

    shared = b"\x01" * 40
    fixtures = [
        encode_ttc(
            [
                [(b"cmap", shared), (b"glyf", b"\x02" * 20)],
                [(b"cmap", shared), (b"glyf", b"\x04" * 24)],
            ]
        ),
    ]
    _campaign(ttc_audit, fixtures, seed=21)
