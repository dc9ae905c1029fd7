"""Mutation campaign over the round-5 session's new byte-walkers:
JPEG 2000 (jp2/j2k), ICC profiles, glyf outlines, Type 2 / Type 1
charstrings, Type 1 font programs, PDF functions/calculator, the
rasterizer fixture path, and the revision-chain auditor.

Contract (same as test_media_fuzz): seeded flips, truncations, and
splices on valid fixtures must return a result-or-None (or raise
PdfError for the COS-layer paths) — never a non-Exception crash,
unbounded allocation, or hang (5 s alarm per call on <=4 KB inputs).
"""

import random
import signal

import pytest

from pdf_spark.core.errors import PdfError

_ROUNDS = 120


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout()


def _mutations(base: bytes, seed: int):
    rng = random.Random(seed)
    n = len(base)
    for _ in range(_ROUNDS):
        kind = rng.randrange(3)
        buf = bytearray(base)
        if kind == 0:  # flips
            for _ in range(rng.randrange(1, 4)):
                buf[rng.randrange(n)] ^= 1 << rng.randrange(8)
        elif kind == 1:  # truncation
            del buf[rng.randrange(1, n):]
        else:  # splice a duplicated slice
            a, b = sorted(rng.randrange(n) for _ in range(2))
            buf[a:a] = buf[a:b]
        yield bytes(buf)


def _drive(fixture: bytes, fn, seed: int, allowed=(PdfError, ValueError)):
    old = signal.signal(signal.SIGALRM, _alarm)
    try:
        for blob in _mutations(fixture, seed):
            signal.alarm(5)
            try:
                out = fn(blob)
                assert out is None or isinstance(out, (dict, tuple, list))
            except allowed:
                pass
            finally:
                signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)


def test_jp2_meta_fuzz():
    from pdf_spark.core.jp2 import encode_jp2, jp2_meta

    _drive(encode_jp2(96, 64, n_comp=3, n_tile_parts=2), jp2_meta, 11)


def test_icc_meta_fuzz():
    from pdf_spark.core.icc import encode_icc, icc_meta

    _drive(encode_icc(), icc_meta, 12)


def test_glyf_outlines_fuzz():
    from pdf_spark.core.outlines import encode_glyf_font, glyf_outlines

    rect = [[(0, 0), (90, 0), (90, 120), (0, 120)]]
    comp = ("composite", [(0, 4, 6)])
    font = encode_glyf_font([rect, comp], [500, 510])
    _drive(font, glyf_outlines, 13)


def test_type2_charstring_fuzz():
    from pdf_spark.core.outlines import cs_num, run_charstring

    code = (cs_num(20) + cs_num(10) + cs_num(20) + b"\x15"  # w dx dy rmoveto
            + cs_num(80) + cs_num(90) + cs_num(-80) + b"\x06"
            + cs_num(5) + cs_num(5) + cs_num(5) + cs_num(5) + cs_num(5)
            + cs_num(5) + b"\x08" + b"\x0e")
    _drive(code, lambda b: run_charstring(b, nominal_width=100), 14)


def test_type1_font_program_fuzz():
    from pdf_spark.core.outlines import t1_num
    from pdf_spark.core.type1 import encode_type1_font, type1_charstrings

    glyph = (t1_num(0) + t1_num(400) + b"\x0d" + t1_num(0) + t1_num(0)
             + b"\x15" + t1_num(70) + b"\x06" + b"\x0e")
    font = encode_type1_font({"g": glyph, "h": glyph},
                             subrs=[t1_num(3) + b"\x06\x0b"])
    _drive(font, type1_charstrings, 15)


def test_type1_charstring_fuzz():
    from pdf_spark.core.outlines import run_type1_charstring, t1_num

    code = (t1_num(10) + t1_num(300) + b"\x0d" + t1_num(0) + t1_num(0)
            + b"\x15" + t1_num(40) + b"\x06" + t1_num(50) + b"\x07"
            + t1_num(1) + t1_num(2) + t1_num(3) + t1_num(4) + t1_num(5)
            + t1_num(6) + b"\x08" + b"\x09\x0e")
    _drive(code, run_type1_charstring, 16)


def test_pdf_function_cos_fuzz():
    from pdf_spark.core.pdffunc import (
        encode_function, eval_function, parse_function_bytes,
    )

    buf = encode_function(
        {"FunctionType": 4, "Domain": [0, 1, 0, 50], "Range": [0, 1, -1, 99]},
        b"{ exch dup mul exch dup 3 mod 0 eq { 1 bitshift } { 1 sub }"
        b" ifelse }",
    )

    def run(blob: bytes):
        fn = parse_function_bytes(blob)
        return tuple(eval_function(fn, [0.5, 7]))

    _drive(buf, run, 17)


def test_sampled_function_fuzz():
    from pdf_spark.core.pdffunc import (
        encode_function, eval_function, parse_function_bytes,
    )

    buf = encode_function(
        {"FunctionType": 0, "Domain": [0, 1], "Range": [0, 255],
         "Size": [5], "BitsPerSample": 12, "Decode": [0, 255]},
        bytes(8),
    )

    def run(blob: bytes):
        fn = parse_function_bytes(blob)
        return tuple(eval_function(fn, [0.3]))

    _drive(buf, run, 18)


def test_revision_audit_fuzz():
    from pdf_spark.core.document import revision_audit
    from pdf_spark.gen.pdfgen import (
        _content_td_tj, _find_startxref, _simple_doc, incremental_update,
    )

    doc = _simple_doc(["fuzz base"], _content_td_tj)
    content = _content_td_tj(["fuzz rev"])
    body = (b"<</Length " + str(len(content)).encode() + b">>\nstream\n"
            + content + b"\nendstream")
    doc = incremental_update(doc, {5: body}, _find_startxref(doc))
    _drive(doc, revision_audit, 19)
