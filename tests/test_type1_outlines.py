"""Type 1 font outline layer: eexec/charstring decryption, CharStrings
extraction, and the Type 1 charstring interpreter.

Reference parity: FontFile (Type1) is an explicit todo in the reference
(font_descriptor.c); this closes the format's outline half to match the
Type 2 story (E278). Certified against encode_type1_font (own writer).
"""

import pytest

from pdf_spark.core.outlines import run_type1_charstring, t1_num
from pdf_spark.core.type1 import (
    encode_type1_font,
    t1_decrypt,
    t1_encrypt,
    type1_charstrings,
)

OP = {
    "hsbw": b"\x0d", "closepath": b"\x09", "rmoveto": b"\x15",
    "hmoveto": b"\x16", "vmoveto": b"\x04", "rlineto": b"\x05",
    "hlineto": b"\x06", "vlineto": b"\x07", "rrcurveto": b"\x08",
    "vhcurveto": b"\x1e", "hvcurveto": b"\x1f", "callsubr": b"\x0a",
    "return": b"\x0b", "endchar": b"\x0e", "div": b"\x0c\x0c",
    "seac": b"\x0c\x06", "sbw": b"\x0c\x07",
    "callothersubr": b"\x0c\x10", "pop": b"\x0c\x11",
    "setcurrentpoint": b"\x0c\x21", "hstem": b"\x01",
}


def cs(*parts) -> bytes:
    out = b""
    for p in parts:
        out += t1_num(p) if isinstance(p, int) else p
    return out


RECT = cs(25, 500, OP["hsbw"], 0, 0, OP["rmoveto"],
          100, OP["hlineto"], 200, OP["vlineto"], -100, OP["hlineto"],
          OP["closepath"], OP["endchar"])


class TestDecrypt:
    def test_roundtrip(self):
        for r, pad in ((55665, 4), (4330, 4), (4330, 0)):
            data = bytes(range(200))
            assert t1_decrypt(t1_encrypt(data, r, pad), r, pad) == data


class TestInterpreter:
    def test_hsbw_rect(self):
        out = run_type1_charstring(RECT)
        assert out["advance"] == 500
        assert out["n_contours"] == 1 and out["n_points"] == 4
        # hsbw sets the current point x to the left side bearing
        assert (out["x_min"], out["x_max"]) == (25, 125)
        assert (out["y_min"], out["y_max"]) == (0, 200)

    def test_single_arg_h_v_lineto(self):
        # Type 1 hlineto takes exactly one arg — no Type 2 alternation
        code = cs(0, 100, OP["hsbw"], 0, 0, OP["rmoveto"],
                  50, OP["hlineto"], 60, OP["vlineto"], OP["endchar"])
        out = run_type1_charstring(code)
        assert out["x_max"] == 50 and out["y_max"] == 60

    def test_curves_and_hull(self):
        code = cs(0, 100, OP["hsbw"], 0, 0, OP["rmoveto"],
                  10, 40, 20, -40, 30, 0, OP["rrcurveto"],
                  10, 20, 30, 40, OP["hvcurveto"], OP["endchar"])
        out = run_type1_charstring(code)
        # hv: c1=(70,0) c2=(90,30) end=(90,70)
        assert out["y_max"] == 70 and out["x_max"] == 90
        assert out["n_points"] == 3

    def test_div_and_32bit_numbers(self):
        code = cs(0, 7, 2, OP["div"]) + b"\xff\x00\x00\x01\x00" + \
            cs(OP["hsbw"])  # hsbw(7/2=3.5... wait stack is [0,3.5,256])
        # simpler: hsbw(3000, 70000//7 via div)
        code = cs(3000, 70000, 7, OP["div"], OP["hsbw"], OP["endchar"])
        out = run_type1_charstring(code)
        assert out["advance"] == 10000.0

    def test_callsubr_unbiased(self):
        sub = cs(100, OP["hlineto"], OP["return"])
        code = cs(0, 300, OP["hsbw"], 0, 0, OP["rmoveto"],
                  0, OP["callsubr"], OP["endchar"])
        out = run_type1_charstring(code, subrs=[sub])
        assert out["x_max"] == 100

    def test_sbw_vertical_metrics(self):
        code = cs(10, 20, 700, 0, OP["sbw"], 0, 0, OP["rmoveto"],
                  5, OP["hlineto"], OP["endchar"])
        out = run_type1_charstring(code)
        assert out["advance"] == 700
        assert out["x_min"] == 10 and out["y_min"] == 20

    def test_seac_composition(self):
        # base 'A' (65) + accent 'quoteright' (39 in StandardEncoding)
        base = cs(0, 600, OP["hsbw"], 0, 0, OP["rmoveto"],
                  100, OP["hlineto"], OP["endchar"])
        accent = cs(0, 300, OP["hsbw"], 0, 0, OP["rmoveto"],
                    10, OP["vlineto"], OP["endchar"])
        table = {"A": base, "quoteright": accent}
        code = cs(0, 600, OP["hsbw"], 0, 250, 700, 65, 39, OP["seac"])
        out = run_type1_charstring(code, charstrings=table)
        assert out["n_contours"] == 2
        assert out["x_max"] == 250  # accent shifted by adx
        assert out["y_max"] == 700 + 10

    def test_flex_via_othersubrs(self):
        parts = [cs(0, 400, OP["hsbw"], 0, 0, OP["rmoveto"]),
                 cs(0, 1, OP["callothersubr"])]          # flex start
        deltas = [(5, 0), (10, 20), (10, 20), (10, -20),
                  (10, -20), (10, 20), (10, 20)]
        for dx, dy in deltas:
            parts.append(cs(dx, dy, OP["rmoveto"], 0, 2,
                            OP["callothersubr"]))
        parts.append(cs(50, 65, 40, 3, 0, OP["callothersubr"]))
        parts.append(cs(OP["pop"], OP["pop"], OP["setcurrentpoint"],
                        OP["endchar"]))
        out = run_type1_charstring(b"".join(parts))
        assert out is not None
        # endpoint: x = 5+10*6 = 65 from the accumulated rmovetos
        assert out["x_max"] == 65
        assert out["n_contours"] == 1  # flex rmovetos opened no contour

    def test_malformed(self):
        assert run_type1_charstring(cs(5, OP["callsubr"])) is None
        assert run_type1_charstring(b"\x0c\x63") is None
        assert run_type1_charstring(
            cs(1, 2, 3, 4, 5, OP["seac"])) is None  # no table


class TestFontProgram:
    def test_full_font_roundtrip(self):
        sub = cs(80, OP["hlineto"], OP["return"])
        glyph = cs(0, 450, OP["hsbw"], 0, 0, OP["rmoveto"],
                   0, OP["callsubr"], 90, OP["vlineto"], OP["endchar"])
        font = encode_type1_font(
            {"space": cs(0, 250, OP["hsbw"], OP["endchar"]),
             "boxy": glyph},
            subrs=[sub],
            encoding={32: "space", 66: "boxy"},
        )
        parsed = type1_charstrings(font)
        assert parsed is not None
        chars, subrs = parsed
        assert set(chars) == {"space", "boxy"}
        assert len(subrs) == 1
        out = run_type1_charstring(chars["boxy"], subrs=subrs)
        assert out["advance"] == 450
        assert out["x_max"] == 80 and out["y_max"] == 90

    def test_leniv_override(self):
        font = encode_type1_font(
            {"g": cs(0, 100, OP["hsbw"], OP["endchar"])}, len_iv=0
        )
        chars, _ = type1_charstrings(font)
        assert run_type1_charstring(chars["g"])["advance"] == 100

    def test_no_eexec_returns_none(self):
        assert type1_charstrings(b"%!PS-AdobeFont nothing here") is None
