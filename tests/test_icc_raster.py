"""ICC profile structure (core/icc.py) + scanline rasterizer (core/raster.py).

Reference parity: the ICC tier replaces ``libs/color/src`` transform
machinery with structural audit (SURVEY #36); the raster tier replaces the
``libs/canvas`` DCEL tessellation with scanline fill over pixel centers
(SURVEY #37). Both certified against own writers / brute force.
"""

import struct

import pytest

from pdf_spark.core.icc import encode_icc, icc_meta
from pdf_spark.core.raster import ink_stats, rasterize, rect


class TestIcc:
    def test_display_rgb_roundtrip(self):
        prof = encode_icc(intent=1)
        m = icc_meta(prof)
        assert m["valid"] == 1 and m["error"] is None
        assert m["dev_class"] == "display"
        assert m["color_space"] == "RGB"
        assert m["pcs"] == "XYZ"
        assert m["version_major"] == 4 and m["version_minor"] == 3
        assert m["intent"] == 1
        assert m["n_tags"] == 3
        assert m["has_desc"] == 1 and m["has_wtpt"] == 1 and m["has_trc"] == 1
        assert m["has_a2b0"] == 0
        assert m["d50_ok"] == 1
        assert m["illum_x"] == 0x0000F6D6

    def test_printer_cmyk_with_a2b0(self):
        prof = encode_icc(
            dev_class=b"prtr", color_space=b"CMYK", pcs=b"Lab ",
            version=(2, 4), intent=3,
            tags=[(b"desc", bytes(10)), (b"A2B0", b"mft1" + bytes(40)),
                  (b"wtpt", bytes(20))],
        )
        m = icc_meta(prof)
        assert m["valid"] == 1
        assert m["dev_class"] == "output" and m["color_space"] == "CMYK"
        assert m["has_a2b0"] == 1 and m["has_trc"] == 0
        assert m["version_major"] == 2

    def test_truncated_detected(self):
        full = encode_icc()
        m = icc_meta(encode_icc(truncate_to=len(full) - 8))
        assert m["valid"] == 0 and m["error"] == "truncated"

    def test_bad_magic_short_class_intent(self):
        assert icc_meta(b"\x00" * 200)["error"] == "bad_magic"
        assert icc_meta(b"\x00" * 50)["error"] == "short"
        bad = bytearray(encode_icc())
        bad[12:16] = b"XXXX"
        assert icc_meta(bytes(bad))["error"] == "bad_class"
        bad = bytearray(encode_icc())
        struct.pack_into(">I", bad, 64, 9)
        assert icc_meta(bytes(bad))["error"] == "bad_intent"

    def test_tag_bounds_audit(self):
        prof = bytearray(encode_icc())
        # point the first tag past the claimed size
        struct.pack_into(">I", prof, 132 + 4, 1 << 24)
        assert icc_meta(bytes(prof))["error"] == "tag_bounds"

    def test_non_d50_flagged(self):
        prof = bytearray(encode_icc())
        struct.pack_into(">I", prof, 68, 0x00010000)
        m = icc_meta(bytes(prof))
        assert m["valid"] == 1 and m["d50_ok"] == 0


class TestRaster:
    def test_integer_rect_exact(self):
        bm = rasterize([rect(2, 3, 10, 5)], 32, 16)
        s = ink_stats(bm, 32, 16)
        assert s["ink"] == 50
        assert s["first_row"] == 3 and s["last_row"] == 7
        assert s["rows_touched"] == 5

    def test_rule_evenodd_xor(self):
        a, b = rect(0, 0, 10, 10), rect(5, 5, 10, 10)
        s = ink_stats(rasterize([a, b], 32, 32, rule="evenodd"), 32, 32)
        assert s["ink"] == 100 + 100 - 2 * 25

    def test_rule_nonzero_union(self):
        a, b = rect(0, 0, 10, 10), rect(5, 5, 10, 10)
        s = ink_stats(rasterize([a, b], 32, 32, rule="nonzero"), 32, 32)
        assert s["ink"] == 100 + 100 - 25

    def test_nonzero_hole_via_reversed_inner(self):
        outer, hole = rect(0, 0, 30, 30), rect(10, 10, 8, 8, reverse=True)
        s = ink_stats(rasterize([outer, hole], 40, 40), 40, 40)
        assert s["ink"] == 900 - 64
        # even-odd ignores direction — same hole
        s2 = ink_stats(
            rasterize([outer, rect(10, 10, 8, 8)], 40, 40, rule="evenodd"),
            40, 40)
        assert s2["ink"] == 900 - 64

    def test_clipping_to_canvas(self):
        s = ink_stats(rasterize([rect(-5, -5, 20, 20)], 8, 8), 8, 8)
        assert s["ink"] == 64  # fully covers the 8x8 canvas

    def test_triangle_vs_brute_force(self):
        tri = [(1.0, 1.0), (27.0, 3.0), (9.0, 25.0)]
        bm = rasterize([tri], 32, 32)

        def inside(px, py):
            x, y = px + 0.5, py + 0.5
            n = len(tri)
            winding = 0
            for k in range(n):
                x0, y0 = tri[k]
                x1, y1 = tri[(k + 1) % n]
                if y0 <= y < y1:
                    if (x1 - x0) * (y - y0) - (x - x0) * (y1 - y0) > 0:
                        winding += 1
                elif y1 <= y < y0:
                    if (x1 - x0) * (y - y0) - (x - x0) * (y1 - y0) < 0:
                        winding -= 1
            return winding != 0

        expect = sum(
            1 for py in range(32) for px in range(32) if inside(px, py)
        )
        assert ink_stats(bm, 32, 32)["ink"] == expect
        for py in range(32):
            for px in range(32):
                assert bm[py * 32 + px] == (1 if inside(px, py) else 0)

    def test_degenerate_and_bounds(self):
        assert ink_stats(rasterize([], 8, 8), 8, 8)["ink"] == 0
        assert ink_stats(rasterize([[(1, 1)]], 8, 8), 8, 8)["ink"] == 0
        with pytest.raises(ValueError):
            rasterize([], 0, 8)
        with pytest.raises(ValueError):
            rasterize([], 8, 8, rule="winding")
