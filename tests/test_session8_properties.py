"""Property tests (hypothesis) for the round-5 computational kernels:
calculator stack algebra, exponential-function formula, charstring
rect geometry (both formats), and rasterizer clipping arithmetic.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_spark.core.outlines import (
    cs_num,
    run_charstring,
    run_type1_charstring,
    t1_num,
)
from pdf_spark.core.pdffunc import (
    encode_function,
    eval_calculator,
    eval_function,
    parse_calculator,
    parse_function_bytes,
)
from pdf_spark.core.raster import ink_stats, rasterize, rect

ints = st.integers(min_value=-1000, max_value=1000)


@settings(max_examples=60, deadline=None)
@given(ints, ints)
def test_calculator_add_sub_mul_match_python(a, b):
    prog = parse_calculator(b"{ 2 copy add 3 1 roll sub }")
    out = eval_calculator(prog, [a, b])
    assert out == [a + b, a - b]


@settings(max_examples=60, deadline=None)
@given(st.lists(ints, min_size=1, max_size=8), st.integers(0, 7))
def test_calculator_index_matches_list(xs, k):
    k = k % len(xs)
    prog = parse_calculator(f"{{ {k} index }}".encode())
    out = eval_calculator(prog, xs)
    assert out == xs + [xs[-1 - k]]


@settings(max_examples=60, deadline=None)
@given(st.lists(ints, min_size=1, max_size=8), ints)
def test_calculator_roll_matches_python_rotation(xs, j):
    n = len(xs)
    prog = parse_calculator(f"{{ {n} {j} roll }}".encode())
    out = eval_calculator(prog, xs)
    jj = j % n
    assert out == xs[-jj:] + xs[:-jj] if jj else out == xs


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 16), st.integers(0, 7), st.integers(1, 8))
def test_type2_exponential_formula(xk, c0k, bk):
    # dyadic inputs keep everything exact in binary floats
    x, c0, b = xk / 16, c0k / 8, bk / 8
    fn = parse_function_bytes(encode_function(
        {"FunctionType": 2, "Domain": [0, 1], "C0": [c0], "C1": [c0 + b],
         "N": 2}
    ))
    assert eval_function(fn, [x]) == [c0 + x * x * b]


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 500), st.integers(1, 500), st.integers(-100, 100),
       st.integers(-100, 100))
def test_charstring_rect_bbox_both_formats(w, h, x0, y0):
    t2 = (cs_num(x0) + cs_num(y0) + b"\x15"
          + cs_num(w) + cs_num(0) + cs_num(0) + cs_num(h)
          + cs_num(-w) + cs_num(0) + b"\x05" + b"\x0e")
    out2 = run_charstring(t2)
    t1 = (t1_num(0) + t1_num(100) + b"\x0d" + t1_num(x0) + t1_num(y0)
          + b"\x15" + t1_num(w) + b"\x06" + t1_num(h) + b"\x07"
          + t1_num(-w) + b"\x06" + b"\x09\x0e")
    out1 = run_type1_charstring(t1)
    for out in (out2, out1):
        assert out["n_contours"] == 1 and out["n_points"] == 4
        assert out["x_min"] == x0 and out["x_max"] == x0 + w
        assert out["y_min"] == y0 and out["y_max"] == y0 + h


@settings(max_examples=40, deadline=None)
@given(st.integers(-10, 30), st.integers(-10, 30),
       st.integers(1, 30), st.integers(1, 30))
def test_raster_rect_clipped_ink(x0, y0, w, h):
    W = H = 24
    bm = rasterize([rect(x0, y0, w, h)], W, H)
    cw = max(0, min(x0 + w, W) - max(x0, 0))
    ch = max(0, min(y0 + h, H) - max(y0, 0))
    assert ink_stats(bm, W, H)["ink"] == cw * ch
