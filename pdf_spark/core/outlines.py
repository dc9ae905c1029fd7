"""Glyph outlines: sfnt ``glyf``/``loca``/``hmtx`` and CFF Type 2 charstrings.

Closes the SURVEY §2.3 #32/#33 "shapes out of scope" partials at the
structural level the reference implements for rendering:

- ``libs/sfnt/src/*`` parses glyf simple/composite glyphs (flag repeats,
  short/long deltas, loca formats) — mirrored here by :func:`glyf_outlines`,
  which additionally RE-DERIVES each glyph's bbox from the decoded points
  and checks it against the header bbox (the reference trusts the header).
- ``libs/cff/src/charstring.c:17-867`` interprets the full Type 2 operator
  set (moveto/lineto/curveto families, stem hints + hintmask width parity,
  biased callsubr/callgsubr, flex, the escape arithmetic set) into a path
  builder — mirrored here by :func:`run_charstring`, which folds the path
  into counts + an exact bbox (curve control points enter the bbox hull,
  documented: exact for line paths, conservative for curves) instead of a
  raster canvas; ``random`` is pinned to 0.5 so corpus runs stay
  deterministic (divergence-by-determinism, the repo-wide policy).

Both sides are certified against this module's own fixture encoders
(``encode_glyf_font``) and hand-assembled charstrings in unit tests, then
against exact DuckDB arithmetic in query ``qm50_glyph_outlines``.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Sequence, Tuple

_MAX_GLYPHS = 65536
_MAX_POINTS = 1 << 20
_MAX_SUBR_DEPTH = 10       # Type 2 spec limit
_MAX_CS_STEPS = 200_000


# ---------------------------------------------------------------------------
# sfnt glyf/loca/hmtx
# ---------------------------------------------------------------------------

def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from(">H", b, off)[0]


def _i16(b: bytes, off: int) -> int:
    return struct.unpack_from(">h", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from(">I", b, off)[0]


def _tables(data: bytes) -> Optional[Dict[bytes, bytes]]:
    if len(data) < 12 or data[:4] not in (b"\x00\x01\x00\x00", b"true"):
        return None
    n = _u16(data, 4)
    out: Dict[bytes, bytes] = {}
    for k in range(min(n, 64)):
        rec = 12 + 16 * k
        if rec + 16 > len(data):
            break
        tag = data[rec:rec + 4]
        off, length = _u32(data, rec + 8), _u32(data, rec + 12)
        if off + length <= len(data):
            out[tag] = data[off:off + length]
    return out


def _parse_simple_glyph(g: bytes, n_contours: int) -> Optional[dict]:
    pos = 10
    if pos + 2 * n_contours + 2 > len(g):
        return None
    ends = [_u16(g, pos + 2 * k) for k in range(n_contours)]
    pos += 2 * n_contours
    n_points = (ends[-1] + 1) if ends else 0
    if n_points > _MAX_POINTS:
        return None
    ins_len = _u16(g, pos)
    pos += 2 + ins_len
    # flags with repeat (bit 3)
    flags: List[int] = []
    while len(flags) < n_points:
        if pos >= len(g):
            return None
        f = g[pos]
        pos += 1
        flags.append(f)
        if f & 0x08:
            if pos >= len(g):
                return None
            rep = g[pos]
            pos += 1
            flags.extend([f] * rep)
    flags = flags[:n_points]
    xs: List[int] = []
    x = 0
    for f in flags:
        if f & 0x02:  # x short
            if pos >= len(g):
                return None
            d = g[pos]
            pos += 1
            x += d if f & 0x10 else -d
        elif not f & 0x10:  # 2-byte delta
            if pos + 2 > len(g):
                return None
            x += _i16(g, pos)
            pos += 2
        xs.append(x)
    ys: List[int] = []
    y = 0
    for f in flags:
        if f & 0x04:
            if pos >= len(g):
                return None
            d = g[pos]
            pos += 1
            y += d if f & 0x20 else -d
        elif not f & 0x20:
            if pos + 2 > len(g):
                return None
            y += _i16(g, pos)
            pos += 2
        ys.append(y)
    on_curve = sum(1 for f in flags if f & 0x01)
    return {
        "n_contours": n_contours,
        "n_points": n_points,
        "n_on_curve": on_curve,
        "x_min": min(xs) if xs else 0,
        "x_max": max(xs) if xs else 0,
        "y_min": min(ys) if ys else 0,
        "y_max": max(ys) if ys else 0,
    }


def _parse_composite(g: bytes) -> Optional[dict]:
    pos = 10
    comps: List[Tuple[int, int, int]] = []  # (gid, dx, dy) translation-only
    while True:
        if pos + 4 > len(g):
            return None
        flags = _u16(g, pos)
        gid = _u16(g, pos + 2)
        pos += 4
        if flags & 0x0001:  # ARG_1_AND_2_ARE_WORDS
            if pos + 4 > len(g):
                return None
            a1, a2 = _i16(g, pos), _i16(g, pos + 2)
            pos += 4
        else:
            if pos + 2 > len(g):
                return None
            a1 = int.from_bytes(g[pos:pos + 1], "big", signed=True)
            a2 = int.from_bytes(g[pos + 1:pos + 2], "big", signed=True)
            pos += 2
        dx, dy = (a1, a2) if flags & 0x0002 else (0, 0)  # ARGS_ARE_XY_VALUES
        if flags & 0x0008:      # WE_HAVE_A_SCALE
            pos += 2
        elif flags & 0x0040:    # X_AND_Y_SCALE
            pos += 4
        elif flags & 0x0080:    # TWO_BY_TWO
            pos += 8
        comps.append((gid, dx, dy))
        if not flags & 0x0020:  # MORE_COMPONENTS
            break
        if len(comps) > 64:
            return None
    return {"components": comps}


def glyf_outlines(data: bytes) -> Optional[dict]:
    """Parse glyph outlines; returns per-font structural totals.

    Output keys: ``n_glyphs``, ``n_simple``, ``n_composite``, ``n_empty``,
    ``n_contours``/``n_points``/``n_on_curve`` (simple-glyph totals),
    ``adv_total`` (hmtx sum with short-table repeat), union ink bbox
    (``x_min/x_max/y_min/y_max``, composites entered translation-only),
    ``bbox_match`` (1 iff every simple glyph's header bbox equals the
    point-derived bbox), ``units_per_em``.
    """
    tabs = _tables(data)
    if tabs is None:
        return None
    head, maxp, loca_b, glyf = (
        tabs.get(b"head"), tabs.get(b"maxp"), tabs.get(b"loca"),
        tabs.get(b"glyf"),
    )
    if head is None or maxp is None or loca_b is None or glyf is None:
        return None
    if len(head) < 54 or len(maxp) < 6:
        return None
    units = _u16(head, 18)
    loca_fmt = _i16(head, 50)
    n_glyphs = min(_u16(maxp, 4), _MAX_GLYPHS)
    if loca_fmt == 0:
        if len(loca_b) < 2 * (n_glyphs + 1):
            return None
        offsets = [2 * _u16(loca_b, 2 * k) for k in range(n_glyphs + 1)]
    else:
        if len(loca_b) < 4 * (n_glyphs + 1):
            return None
        offsets = [_u32(loca_b, 4 * k) for k in range(n_glyphs + 1)]

    simple: Dict[int, dict] = {}
    composites: Dict[int, dict] = {}
    n_empty = bbox_ok = 0
    for gid in range(n_glyphs):
        lo, hi = offsets[gid], offsets[gid + 1]
        if lo == hi:
            n_empty += 1
            continue
        if hi > len(glyf) or hi - lo < 10:
            return None
        g = glyf[lo:hi]
        nc = _i16(g, 0)
        if nc >= 0:
            rec = _parse_simple_glyph(g, nc)
            if rec is None:
                return None
            hdr = (_i16(g, 2), _i16(g, 4), _i16(g, 6), _i16(g, 8))
            if hdr == (rec["x_min"], rec["y_min"], rec["x_max"], rec["y_max"]):
                bbox_ok += 1
            simple[gid] = rec
        else:
            rec = _parse_composite(g)
            if rec is None:
                return None
            composites[gid] = rec

    # hmtx via hhea.numberOfHMetrics; short tables repeat the last advance
    adv_total = 0
    advances: Dict[int, int] = {}
    hhea, hmtx = tabs.get(b"hhea"), tabs.get(b"hmtx")
    if hhea is not None and hmtx is not None and len(hhea) >= 36:
        n_metrics = min(_u16(hhea, 34), n_glyphs)
        last = 0
        for gid in range(n_glyphs):
            if gid < n_metrics:
                if 4 * gid + 2 > len(hmtx):
                    break
                last = _u16(hmtx, 4 * gid)
            advances[gid] = last
            adv_total += last

    # union ink bbox: simple glyphs + translation-only composite placements
    boxes: List[Tuple[int, int, int, int]] = [
        (r["x_min"], r["y_min"], r["x_max"], r["y_max"])
        for r in simple.values() if r["n_points"]
    ]
    for rec in composites.values():
        for gid, dx, dy in rec["components"]:
            sub = simple.get(gid)
            if sub is not None and sub["n_points"]:
                boxes.append(
                    (sub["x_min"] + dx, sub["y_min"] + dy,
                     sub["x_max"] + dx, sub["y_max"] + dy)
                )
    if boxes:
        x_min = min(b[0] for b in boxes)
        y_min = min(b[1] for b in boxes)
        x_max = max(b[2] for b in boxes)
        y_max = max(b[3] for b in boxes)
    else:
        x_min = y_min = x_max = y_max = 0

    return {
        "n_glyphs": n_glyphs,
        "n_simple": len(simple),
        "n_composite": len(composites),
        "n_empty": n_empty,
        "n_contours": sum(r["n_contours"] for r in simple.values()),
        "n_points": sum(r["n_points"] for r in simple.values()),
        "n_on_curve": sum(r["n_on_curve"] for r in simple.values()),
        "n_components": sum(
            len(r["components"]) for r in composites.values()
        ),
        "adv_total": adv_total,
        "x_min": x_min, "y_min": y_min, "x_max": x_max, "y_max": y_max,
        "bbox_match": 1 if bbox_ok == len(simple) else 0,
        "units_per_em": units,
    }


# ---------------------------------------------------------------------------
# Fixture encoder (own writer — the parser above shares no code with it)
# ---------------------------------------------------------------------------

def _encode_simple(contours: Sequence[Sequence[Tuple[int, int]]]) -> bytes:
    pts = [p for c in contours for p in c]
    xs, ys = [p[0] for p in pts], [p[1] for p in pts]
    out = bytearray(struct.pack(
        ">hhhhh", len(contours),
        min(xs), min(ys), max(xs), max(ys),
    ))
    end = -1
    for c in contours:
        end += len(c)
        out += struct.pack(">H", end)
    out += struct.pack(">H", 0)  # no instructions
    out += bytes([0x01] * len(pts))  # on-curve, long deltas
    px = 0
    for x, _ in pts:
        out += struct.pack(">h", x - px)
        px = x
    py = 0
    for _, y in pts:
        out += struct.pack(">h", y - py)
        py = y
    return bytes(out)


def _encode_composite(components: Sequence[Tuple[int, int, int]],
                      bbox: Tuple[int, int, int, int]) -> bytes:
    out = bytearray(struct.pack(">hhhhh", -1, *bbox))
    for k, (gid, dx, dy) in enumerate(components):
        flags = 0x0001 | 0x0002  # words + xy args
        if k + 1 < len(components):
            flags |= 0x0020
        out += struct.pack(">HHhh", flags, gid, dx, dy)
    return bytes(out)


def encode_glyf_font(
    glyphs: Sequence[object],
    advances: Sequence[int],
    units_per_em: int = 1000,
) -> bytes:
    """Assemble a minimal glyf TrueType font.

    Each glyph is either a list of contours (list of (x, y) points), a
    list of composite components ``("composite", [(gid, dx, dy), ...])``,
    or ``None`` for an empty glyph.
    """
    glyf = bytearray()
    loca = [0]
    blobs: List[bytes] = []
    for g in glyphs:
        if g is None:
            blob = b""
        elif isinstance(g, tuple) and g[0] == "composite":
            comps = g[1]
            # composite bbox = union of referenced simple glyph boxes
            boxes = []
            for gid, dx, dy in comps:
                ref = glyphs[gid]
                pts = [p for c in ref for p in c]
                boxes.append((
                    min(p[0] for p in pts) + dx, min(p[1] for p in pts) + dy,
                    max(p[0] for p in pts) + dx, max(p[1] for p in pts) + dy,
                ))
            bbox = (
                min(b[0] for b in boxes), min(b[1] for b in boxes),
                max(b[2] for b in boxes), max(b[3] for b in boxes),
            )
            blob = _encode_composite(comps, bbox)
        else:
            blob = _encode_simple(g)
        blobs.append(blob)
        glyf += blob
        while len(glyf) % 4:
            glyf.append(0)
        loca.append(len(glyf))
    loca_b = b"".join(struct.pack(">I", off) for off in loca)

    head = bytearray(54)
    struct.pack_into(">I", head, 0, 0x00010000)
    struct.pack_into(">I", head, 12, 0x5F0F3CF5)  # magic
    struct.pack_into(">H", head, 18, units_per_em)
    struct.pack_into(">h", head, 50, 1)  # long loca
    maxp = struct.pack(">IH", 0x00010000, len(glyphs))
    hhea = bytearray(36)
    struct.pack_into(">I", hhea, 0, 0x00010000)
    struct.pack_into(">H", hhea, 34, len(advances))
    hmtx = b"".join(struct.pack(">Hh", a, 0) for a in advances)

    tables = [
        (b"head", bytes(head)), (b"hhea", bytes(hhea)), (b"hmtx", hmtx),
        (b"loca", loca_b), (b"maxp", maxp), (b"glyf", bytes(glyf)),
    ]
    n = len(tables)
    out = bytearray(struct.pack(">IHHHH", 0x00010000, n, 0, 0, 0))
    pos = 12 + 16 * n
    body = bytearray()
    for tag, payload in tables:
        out += struct.pack(">4sIII", tag, 0, pos, len(payload))
        body += payload
        while len(body) % 4:
            body.append(0)
        pos = 12 + 16 * n + len(body)
    return bytes(out + body)


# ---------------------------------------------------------------------------
# CFF Type 2 charstrings
# ---------------------------------------------------------------------------

def subr_bias(n: int) -> int:
    """Type 2 subr index bias (charstring.c callsubr handling)."""
    if n < 1240:
        return 107
    if n < 33900:
        return 1131
    return 32768


class _CsState:
    __slots__ = (
        "stack", "x", "y", "n_contours", "n_points", "n_hints",
        "width", "width_parsed", "xs", "ys", "trans", "steps", "open_path",
    )

    def __init__(self) -> None:
        self.stack: List[float] = []
        self.x = 0.0
        self.y = 0.0
        self.n_contours = 0
        self.n_points = 0
        self.n_hints = 0
        self.width: Optional[float] = None
        self.width_parsed = False
        self.xs: List[float] = []
        self.ys: List[float] = []
        self.trans: List[float] = [0.0] * 32  # put/get transient array
        self.steps = 0
        self.open_path = False

    def mark(self) -> None:
        self.xs.append(self.x)
        self.ys.append(self.y)


def run_charstring(
    code: bytes,
    gsubrs: Sequence[bytes] = (),
    lsubrs: Sequence[bytes] = (),
    default_width: float = 0.0,
    nominal_width: float = 0.0,
) -> Optional[dict]:
    """Interpret a Type 2 charstring; return structural path facts.

    Output: ``advance``, ``n_contours``, ``n_points`` (on-curve path
    points: moveto + line/curve endpoints), ``n_hints``, exact hull bbox
    ``x_min/x_max/y_min/y_max`` (curve control points included).
    """
    st = _CsState()
    gbias, lbias = subr_bias(len(gsubrs)), subr_bias(len(lsubrs))

    def width_check(parity: int) -> None:
        # parity = the op's natural operand count modulo; a single extra
        # bottom operand on the FIRST stack-clearing op is the width.
        if not st.width_parsed:
            st.width_parsed = True
            extra = len(st.stack) - parity if parity >= 0 else -1
            if parity >= 0:
                if extra == 1:
                    st.width = st.stack.pop(0)
            else:  # stems/hintmask: operands come in pairs
                if len(st.stack) % 2 == 1:
                    st.width = st.stack.pop(0)

    def stems() -> None:
        width_check(-1)
        st.n_hints += len(st.stack) // 2
        st.stack.clear()

    def moveto(dx: float, dy: float) -> None:
        st.x += dx
        st.y += dy
        st.n_contours += 1
        st.n_points += 1
        st.open_path = True
        st.mark()

    def lineto(dx: float, dy: float) -> None:
        st.x += dx
        st.y += dy
        st.n_points += 1
        st.mark()

    def curveto(pts: Sequence[float]) -> None:
        # 6 deltas: c1, c2, end — controls enter the hull
        st.x += pts[0]
        st.y += pts[1]
        st.mark()
        st.x += pts[2]
        st.y += pts[3]
        st.mark()
        st.x += pts[4]
        st.y += pts[5]
        st.n_points += 1
        st.mark()

    def exec_code(cs: bytes, depth: int) -> bool:
        """Returns True when endchar was executed."""
        if depth > _MAX_SUBR_DEPTH:
            raise ValueError("subr depth")
        pos = 0
        n = len(cs)
        while pos < n:
            st.steps += 1
            if st.steps > _MAX_CS_STEPS:
                raise ValueError("step limit")
            b0 = cs[pos]
            pos += 1
            if b0 >= 32 or b0 == 28:
                if b0 == 28:
                    v = float(struct.unpack_from(">h", cs, pos)[0])
                    pos += 2
                elif b0 <= 246:
                    v = float(b0 - 139)
                elif b0 <= 250:
                    v = float((b0 - 247) * 256 + cs[pos] + 108)
                    pos += 1
                elif b0 <= 254:
                    v = float(-(b0 - 251) * 256 - cs[pos] - 108)
                    pos += 1
                else:  # 255: 16.16 fixed
                    v = struct.unpack_from(">i", cs, pos)[0] / 65536.0
                    pos += 4
                if len(st.stack) >= 48:
                    raise ValueError("operand stack overflow")
                st.stack.append(v)
                continue

            op = b0
            if op == 1 or op == 3 or op == 18 or op == 23:  # h/vstem(hm)
                stems()
            elif op == 19 or op == 20:  # hintmask / cntrmask
                stems()  # implicit vstem from pending operands
                pos += (st.n_hints + 7) // 8
            elif op == 21:  # rmoveto
                width_check(2)
                if len(st.stack) < 2:
                    raise ValueError("rmoveto underflow")
                moveto(st.stack[-2], st.stack[-1])
                st.stack.clear()
            elif op == 22:  # hmoveto
                width_check(1)
                if not st.stack:
                    raise ValueError("hmoveto underflow")
                moveto(st.stack[-1], 0.0)
                st.stack.clear()
            elif op == 4:  # vmoveto
                width_check(1)
                if not st.stack:
                    raise ValueError("vmoveto underflow")
                moveto(0.0, st.stack[-1])
                st.stack.clear()
            elif op == 5:  # rlineto
                a = st.stack
                for k in range(0, len(a) - 1, 2):
                    lineto(a[k], a[k + 1])
                st.stack.clear()
            elif op == 6 or op == 7:  # hlineto / vlineto (alternating)
                horizontal = op == 6
                for v in st.stack:
                    if horizontal:
                        lineto(v, 0.0)
                    else:
                        lineto(0.0, v)
                    horizontal = not horizontal
                st.stack.clear()
            elif op == 8:  # rrcurveto
                a = st.stack
                for k in range(0, len(a) - 5, 6):
                    curveto(a[k:k + 6])
                st.stack.clear()
            elif op == 24:  # rcurveline
                a = st.stack
                k = 0
                while len(a) - k >= 8:
                    curveto(a[k:k + 6])
                    k += 6
                if len(a) - k >= 2:
                    lineto(a[k], a[k + 1])
                st.stack.clear()
            elif op == 25:  # rlinecurve
                a = st.stack
                k = 0
                while len(a) - k >= 8:
                    lineto(a[k], a[k + 1])
                    k += 2
                if len(a) - k >= 6:
                    curveto(a[k:k + 6])
                st.stack.clear()
            elif op == 26 or op == 27:  # vvcurveto / hhcurveto
                a = list(st.stack)
                d1 = 0.0
                if len(a) % 4 == 1:
                    d1 = a.pop(0)
                for k in range(0, len(a) - 3, 4):
                    if op == 26:  # vv: dx1? {dya dxb dyb dyc}+
                        curveto([d1, a[k], a[k + 1], a[k + 2], 0.0, a[k + 3]])
                    else:         # hh: dy1? {dxa dxb dyb dxc}+
                        curveto([a[k], d1, a[k + 1], a[k + 2], a[k + 3], 0.0])
                    d1 = 0.0
                st.stack.clear()
            elif op == 30 or op == 31:  # vhcurveto / hvcurveto
                a = list(st.stack)
                horizontal = op == 31
                k = 0
                while len(a) - k >= 4:
                    last = len(a) - k == 5
                    d5 = a[k + 4] if last else 0.0
                    if horizontal:
                        curveto([a[k], 0.0, a[k + 1], a[k + 2], d5, a[k + 3]])
                    else:
                        curveto([0.0, a[k], a[k + 1], a[k + 2], a[k + 3], d5])
                    horizontal = not horizontal
                    k += 4
                st.stack.clear()
            elif op == 10:  # callsubr
                if not st.stack:
                    raise ValueError("callsubr underflow")
                idx = int(st.stack.pop()) + lbias
                if not 0 <= idx < len(lsubrs):
                    raise ValueError("callsubr index")
                if exec_code(lsubrs[idx], depth + 1):
                    return True
            elif op == 29:  # callgsubr
                if not st.stack:
                    raise ValueError("callgsubr underflow")
                idx = int(st.stack.pop()) + gbias
                if not 0 <= idx < len(gsubrs):
                    raise ValueError("callgsubr index")
                if exec_code(gsubrs[idx], depth + 1):
                    return True
            elif op == 11:  # return
                return False
            elif op == 14:  # endchar
                width_check(0)
                st.stack.clear()
                return True
            elif op == 12:  # escape
                if pos >= n:
                    raise ValueError("bare escape")
                op2 = cs[pos]
                pos += 1
                s = st.stack
                if op2 == 35:  # flex: 13 args, last is fd (dropped)
                    if len(s) < 13:
                        raise ValueError("flex underflow")
                    curveto(s[-13:-7])
                    curveto(s[-7:-1])
                    s.clear()
                elif op2 == 34:  # hflex: dx1 dx2 dy2 dx3 dx4 dx5 dx6
                    if len(s) < 7:
                        raise ValueError("hflex underflow")
                    y0 = st.y
                    curveto([s[-7], 0.0, s[-6], s[-5], s[-4], 0.0])
                    curveto([s[-3], 0.0, s[-2], y0 - st.y, s[-1], 0.0])
                    s.clear()
                elif op2 == 36:  # hflex1: dx1 dy1 dx2 dy2 dx3 dx4 dx5 dy5 dx6
                    if len(s) < 9:
                        raise ValueError("hflex1 underflow")
                    a = s[-9:]
                    dy6 = -(a[1] + a[3] + a[7])  # return to starting y
                    curveto([a[0], a[1], a[2], a[3], a[4], 0.0])
                    curveto([a[5], 0.0, a[6], a[7], a[8], dy6])
                    s.clear()
                elif op2 == 37:  # flex1: 11 args, 6th endpoint derived
                    if len(s) < 11:
                        raise ValueError("flex1 underflow")
                    a = s[-11:]
                    dx = a[0] + a[2] + a[4] + a[6] + a[8]
                    dy = a[1] + a[3] + a[5] + a[7] + a[9]
                    if abs(dx) > abs(dy):
                        dx6, dy6 = a[10], -dy
                    else:
                        dx6, dy6 = -dx, a[10]
                    curveto(a[0:6])
                    curveto([a[6], a[7], a[8], a[9], dx6, dy6])
                    s.clear()
                # -- escape arithmetic (charstring.c AND..ROLL) --------------
                elif op2 == 3:   # and
                    b = s.pop(); a = s.pop(); s.append(1.0 if a and b else 0.0)
                elif op2 == 4:   # or
                    b = s.pop(); a = s.pop(); s.append(1.0 if a or b else 0.0)
                elif op2 == 5:   # not
                    s.append(1.0 if not s.pop() else 0.0)
                elif op2 == 9:   # abs
                    s.append(abs(s.pop()))
                elif op2 == 10:  # add
                    b = s.pop(); a = s.pop(); s.append(a + b)
                elif op2 == 11:  # sub
                    b = s.pop(); a = s.pop(); s.append(a - b)
                elif op2 == 12:  # div
                    b = s.pop(); a = s.pop()
                    if b == 0:
                        raise ValueError("div by zero")
                    s.append(a / b)
                elif op2 == 14:  # neg
                    s.append(-s.pop())
                elif op2 == 15:  # eq
                    b = s.pop(); a = s.pop(); s.append(1.0 if a == b else 0.0)
                elif op2 == 18:  # drop
                    s.pop()
                elif op2 == 20:  # put
                    j = int(s.pop()); v = s.pop()
                    if not 0 <= j < 32:
                        raise ValueError("put index")
                    st.trans[j] = v
                elif op2 == 21:  # get
                    j = int(s.pop())
                    if not 0 <= j < 32:
                        raise ValueError("get index")
                    s.append(st.trans[j])
                elif op2 == 22:  # ifelse
                    v2 = s.pop(); v1 = s.pop(); s2 = s.pop(); s1 = s.pop()
                    s.append(s1 if v1 <= v2 else s2)
                elif op2 == 23:  # random — pinned for determinism
                    s.append(0.5)
                elif op2 == 24:  # mul
                    b = s.pop(); a = s.pop(); s.append(a * b)
                elif op2 == 26:  # sqrt
                    v = s.pop()
                    if v < 0:
                        raise ValueError("sqrt of negative")
                    s.append(v ** 0.5)
                elif op2 == 27:  # dup
                    s.append(s[-1])
                elif op2 == 28:  # exch
                    s[-1], s[-2] = s[-2], s[-1]
                elif op2 == 29:  # index
                    j = int(s.pop())
                    s.append(s[-1 - j] if 0 <= j < len(s) else s[-1])
                elif op2 == 30:  # roll
                    j = int(s.pop()); k = int(s.pop())
                    if 0 < k <= len(s):
                        j %= k
                        if j:
                            s[-k:] = s[-j:] + s[-k:-j]
                else:
                    raise ValueError(f"reserved escape {op2}")
            else:
                raise ValueError(f"reserved operator {op}")
        return False

    try:
        exec_code(code, 0)
    except (ValueError, IndexError, struct.error):
        return None

    advance = (
        nominal_width + st.width if st.width is not None else default_width
    )
    return {
        "advance": advance,
        "n_contours": st.n_contours,
        "n_points": st.n_points,
        "n_hints": st.n_hints,
        "x_min": min(st.xs) if st.xs else 0.0,
        "x_max": max(st.xs) if st.xs else 0.0,
        "y_min": min(st.ys) if st.ys else 0.0,
        "y_max": max(st.ys) if st.ys else 0.0,
    }


def cs_num(v: int) -> bytes:
    """Encode an integer as a Type 2 charstring operand (fixture helper)."""
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([(v >> 8) + 247, v & 0xFF])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([(v >> 8) + 251, v & 0xFF])
    return b"\x1c" + struct.pack(">h", v)


# ---------------------------------------------------------------------------
# Type 1 charstrings (E288 — the reference's FontFile todo, font side)
# ---------------------------------------------------------------------------

def run_type1_charstring(
    code: bytes,
    subrs: Sequence[bytes] = (),
    charstrings=None,
    _depth: int = 0,
) -> Optional[dict]:
    """Interpret a DECRYPTED Type 1 charstring (Adobe Type 1 spec §6-7).

    Same output contract as :func:`run_charstring`: ``advance`` (from
    ``hsbw``/``sbw``), ``n_contours``/``n_points``, exact hull bbox.
    Differences from Type 2, all per spec: unbiased subr indices,
    single-argument hlineto/vlineto (no alternation), 255-prefixed
    operands are 32-bit INTEGERS (not 16.16), ``closepath`` exists,
    ``seac`` composes accented glyphs from StandardEncoding codes
    (resolved through ``charstrings`` when provided), and flex arrives
    via ``callothersubr`` 0-2 (the seven flex rmovetos become two
    curves; hint-replacement othersubr 3 is a no-op).
    """
    if _depth > _MAX_SUBR_DEPTH:
        return None
    st = {
        "x": 0.0, "y": 0.0, "sbx": 0.0, "width": 0.0,
        "contours": 0, "points": 0, "xs": [], "ys": [],
        "flex_pts": None, "ps_stack": [],
    }
    stack: List[float] = []

    def mark() -> None:
        st["xs"].append(st["x"])
        st["ys"].append(st["y"])

    def moveto(dx: float, dy: float) -> None:
        st["x"] += dx
        st["y"] += dy
        if st["flex_pts"] is not None:
            st["flex_pts"].append((st["x"], st["y"]))
            return
        st["contours"] += 1
        st["points"] += 1
        mark()

    def lineto(dx: float, dy: float) -> None:
        st["x"] += dx
        st["y"] += dy
        st["points"] += 1
        mark()

    def curveto(d) -> None:
        st["x"] += d[0]; st["y"] += d[1]; mark()
        st["x"] += d[2]; st["y"] += d[3]; mark()
        st["x"] += d[4]; st["y"] += d[5]
        st["points"] += 1
        mark()

    def merge(sub: dict, dx: float, dy: float) -> None:
        st["contours"] += sub["n_contours"]
        st["points"] += sub["n_points"]
        st["xs"].extend([sub["x_min"] + dx, sub["x_max"] + dx])
        st["ys"].extend([sub["y_min"] + dy, sub["y_max"] + dy])

    def exec_code(cs: bytes, depth: int) -> bool:
        if depth > _MAX_SUBR_DEPTH:
            raise ValueError("subr depth")
        pos = 0
        n = len(cs)
        while pos < n:
            b0 = cs[pos]
            pos += 1
            if b0 >= 32 or b0 == 255:
                if b0 == 255:
                    v = float(struct.unpack_from(">i", cs, pos)[0])
                    pos += 4
                elif b0 <= 246:
                    v = float(b0 - 139)
                elif b0 <= 250:
                    v = float((b0 - 247) * 256 + cs[pos] + 108)
                    pos += 1
                else:
                    v = float(-(b0 - 251) * 256 - cs[pos] - 108)
                    pos += 1
                stack.append(v)
                continue
            op = b0
            if op == 13:  # hsbw: sbx wx
                if len(stack) < 2:
                    raise ValueError("hsbw underflow")
                st["sbx"], st["width"] = stack[0], stack[1]
                st["x"] = stack[0]
                stack.clear()
            elif op == 9:  # closepath
                stack.clear()
            elif op in (1, 3):  # hstem / vstem
                stack.clear()
            elif op == 21:
                if len(stack) < 2:
                    raise ValueError("rmoveto underflow")
                moveto(stack[-2], stack[-1])
                stack.clear()
            elif op == 22:
                moveto(stack[-1], 0.0)
                stack.clear()
            elif op == 4:
                moveto(0.0, stack[-1])
                stack.clear()
            elif op == 5:
                lineto(stack[-2], stack[-1])
                stack.clear()
            elif op == 6:  # hlineto: single arg
                lineto(stack[-1], 0.0)
                stack.clear()
            elif op == 7:
                lineto(0.0, stack[-1])
                stack.clear()
            elif op == 8:
                if len(stack) < 6:
                    raise ValueError("rrcurveto underflow")
                curveto(stack[-6:])
                stack.clear()
            elif op == 30:  # vhcurveto: dy1 dx2 dy2 dx3
                curveto([0.0, stack[-4], stack[-3], stack[-2],
                         stack[-1], 0.0])
                stack.clear()
            elif op == 31:  # hvcurveto: dx1 dx2 dy2 dy3
                curveto([stack[-4], 0.0, stack[-3], stack[-2],
                         0.0, stack[-1]])
                stack.clear()
            elif op == 10:  # callsubr (unbiased)
                idx = int(stack.pop())
                if not 0 <= idx < len(subrs):
                    raise ValueError("subr index")
                if exec_code(subrs[idx], depth + 1):
                    return True
            elif op == 11:
                return False
            elif op == 14:
                return True
            elif op == 12:
                op2 = cs[pos]
                pos += 1
                if op2 == 12:  # div
                    b = stack.pop(); a = stack.pop()
                    if b == 0:
                        raise ValueError("div by zero")
                    stack.append(a / b)
                elif op2 == 16:  # callothersubr
                    othersubr = int(stack.pop())
                    n_args = int(stack.pop())
                    args = stack[-n_args:] if n_args else []
                    del stack[len(stack) - n_args:]
                    if othersubr == 1:      # flex start
                        st["flex_pts"] = []
                    elif othersubr == 0:    # flex end
                        pts = st["flex_pts"] or []
                        st["flex_pts"] = None
                        if len(pts) >= 7:
                            # pts[0] is the reference point; 1-6 the curves
                            prev = (st["xs"][-1] if st["xs"] else 0.0,
                                    st["ys"][-1] if st["ys"] else 0.0)
                            for k in (1, 2, 3):
                                st["xs"].append(pts[k][0])
                                st["ys"].append(pts[k][1])
                            for k in (4, 5, 6):
                                st["xs"].append(pts[k][0])
                                st["ys"].append(pts[k][1])
                            st["points"] += 2
                            st["x"], st["y"] = pts[6]
                        # othersubr 0 leaves end y, x for the two pops
                        st["ps_stack"] = [st["y"], st["x"]]
                    elif othersubr == 3:    # hint replacement
                        st["ps_stack"] = [3.0]
                    else:
                        st["ps_stack"] = list(reversed(args))
                elif op2 == 17:  # pop
                    stack.append(
                        st["ps_stack"].pop() if st["ps_stack"] else 0.0
                    )
                elif op2 == 6:  # seac: asb adx ady bchar achar
                    if charstrings is None or len(stack) < 5:
                        raise ValueError("seac unsupported")
                    from pdf_spark.core.encodings import STANDARD_ENCODING
                    asb, adx, ady, bchar, achar = stack[-5:]
                    stack.clear()
                    bname = STANDARD_ENCODING.get(int(bchar))
                    aname = STANDARD_ENCODING.get(int(achar))
                    for nm, dx, dy in (
                        (bname, 0.0, 0.0),
                        (aname, st["sbx"] - asb + adx, ady),
                    ):
                        cs2 = charstrings.get(nm) if nm else None
                        if cs2 is None:
                            raise ValueError("seac component missing")
                        sub = run_type1_charstring(
                            cs2, subrs, None, _depth + 1
                        )
                        if sub is None:
                            raise ValueError("seac component failed")
                        merge(sub, dx, dy)
                    return True
                elif op2 == 7:  # sbw: sbx sby wx wy
                    if len(stack) < 4:
                        raise ValueError("sbw underflow")
                    st["sbx"], st["width"] = stack[0], stack[2]
                    st["x"], st["y"] = stack[0], stack[1]
                    stack.clear()
                elif op2 == 33:  # setcurrentpoint
                    if len(stack) >= 2:
                        st["x"], st["y"] = stack[-2], stack[-1]
                    stack.clear()
                elif op2 in (0, 1, 2):  # dotsection / vstem3 / hstem3
                    stack.clear()
                else:
                    raise ValueError(f"reserved t1 escape {op2}")
            else:
                raise ValueError(f"reserved t1 operator {op}")
        return False

    try:
        exec_code(code, 0)
    except (ValueError, IndexError, struct.error):
        return None
    return {
        "advance": st["width"],
        "n_contours": st["contours"],
        "n_points": st["points"],
        "x_min": min(st["xs"]) if st["xs"] else 0.0,
        "x_max": max(st["xs"]) if st["xs"] else 0.0,
        "y_min": min(st["ys"]) if st["ys"] else 0.0,
        "y_max": max(st["ys"]) if st["ys"] else 0.0,
    }


def t1_num(v: int) -> bytes:
    """Encode an integer as a Type 1 charstring operand."""
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([(v >> 8) + 247, v & 0xFF])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([(v >> 8) + 251, v & 0xFF])
    return b"\xff" + struct.pack(">i", v)
