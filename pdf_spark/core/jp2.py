"""JPEG 2000 structural parse (ISO/IEC 15444-1, public spec).

The ``/JPXDecode`` route: PDFs embed JP2 container files or raw J2K
codestreams for scanned/photographic images (PDF 32000-1 §7.4.9). The
corpus tier needs the structure — dims, components, tile grid,
progression order, decomposition levels, quality layers, truncation —
without wavelet decoding, exactly like qm20/qm35's MP4/HEIF walkers.

Container walk (Annex I): signature box ``jP\\x20\\x20`` + CR-LF magic,
``ftyp`` brand, ``jp2h``/``ihdr`` (height/width/nc/bpc), then the
``jp2c`` contiguous-codestream box. Codestream walk (Annex A): SOC,
SIZ (grid + tile sizes + components), COD (progression order, layers,
levels), QCD presence, SOT-segment skipping via Psot, EOC termination.

Certified against :func:`encode_jp2`/:func:`encode_j2k` (own writers)
in unit tests and query ``qm52_jp2_meta``. The reference has no JPEG
2000 surface (``filters.c`` implements ASCIIHex+Flate only) — this
extends the E276 CCITT pattern of closing real-corpus decode routes
the reference panics on.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

_SOC = 0xFF4F
_SIZ = 0xFF51
_COD = 0xFF52
_QCD = 0xFF5C
_SOT = 0xFF90
_SOD = 0xFF93
_EOC = 0xFFD9

_PROG_ORDERS = ("LRCP", "RLCP", "RPCL", "PCRL", "CPRL")
_JP2_MAGIC = b"\x00\x00\x00\x0cjP\x20\x20\x0d\x0a\x87\x0a"
_MAX_SEGMENTS = 4096


def _parse_codestream(data: bytes) -> dict:
    out = {
        "valid": 0, "error": None, "w": None, "h": None, "n_comp": None,
        "n_tiles": None, "prog": None, "n_levels": None, "n_layers": None,
        "has_qcd": 0, "n_sot": 0, "truncated": None,
    }
    if len(data) < 2 or struct.unpack_from(">H", data, 0)[0] != _SOC:
        out["error"] = "no_soc"
        return out
    pos = 2
    seen_siz = seen_cod = False
    segments = 0
    while pos + 2 <= len(data):
        segments += 1
        if segments > _MAX_SEGMENTS:
            out["error"] = "segment_bomb"
            return out
        marker = struct.unpack_from(">H", data, pos)[0]
        pos += 2
        if marker == _EOC:
            if not seen_siz:
                out["error"] = "no_siz"
                return out
            out["valid"] = 1
            out["truncated"] = 0
            return out
        if marker == _SOD:
            # bitstream until next SOT or EOC; scan for the marker
            nxt = pos
            while nxt + 2 <= len(data):
                if data[nxt] == 0xFF and data[nxt + 1] in (0x90, 0xD9):
                    break
                nxt += 1
            pos = nxt
            continue
        if pos + 2 > len(data):
            break
        seg_len = struct.unpack_from(">H", data, pos)[0]
        if seg_len < 2 or pos + seg_len > len(data):
            break
        body = data[pos + 2:pos + seg_len]
        if marker == _SIZ:
            if len(body) < 36:
                out["error"] = "bad_siz"
                return out
            (_rsiz, xsiz, ysiz, xo, yo, xt, yt, xto, yto, csiz) = \
                struct.unpack_from(">HIIIIIIIIH", body, 0)
            if xsiz <= xo or ysiz <= yo or xt == 0 or yt == 0:
                out["error"] = "bad_siz"
                return out
            out["w"] = xsiz - xo
            out["h"] = ysiz - yo
            out["n_comp"] = csiz
            tiles_x = -(-(xsiz - xto) // xt)
            tiles_y = -(-(ysiz - yto) // yt)
            out["n_tiles"] = tiles_x * tiles_y
            seen_siz = True
        elif marker == _COD:
            if len(body) < 6:
                out["error"] = "bad_cod"
                return out
            prog = body[1]
            layers = struct.unpack_from(">H", body, 2)[0]
            levels = body[5]
            out["prog"] = (
                _PROG_ORDERS[prog] if prog < len(_PROG_ORDERS) else None
            )
            out["n_layers"] = layers
            out["n_levels"] = levels
            seen_cod = True
        elif marker == _QCD:
            out["has_qcd"] = 1
        elif marker == _SOT:
            out["n_sot"] += 1
            if len(body) >= 8:
                psot = struct.unpack_from(">I", body, 2)[0]
                if psot > 2 + seg_len:
                    # Psot spans headers + data to the next tile-part
                    jump = pos - 2 + psot
                    if jump <= len(data):
                        pos = jump
                        continue
        pos += seg_len
    out["error"] = "truncated" if seen_siz and seen_cod else "short"
    out["truncated"] = 1 if seen_siz else None
    return out


def jp2_meta(data: bytes) -> dict:
    """Route + parse a JP2 container or raw J2K codestream."""
    if data[:2] == struct.pack(">H", _SOC):
        out = _parse_codestream(data)
        out["container"] = "j2k" if out["w"] is not None else None
        return out
    base = {
        "valid": 0, "error": "bad_magic", "container": None, "w": None,
        "h": None, "n_comp": None, "n_tiles": None, "prog": None,
        "n_levels": None, "n_layers": None, "has_qcd": 0, "n_sot": 0,
        "truncated": None,
    }
    if not data.startswith(_JP2_MAGIC):
        return base
    pos = 12
    codestream = None
    ihdr: Optional[Tuple[int, int, int]] = None
    while pos + 8 <= len(data):
        size, tag = struct.unpack_from(">I4s", data, pos)
        if size == 0:
            size = len(data) - pos
        if size < 8 or pos + size > len(data):
            base["error"] = "box_bounds"
            base["container"] = "jp2"
            return base
        body = data[pos + 8:pos + size]
        if tag == b"jp2h":
            # superbox: scan for ihdr
            q = 0
            while q + 8 <= len(body):
                bsz, btag = struct.unpack_from(">I4s", body, q)
                if bsz < 8 or q + bsz > len(body):
                    break
                if btag == b"ihdr" and bsz >= 8 + 10:
                    h, w, nc = struct.unpack_from(">IIH", body, q + 8)
                    ihdr = (w, h, nc)
                q += bsz
        elif tag == b"jp2c":
            codestream = body
            break
        pos += size
    if codestream is None:
        base["error"] = "no_codestream"
        base["container"] = "jp2"
        return base
    out = _parse_codestream(codestream)
    out["container"] = "jp2"
    # ihdr must agree with SIZ (integrity signal, like qm41's CRC audit)
    if out["valid"] and ihdr is not None:
        if ihdr != (out["w"], out["h"], out["n_comp"]):
            out["valid"] = 0
            out["error"] = "ihdr_mismatch"
    return out


# ---------------------------------------------------------------------------
# Fixture writers (own encoders; the reader shares nothing with them)
# ---------------------------------------------------------------------------

def encode_j2k(
    w: int, h: int, n_comp: int = 1, tile: int = 64, prog: int = 0,
    levels: int = 5, layers: int = 1, n_tile_parts: int = 1,
    with_eoc: bool = True,
) -> bytes:
    """Assemble a structurally-valid J2K codestream skeleton."""
    out = bytearray(struct.pack(">H", _SOC))
    siz = struct.pack(
        ">HIIIIIIIIH", 0, w, h, 0, 0, tile, tile, 0, 0, n_comp
    ) + b"\x07\x01\x01" * n_comp
    out += struct.pack(">HH", _SIZ, 2 + len(siz)) + siz
    cod = bytes([0, prog]) + struct.pack(">H", layers) + bytes(
        [0, levels, 4, 4, 0, 0]
    )
    out += struct.pack(">HH", _COD, 2 + len(cod)) + cod
    qcd = bytes([0x40]) + bytes(3 * (levels + 1))
    out += struct.pack(">HH", _QCD, 2 + len(qcd)) + qcd
    for t in range(n_tile_parts):
        payload = bytes([0x80 | (t % 16), t % 251, 0xFE])
        psot = 12 + 2 + len(payload)  # SOT segment + SOD marker + data
        out += struct.pack(">HHHIBB", _SOT, 10, t, psot, 0, 1)
        out += struct.pack(">H", _SOD) + payload
    if with_eoc:
        out += struct.pack(">H", _EOC)
    return bytes(out)


def encode_jp2(
    w: int, h: int, n_comp: int = 1, ihdr_override=None, **kw
) -> bytes:
    """Wrap a codestream in the JP2 box structure."""
    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I4s", 8 + len(body), tag) + body

    iw, ih, inc = ihdr_override or (w, h, n_comp)
    ihdr = box(b"ihdr", struct.pack(">IIHBBBB", ih, iw, inc, 7, 7, 0, 0))
    colr = box(b"colr", bytes([1, 0, 0]) + struct.pack(">I", 17))
    return (
        _JP2_MAGIC
        + box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
        + box(b"jp2h", ihdr + colr)
        + box(b"jp2c", encode_j2k(w, h, n_comp, **kw))
    )
