"""Type1 font program (FontFile) built-in /Encoding reader.

The reference's FontDescriptor deserde lists FontFile (Type1) as a todo
(font_descriptor.c — only FontFile2/FontFile3 paths are wired); rendering
would need the eexec-encrypted charstrings. Extraction needs only the
CLEARTEXT header: a Type1 program declares its built-in encoding before
eexec as either

    /Encoding StandardEncoding def

or a literal array filled with ``dup <code> /<glyphname> put`` lines.
That gives code -> glyph name for symbolic Type1 fonts that carry no PDF
``/Encoding`` and no ToUnicode — the same decode slot the CFF charset
(core/cff.py) and sfnt cmap (core/sfnt.py) fill for their formats.

PFB segmentation (0x80-prefixed block headers, little-endian lengths) is
unwrapped; PFA/raw cleartext is consumed as-is. Only the region between
``/Encoding`` and its closing ``def`` is scanned, capped to keep
attacker-controlled sizes bounded.
"""

from __future__ import annotations

import re
from typing import Optional

_ENC_SCAN_CAP = 64 * 1024  # bytes of encoding block we will scan
_DUP_RE = re.compile(rb"dup\s+(\d{1,3})\s*/([^\s/(){}<>\[\]%]+)\s+put")


def _unwrap_pfb(data: bytes) -> bytes:
    """Concatenate PFB ASCII/binary segment payloads (we only need the
    leading ASCII one, but walking them all is simpler and bounded)."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos + 6 <= n and data[pos] == 0x80:
        seg_type = data[pos + 1]
        if seg_type == 3:  # EOF marker
            break
        length = int.from_bytes(data[pos + 2 : pos + 6], "little")
        payload_end = pos + 6 + length
        if length < 0 or payload_end > n:
            break
        out += data[pos + 6 : payload_end]
        pos = payload_end
    return bytes(out) if out else data


def parse_type1_encoding(data: bytes) -> Optional[dict[int, str]]:
    """code -> glyph name from the cleartext /Encoding block, or None when
    the program declares StandardEncoding (callers already fall back to
    it), is encrypted-only, or is unparseable."""
    if not data:
        return None
    if data[0] == 0x80:
        data = _unwrap_pfb(data)
    if not data.startswith(b"%!"):
        return None
    at = data.find(b"/Encoding")
    if at < 0:
        return None
    block = data[at : at + _ENC_SCAN_CAP]
    # stop at the array's closing `def` (or eexec, whichever comes first)
    stop = block.find(b" def")
    eexec = block.find(b"eexec")
    if 0 <= eexec < (stop if stop >= 0 else eexec + 1):
        stop = eexec
    if stop >= 0:
        block = block[:stop]
    if b"StandardEncoding" in block[:64]:
        return None
    out: dict[int, str] = {}
    for m in _DUP_RE.finditer(block):
        code = int(m.group(1))
        if code <= 0xFF:
            out[code] = m.group(2).decode("latin-1")
    return out or None


# --- eexec + charstring layer (E288) -----------------------------------------
#
# The reference lists FontFile (Type1) entirely as a todo
# (font_descriptor.c); this closes the format's outline half to match
# E278's Type 2 story: eexec decryption (Type 1 spec §7.2, r=55665),
# /CharStrings + /Subrs extraction (RD/-| binary tokens, per-charstring
# r=4330 decryption, /lenIV skip), feeding the Type 1 charstring
# interpreter in core/outlines.py.

_EEXEC_C1 = 52845
_EEXEC_C2 = 22719
_MAX_CHARSTRINGS = 4096


def t1_decrypt(data: bytes, r: int, skip: int) -> bytes:
    """Type 1 eexec/charstring decryption (spec §7.2/§7.3)."""
    out = bytearray()
    for byte in data:
        out.append(byte ^ (r >> 8))
        r = ((byte + r) * _EEXEC_C1 + _EEXEC_C2) & 0xFFFF
    return bytes(out[skip:])


def t1_encrypt(data: bytes, r: int, pad: int) -> bytes:
    """Inverse of :func:`t1_decrypt` (fixture writer side)."""
    plain = bytes(pad) + data
    out = bytearray()
    for byte in plain:
        c = byte ^ (r >> 8)
        out.append(c)
        r = ((c + r) * _EEXEC_C1 + _EEXEC_C2) & 0xFFFF
    return bytes(out)


_RD_RE = re.compile(rb"/([^\s/(){}<>\[\]%]+)\s+(\d+)\s+(?:RD|-\|)\s")
_SUBR_RE = re.compile(rb"dup\s+(\d+)\s+(\d+)\s+(?:RD|-\|)\s")
_LENIV_RE = re.compile(rb"/lenIV\s+(\d+)")


def type1_charstrings(data: bytes):
    """Extract decrypted ``(charstrings, subrs)`` from a Type 1 program.

    Returns ``(dict[name, bytes], list[bytes])`` or ``None`` when no
    eexec section parses. Handles PFB wrapping, ASCII-hex eexec form,
    /lenIV overrides, and both RD and ``-|`` binary-start tokens.
    """
    data = _unwrap_pfb(data)
    idx = data.find(b"eexec")
    if idx < 0:
        return None
    enc = data[idx + 5:].lstrip(b"\r\n\t ")
    # ASCII-hex form: first 4 bytes all hex digits (spec's detection rule)
    if all(c in b"0123456789abcdefABCDEF" for c in enc[:4]):
        hex_end = len(enc)
        m = re.search(rb"[^0-9a-fA-F\s]", enc)
        if m:
            hex_end = m.start()
        try:
            enc = bytes.fromhex(enc[:hex_end].decode("ascii").replace(
                "\n", "").replace("\r", "").replace(" ", "").replace(
                "\t", ""))
        except ValueError:
            return None
    priv = t1_decrypt(enc, 55665, 4)
    m = _LENIV_RE.search(priv)
    len_iv = int(m.group(1)) if m else 4
    cs_idx = priv.find(b"/CharStrings")
    if cs_idx < 0:
        return None
    subrs: list = []
    s_idx = priv.find(b"/Subrs")
    if 0 <= s_idx < cs_idx:
        pos = s_idx
        while len(subrs) < _MAX_CHARSTRINGS:
            m = _SUBR_RE.search(priv, pos, cs_idx)
            if m is None:
                break
            i, n = int(m.group(1)), int(m.group(2))
            raw = priv[m.end():m.end() + n]
            while len(subrs) <= i:
                subrs.append(b"")
            subrs[i] = t1_decrypt(raw, 4330, len_iv)
            pos = m.end() + n
    out: dict = {}
    pos = cs_idx
    while len(out) < _MAX_CHARSTRINGS:
        m = _RD_RE.search(priv, pos)
        if m is None:
            break
        name, n = m.group(1).decode("latin-1"), int(m.group(2))
        raw = priv[m.end():m.end() + n]
        if len(raw) == n and name not in out:
            out[name] = t1_decrypt(raw, 4330, len_iv)
        pos = m.end() + n
    return (out, subrs) if out else None


def encode_type1_font(
    charstrings: dict, subrs=(), encoding=None, len_iv: int = 4
) -> bytes:
    """Assemble a structurally-valid Type 1 program (fixture writer)."""
    head = bytearray(b"%!PS-AdobeFont-1.0: Fixture 001.001\n")
    head += b"/FontName /Fixture def\n"
    if encoding:
        head += b"/Encoding 256 array\n"
        head += b"0 1 255 {1 index exch /.notdef put} for\n"
        for code, name in sorted(encoding.items()):
            head += (b"dup " + str(code).encode() + b" /"
                     + name.encode() + b" put\n")
        head += b"readonly def\n"
    else:
        head += b"/Encoding StandardEncoding def\n"
    head += b"currentdict end\ncurrentfile eexec\n"
    priv = bytearray(b"dup /Private 8 dict dup begin\n")
    priv += b"/lenIV " + str(len_iv).encode() + b" def\n"
    if subrs:
        priv += b"/Subrs " + str(len(subrs)).encode() + b" array\n"
        for i, s in enumerate(subrs):
            enc_s = t1_encrypt(s, 4330, len_iv)
            priv += (b"dup " + str(i).encode() + b" "
                     + str(len(enc_s)).encode() + b" RD " + enc_s
                     + b" NP\n")
        priv += b"ND\n"
    priv += (b"/CharStrings " + str(len(charstrings)).encode()
             + b" dict dup begin\n")
    for name, cs in charstrings.items():
        enc_cs = t1_encrypt(cs, 4330, len_iv)
        priv += (b"/" + name.encode() + b" " + str(len(enc_cs)).encode()
                 + b" RD " + enc_cs + b" ND\n")
    priv += b"end\nend\nmark currentfile closefile\n"
    return bytes(head) + t1_encrypt(bytes(priv), 55665, 4) + b"\n0" * 8
