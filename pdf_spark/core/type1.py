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
