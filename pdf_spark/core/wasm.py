"""WebAssembly binary-module structural audit.

Crawled pages increasingly ship ``.wasm`` payloads (and `<script
type="module">` fetches them), so a corpus's binary-asset tier wants the
same reject-before-decode gate qm41/qm42 give images: walk the module's
section framing per the public WebAssembly binary format spec
(webassembly.github.io/spec/core/binary) without decoding any function
body.

Layout: magic ``\\0asm`` + little-endian u32 version, then a sequence of
sections, each ``id:byte`` (0..12) + ``size:LEB128-u32`` + payload.
Unsigned LEB128: 7 data bits per byte, continuation high bit, at most 5
bytes for u32. A custom section (id 0) carries a LEB128-prefixed UTF-8
name at the head of its payload.

No instruction is interpreted and no body parsed — this is framing
integrity only, which is exactly what an ingest gate needs: truncated
and garbage modules flag instead of reaching a runtime.
"""

from __future__ import annotations

_SECTION_NAMES = (
    "custom type import function table memory global export start "
    "element code data datacount"
).split()


def _leb128_u32(data: bytes, pos: int) -> tuple[int | None, int]:
    """Decode an unsigned LEB128 at ``pos``; return (value, next_pos).
    (None, pos) on truncation or a >5-byte (overlong) encoding."""
    result = 0
    for i in range(5):
        if pos + i >= len(data):
            return None, pos
        b = data[pos + i]
        result |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            return result, pos + i + 1
    return None, pos


def wasm_audit(data: bytes) -> dict:
    """Structural audit of one WASM module. Returns::

        {is_wasm, version, n_sections, has_code, has_export,
         n_custom, truncated}

    ``truncated`` flags a section whose declared size runs past the
    payload end, a bad LEB128, or an unknown section id — the module is
    inventoried up to the failure point (tolerant-walk rule, qm39).
    """
    if len(data) < 8 or data[:4] != b"\0asm":
        return {
            "is_wasm": 0,
            "version": None,
            "n_sections": None,
            "has_code": None,
            "has_export": None,
            "n_custom": None,
            "truncated": None,
        }
    version = int.from_bytes(data[4:8], "little")
    pos = 8
    n_sections = n_custom = 0
    has_code = has_export = 0
    truncated = 0
    n = len(data)
    while pos < n:
        sec_id = data[pos]
        pos += 1
        if sec_id > 12:
            truncated = 1
            break
        size, pos2 = _leb128_u32(data, pos)
        if size is None or pos2 + size > n:
            truncated = 1
            break
        n_sections += 1
        if sec_id == 0:
            n_custom += 1
        elif sec_id == 7:
            has_export = 1
        elif sec_id == 10:
            has_code = 1
        pos = pos2 + size
    return {
        "is_wasm": 1,
        "version": version,
        "n_sections": n_sections,
        "has_code": has_code,
        "has_export": has_export,
        "n_custom": n_custom,
        "truncated": truncated,
    }


def encode_wasm(sections: list[tuple[int, bytes]], version: int = 1) -> bytes:
    """Assemble a syntactically-valid module from (id, payload) pairs —
    the fixture writer the audit is certified against (the qm39/qx58
    own-writer pattern)."""
    out = bytearray(b"\0asm" + version.to_bytes(4, "little"))
    for sec_id, payload in sections:
        out.append(sec_id)
        size = len(payload)
        while True:
            b = size & 0x7F
            size >>= 7
            if size:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
        out += payload
    return bytes(out)
