"""WOFF / WOFF2 web-font container audit (W3C specs, public).

Web pages deliver fonts as WOFF (zlib-per-table wrapper around sfnt,
W3C WOFF 1.0) or WOFF2 (Brotli-compressed, W3C WOFF 2.0). qm38's
``font_meta`` reads raw sfnt (the PDF-embedded form); this audits the
WEB delivery wrapper: header sanity, sfnt flavor routing, table
bookkeeping, declared-vs-actual length, extended-metadata presence —
without inflating any table (Brotli isn't in this container, and the
gate doesn't need it).

WOFF 1.0 header (44 bytes, all big-endian like sfnt):
signature 'wOFF', flavor, length, numTables:u16, reserved:u16(=0),
totalSfntSize, major:u16, minor:u16, metaOffset, metaLength,
metaOrigLength, privOffset, privLength; then numTables x 20-byte
directory entries (tag, offset, compLength, origLength, origChecksum).
WOFF2 shares the first 16 header bytes (signature 'wOF2', flavor,
length, numTables, reserved) but its table directory is inside the
Brotli stream — header-only audit there.
"""

from __future__ import annotations

import struct

_FLAVORS = {
    0x00010000: "truetype",
    0x4F54544F: "cff",       # 'OTTO'
    0x74727565: "truetype",  # 'true' (legacy Apple)
}


def woff_audit(data: bytes) -> dict:
    """Audit one WOFF/WOFF2 payload. Returns::

        {is_woff, woff_version, flavor, n_tables, has_metadata,
         length_ok, truncated}

    ``length_ok`` compares the header's declared total length with the
    actual payload size; ``truncated`` (WOFF1 only) flags a table
    directory or a table's compressed bytes running past the buffer.
    """
    none = {
        "is_woff": 0, "woff_version": None, "flavor": None,
        "n_tables": None, "has_metadata": None, "length_ok": None,
        "truncated": None,
    }
    if len(data) < 16 or data[:4] not in (b"wOFF", b"wOF2"):
        return none
    version = 1 if data[:4] == b"wOFF" else 2
    flavor_num, length, n_tables = struct.unpack(">IIH", data[4:14])
    flavor = _FLAVORS.get(flavor_num)
    length_ok = int(length == len(data))
    if version == 2:
        # directory is inside the Brotli stream — header audit only
        return {
            "is_woff": 1, "woff_version": 2, "flavor": flavor,
            "n_tables": n_tables, "has_metadata": None,
            "length_ok": length_ok, "truncated": 0,
        }
    if len(data) < 44:
        return {
            "is_woff": 1, "woff_version": 1, "flavor": flavor,
            "n_tables": n_tables, "has_metadata": None,
            "length_ok": length_ok, "truncated": 1,
        }
    meta_len = struct.unpack(">I", data[28:32])[0]
    truncated = 0
    for t in range(n_tables):
        base = 44 + 20 * t
        if base + 20 > len(data):
            truncated = 1
            break
        _tag, offset, comp_len = struct.unpack(">4sII", data[base:base + 12])
        if offset + comp_len > len(data):
            truncated = 1
            break
    return {
        "is_woff": 1, "woff_version": 1, "flavor": flavor,
        "n_tables": n_tables, "has_metadata": int(meta_len > 0),
        "length_ok": length_ok, "truncated": truncated,
    }


def encode_woff(
    tables: list[tuple[bytes, bytes]],
    flavor: int = 0x00010000,
    meta: bytes = b"",
) -> bytes:
    """Assemble a valid WOFF1 container (tables stored uncompressed —
    legal: compLength == origLength) — the fixture writer the audit is
    certified against."""
    n = len(tables)
    dir_end = 44 + 20 * n
    blobs = bytearray()
    entries = bytearray()
    for tag, payload in tables:
        offset = dir_end + len(blobs)
        entries += struct.pack(
            ">4sIIII", tag.ljust(4)[:4], offset, len(payload), len(payload), 0
        )
        blobs += payload
        while len(blobs) % 4:  # tables are 4-byte aligned
            blobs.append(0)
    meta_offset = dir_end + len(blobs) if meta else 0
    total = dir_end + len(blobs) + len(meta)
    header = struct.pack(
        ">4sIIHHIHHIIIII",
        b"wOFF", flavor, total, n, 0,
        12 + 16 * n + sum(len(p) for _t, p in tables),
        1, 0, meta_offset, len(meta), len(meta), 0, 0,
    )
    return bytes(header + entries + blobs + meta)
