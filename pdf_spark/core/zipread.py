"""Bounded ZIP container reader — the container tier under OOXML/EPUB/ODF.

A large share of the crawl's "document" payloads are not bare bytes but
ZIP containers (DOCX/XLSX/PPTX, EPUB, ODT, JAR...). Before any member
is decoded the pipeline needs a CONTAINER audit at header cost: how many
members, how big they claim to inflate, whether any member is encrypted,
and whether the claimed inflation ratio marks a zip bomb — the audit
that decides if a blob is worth routing to a (costly) member decode.

Layout is the public PKWARE APPNOTE: an End-Of-Central-Directory record
(``PK\\x05\\x06``) scanned from the TAIL, a central directory of
``PK\\x01\\x02`` entries, and per-member local headers (``PK\\x03\\x04``).
Design rules, matching the rest of ``core/``:

- Trust only the CENTRAL directory. Local headers on crawled zips lie
  (streamed writers leave sizes zero with a trailing data descriptor);
  the central directory is what a compliant reader consults, and a
  prefix-concatenated zip (self-extracting stub, polyglot) is handled by
  the standard shift fix: the gap between where the EOCD says the
  directory lives and where it actually sits is added to every offset.
- Clamp everything: entry count (``ENTRY_CAP``), name length, and the
  inflate output (``max_out``) — a member that claims 4 GiB from 40 KiB
  is reported, never inflated.
- Report, never raise: malformed containers come back as
  ``is_zip=0`` / ``ok=False`` rows, the qx02 error-histogram discipline.

stdlib ``zipfile`` is deliberately NOT used on the read path (it trusts
local headers and raises on the malformed tails a crawl serves); test
fixtures DO use ``zipfile`` as the honest independent writer.

Reference parity note: the C reference (someone13574/pdf) has no
container tier at all — net-new surface, like E19's HTML tier.
"""

from __future__ import annotations

import struct
import zlib

__all__ = [
    "zip_entries",
    "zip_extract",
    "zip_find",
    "zip_inventory",
    "ENTRY_CAP",
]

ENTRY_CAP = 4096  # adversarial member-count bomb
_EOCD_SIG = b"PK\x05\x06"
_CEN_SIG = b"PK\x01\x02"
_LOC_SIG = b"PK\x03\x04"
_MAX_COMMENT = 0x10000 + 22  # EOCD is within this many tail bytes

# Bomb thresholds: both must hold, each far from any fixture boundary.
BOMB_RATIO = 50
BOMB_MIN_UNCOMP = 65536


def _find_eocd(data: bytes) -> int:
    """Offset of the EOCD record, or -1. Scans the tail window only."""
    start = max(0, len(data) - _MAX_COMMENT)
    pos = data.rfind(_EOCD_SIG, start)
    while pos != -1:
        # Sanity: the comment length must reach exactly the buffer end
        # (or the record is an embedded decoy inside a member).
        if pos + 22 <= len(data):
            (clen,) = struct.unpack_from("<H", data, pos + 20)
            if pos + 22 + clen == len(data):
                return pos
        pos = data.rfind(_EOCD_SIG, start, pos)
    return -1


def zip_entries(data: bytes, max_entries: int = ENTRY_CAP) -> list[dict]:
    """Central-directory walk → one dict per member (bounded).

    Returns ``[]`` for anything that is not a well-formed zip. Offsets
    are pre-shifted for prefix-concatenated containers, so
    ``zip_extract`` can use ``local_off`` directly.
    """
    eocd = _find_eocd(data)
    if eocd < 0:
        return []
    n_total, cd_size, cd_off = struct.unpack_from("<HII", data, eocd + 10)
    # Prefix shift: where the directory actually sits vs where the EOCD
    # claims (self-extracting stub / polyglot prefix).
    shift = eocd - cd_size - cd_off
    if shift < 0:  # EOCD inside the claimed directory: malformed
        return []
    pos = cd_off + shift
    out: list[dict] = []
    for _ in range(min(n_total, max_entries)):
        if data[pos : pos + 4] != _CEN_SIG or pos + 46 > len(data):
            break
        (
            flags,
            method,
            _time,
            _date,
            crc,
            comp_size,
            uncomp_size,
            name_len,
            extra_len,
            comment_len,
        ) = struct.unpack_from("<HHHHIIIHHH", data, pos + 8)
        (local_off,) = struct.unpack_from("<I", data, pos + 42)
        name_raw = data[pos + 46 : pos + 46 + min(name_len, 4096)]
        try:
            name = name_raw.decode("utf-8")
        except UnicodeDecodeError:
            name = name_raw.decode("cp437", "replace")
        out.append(
            {
                "name": name,
                "method": method,
                "encrypted": bool(flags & 0x1),
                "crc32": crc,
                "comp_size": comp_size,
                "uncomp_size": uncomp_size,
                "local_off": local_off + shift,
                "is_dir": name.endswith("/"),
            }
        )
        pos += 46 + name_len + extra_len + comment_len
    return out


def zip_extract(
    data: bytes, entry: dict, max_out: int = 64 * 1024 * 1024
) -> bytes | None:
    """Inflate one member (central-directory sizes, capped output).

    ``None`` on: bad local header, unsupported method (only stored=0 and
    deflate=8 — the only methods OOXML/EPUB writers emit), encryption,
    output exceeding ``max_out``, or a short/corrupt deflate stream.
    """
    if entry["encrypted"] or entry["uncomp_size"] > max_out:
        return None
    off = entry["local_off"]
    if data[off : off + 4] != _LOC_SIG or off + 30 > len(data):
        return None
    name_len, extra_len = struct.unpack_from("<HH", data, off + 26)
    start = off + 30 + name_len + extra_len
    comp = data[start : start + entry["comp_size"]]
    if len(comp) != entry["comp_size"]:
        return None
    if entry["method"] == 0:
        return comp
    if entry["method"] != 8:
        return None
    try:
        d = zlib.decompressobj(-15)
        out = d.decompress(comp, max_out + 1)
    except zlib.error:
        return None
    if len(out) > max_out:
        return None
    return out


def zip_find(data: bytes, name: str) -> bytes | None:
    """Extract one member by exact name (first central-dir match)."""
    for entry in zip_entries(data):
        if entry["name"] == name:
            return zip_extract(data, entry)
    return None


def zip_inventory(data: bytes) -> dict:
    """Container audit at directory cost — no member is inflated.

    ``bomb_suspect`` fires when the CLAIMED aggregate inflation is both
    large (>= ``BOMB_MIN_UNCOMP`` bytes) and extreme
    (>= ``BOMB_RATIO`` : 1) — claims, because inflating to verify is
    exactly what a bomb wants.
    """
    entries = zip_entries(data)
    if not entries:
        return {
            "is_zip": 0,
            "n_entries": None,
            "n_dirs": None,
            "total_comp": None,
            "total_uncomp": None,
            "n_deflated": None,
            "has_encrypted": None,
            "bomb_suspect": None,
        }
    files = [e for e in entries if not e["is_dir"]]
    total_comp = sum(e["comp_size"] for e in files)
    total_uncomp = sum(e["uncomp_size"] for e in files)
    bomb = int(
        total_uncomp >= BOMB_MIN_UNCOMP
        and total_uncomp >= BOMB_RATIO * max(total_comp, 1)
    )
    return {
        "is_zip": 1,
        "n_entries": len(entries),
        "n_dirs": sum(1 for e in entries if e["is_dir"]),
        "total_comp": total_comp,
        "total_uncomp": total_uncomp,
        "n_deflated": sum(1 for e in files if e["method"] == 8),
        "has_encrypted": int(any(e["encrypted"] for e in entries)),
        "bomb_suspect": bomb,
    }
