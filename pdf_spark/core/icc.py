"""ICC profile structural parse (ICC.1:2010 / ISO 15076-1, public spec).

Closes SURVEY §2.3 #36 at the tier this engine needs: the reference's
``libs/color/src`` (~2,100 LoC) implements full ICC *transform evaluation*
for rasterization; a text/metadata engine needs the profile's structure —
the 128-byte header (size, version, device class, data/PCS color spaces,
rendering intent, D50 illuminant check, 'acsp' magic) and the tag table
(count + 12-byte sig/offset/size records with bounds/overlap audit) — to
route, validate, and inventory embedded profiles at corpus scale (PDF
``/ICCBased`` color spaces, JPEG APP2 ``ICC_PROFILE`` chunks, PNG iCCP).

Certified against :func:`encode_icc` (own writer, shares nothing with the
reader) in unit tests and query ``qm51_icc_profile``.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

_ACSP = b"acsp"
_DEVICE_CLASSES = {
    b"scnr": "input", b"mntr": "display", b"prtr": "output",
    b"link": "devicelink", b"spac": "colorspace", b"abst": "abstract",
    b"nmcl": "namedcolor",
}
_COLOR_SPACES = {
    b"XYZ ", b"Lab ", b"Luv ", b"YCbr", b"Yxy ", b"RGB ", b"GRAY",
    b"HSV ", b"HLS ", b"CMYK", b"CMY ", b"2CLR", b"3CLR", b"4CLR",
}
# D50 PCS illuminant, s15Fixed16 (required by the spec for v2/v4)
_D50 = (0x0000F6D6, 0x00010000, 0x0000D32D)
_MAX_TAGS = 256


def icc_meta(data: bytes) -> dict:
    """Parse an ICC profile header + tag table.

    Returns ``valid`` (0/1 with ``error`` reason), device class, data
    color space, PCS, version, rendering intent, tag inventory
    (``n_tags``, presence flags for desc/wtpt/TRC/A2B0), ``d50_ok``
    (PCS illuminant is D50), and ``illum_x`` (raw s15Fixed16).
    """
    out = {
        "valid": 0, "error": None, "dev_class": None, "color_space": None,
        "pcs": None, "version_major": None, "version_minor": None,
        "intent": None, "n_tags": None, "has_desc": None, "has_wtpt": None,
        "has_trc": None, "has_a2b0": None, "d50_ok": None, "illum_x": None,
        "claimed_size": None,
    }
    if len(data) < 132:
        out["error"] = "short"
        return out
    claimed = struct.unpack_from(">I", data, 0)[0]
    out["claimed_size"] = claimed
    if data[36:40] != _ACSP:
        out["error"] = "bad_magic"
        return out
    if claimed > len(data):
        out["error"] = "truncated"
        return out
    dev = data[12:16]
    out["dev_class"] = _DEVICE_CLASSES.get(dev)
    if out["dev_class"] is None:
        out["error"] = "bad_class"
        return out
    space = data[16:20]
    if space not in _COLOR_SPACES:
        out["error"] = "bad_space"
        return out
    out["color_space"] = space.decode("latin-1").strip()
    pcs = data[20:24]
    out["pcs"] = pcs.decode("latin-1").strip()
    out["version_major"] = data[8]
    out["version_minor"] = data[9] >> 4
    out["intent"] = struct.unpack_from(">I", data, 64)[0]
    if out["intent"] > 3:
        out["error"] = "bad_intent"
        return out
    ix, iy, iz = struct.unpack_from(">III", data, 68)
    out["illum_x"] = ix
    out["d50_ok"] = 1 if (ix, iy, iz) == _D50 else 0

    n_tags = struct.unpack_from(">I", data, 128)[0]
    if n_tags > _MAX_TAGS or 132 + 12 * n_tags > len(data):
        out["error"] = "bad_tag_count"
        return out
    sigs = set()
    for k in range(n_tags):
        sig, off, size = struct.unpack_from(">4sII", data, 132 + 12 * k)
        if off + size > claimed or off < 132 + 12 * n_tags:
            out["error"] = "tag_bounds"
            return out
        sigs.add(sig)
    out["n_tags"] = n_tags
    out["has_desc"] = 1 if b"desc" in sigs else 0
    out["has_wtpt"] = 1 if b"wtpt" in sigs else 0
    out["has_trc"] = 1 if sigs & {b"rTRC", b"gTRC", b"bTRC", b"kTRC"} else 0
    out["has_a2b0"] = 1 if b"A2B0" in sigs else 0
    out["valid"] = 1
    return out


def encode_icc(
    dev_class: bytes = b"mntr",
    color_space: bytes = b"RGB ",
    pcs: bytes = b"XYZ ",
    version: Tuple[int, int] = (4, 3),
    intent: int = 0,
    tags: Optional[List[Tuple[bytes, bytes]]] = None,
    truncate_to: Optional[int] = None,
) -> bytes:
    """Assemble a structurally-valid ICC profile (fixture writer)."""
    tags = tags if tags is not None else [
        (b"desc", b"\x00" * 16), (b"wtpt", b"XYZ \x00\x00\x00\x00" + bytes(12)),
        (b"rTRC", b"curv" + bytes(8)),
    ]
    n = len(tags)
    table_end = 132 + 12 * n
    bodies = bytearray()
    entries = bytearray()
    for sig, body in tags:
        entries += struct.pack(
            ">4sII", sig.ljust(4)[:4], table_end + len(bodies), len(body)
        )
        bodies += body
        while len(bodies) % 4:
            bodies.append(0)
    total = table_end + len(bodies)

    head = bytearray(128)
    struct.pack_into(">I", head, 0, total)
    head[4:8] = b"none"                      # preferred CMM
    head[8] = version[0]
    head[9] = version[1] << 4
    head[12:16] = dev_class
    head[16:20] = color_space
    head[20:24] = pcs
    struct.pack_into(">HHHHHH", head, 24, 2026, 1, 1, 0, 0, 0)  # date
    head[36:40] = _ACSP
    struct.pack_into(">I", head, 64, intent)
    struct.pack_into(">III", head, 68, *_D50)
    out = bytes(head) + struct.pack(">I", n) + bytes(entries) + bytes(bodies)
    if truncate_to is not None:
        return out[:truncate_to]
    return out
