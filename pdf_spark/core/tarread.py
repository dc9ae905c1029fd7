"""Bounded TAR (ustar/POSIX) archive inventory — source-dump routing.

Crawls serve source releases and data dumps as ``.tar`` / ``.tar.gz``;
the routing audit mirrors E182's zip inventory: member/dir counts and
claimed sizes at HEADER cost, member content never materialized beyond
the stream walk, gzip transport unwrapped with an output cap first.

ustar layout (public POSIX.1-1988/2001): 512-byte header blocks —
name[100], size as octal ASCII at offset 124 (GNU base-256 binary form
tolerated), typeflag at 156 ('0'/NUL file, '5' dir, 'L'/'x'/'g'
longname/pax metadata entries counted as neither), magic "ustar" at
257; data rounded up to 512; two zero blocks end the archive.

stdlib ``tarfile`` is deliberately not the read path (it raises on the
truncated tails crawls serve); it IS the honest fixture writer.
"""

from __future__ import annotations

import gzip
import io
import struct

__all__ = ["tar_inventory", "MEMBER_CAP", "GZ_OUT_CAP"]

MEMBER_CAP = 4096
GZ_OUT_CAP = 64 * 1024 * 1024


def _octal(field: bytes) -> int | None:
    if field and field[0] & 0x80:  # GNU base-256 binary size
        val = 0
        for b in field:
            val = (val << 8) | b
        return val & ~(0x80 << (8 * (len(field) - 1)))
    s = field.split(b"\x00")[0].strip(b" \x00")
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError:
        return None


def tar_inventory(data: bytes) -> dict:
    """Archive audit (report-don't-raise; ``is_tar=0`` for non-tar)."""
    null = {
        "is_tar": 0,
        "is_gzipped": None,
        "n_files": None,
        "n_dirs": None,
        "total_size": None,
    }
    gzipped = 0
    if data[:2] == b"\x1f\x8b":
        gzipped = 1
        try:
            with gzip.GzipFile(fileobj=io.BytesIO(data)) as g:
                data = g.read(GZ_OUT_CAP + 1)
        except (OSError, EOFError, struct.error):
            return null
        if len(data) > GZ_OUT_CAP:
            return null
    if len(data) < 512 or data[257:262] != b"ustar":
        return null
    pos = 0
    n_files = n_dirs = total = 0
    for _ in range(MEMBER_CAP):
        block = data[pos : pos + 512]
        if len(block) < 512 or block == b"\x00" * 512:
            break
        size = _octal(block[124:136])
        if size is None:
            break
        typeflag = block[156:157]
        if typeflag in (b"0", b"\x00"):
            n_files += 1
            total += size
        elif typeflag == b"5":
            n_dirs += 1
        # 'L'/'K' GNU longname, 'x'/'g' pax headers: metadata, not members
        pos += 512 + ((size + 511) // 512) * 512
    return {
        "is_tar": 1,
        "is_gzipped": gzipped,
        "n_files": n_files,
        "n_dirs": n_dirs,
        "total_size": total,
    }
