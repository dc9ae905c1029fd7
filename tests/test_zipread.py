"""core/zipread.py — bounded central-directory walker vs honest stdlib
zipfile writers (the independent-implementation rule)."""

import io
import struct
import zipfile

from pdf_spark.core.zipread import (
    zip_entries,
    zip_extract,
    zip_find,
    zip_inventory,
)


def _make(members, method=zipfile.ZIP_DEFLATED, prefix=b"", comment=b""):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", method) as z:
        for name, payload in members:
            z.writestr(name, payload)
        if comment:
            z.comment = comment
    return prefix + buf.getvalue()


def test_roundtrip_stored_and_deflated():
    for method in (zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED):
        data = _make(
            [("a.txt", b"hello"), ("dir/b.bin", bytes(range(256)) * 10)],
            method,
        )
        entries = zip_entries(data)
        assert [e["name"] for e in entries] == ["a.txt", "dir/b.bin"]
        assert zip_extract(data, entries[0]) == b"hello"
        assert zip_extract(data, entries[1]) == bytes(range(256)) * 10
        assert zip_find(data, "dir/b.bin") == bytes(range(256)) * 10
        assert zip_find(data, "missing") is None


def test_directory_entries_and_inventory():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("d/", b"")
        z.writestr("d/x.txt", b"x" * 100)
        z.writestr("y.txt", b"y" * 50, zipfile.ZIP_STORED)
    inv = zip_inventory(buf.getvalue())
    assert inv["is_zip"] == 1
    assert inv["n_entries"] == 3 and inv["n_dirs"] == 1
    assert inv["total_uncomp"] == 150
    assert inv["has_encrypted"] == 0 and inv["bomb_suspect"] == 0


def test_prefix_concatenated_sfx_stub():
    data = _make([("a", b"payload")], prefix=b"MZ fake sfx stub " * 100)
    assert zip_find(data, "a") == b"payload"


def test_trailing_comment_eocd_scan():
    data = _make([("a", b"p")], comment=b"trailing comment " * 50)
    assert zip_find(data, "a") == b"p"


def test_eocd_decoy_inside_member():
    # A member whose CONTENT contains the EOCD signature must not
    # derail the tail scan (comment-length check rejects the decoy).
    decoy = b"PK\x05\x06" + b"\x00" * 18
    data = _make([("a", decoy), ("b", b"real")], zipfile.ZIP_STORED)
    assert zip_find(data, "b") == b"real"
    assert zip_find(data, "a") == decoy


def test_not_a_zip_and_truncated():
    assert zip_entries(b"\x89PNG not a zip") == []
    assert zip_inventory(b"")["is_zip"] == 0
    data = _make([("a", b"x" * 1000)])
    trunc = data[: len(data) // 2]  # EOCD gone entirely
    assert zip_entries(trunc) == []


def test_bomb_claim_flagged_without_inflating():
    # 1 MiB of zeros deflates ~1000:1 — claimed ratio flags, and the
    # inventory never inflates (it only reads the directory).
    data = _make([("z.bin", b"\x00" * (1 << 20))])
    inv = zip_inventory(data)
    assert inv["bomb_suspect"] == 1
    assert inv["total_uncomp"] == 1 << 20
    # normal text container does not flag
    ok = _make([("t.txt", b"normal web text, mixed entropy 1234")])
    assert zip_inventory(ok)["bomb_suspect"] == 0


def test_encrypted_flag_reported_not_extracted():
    data = bytearray(_make([("s.txt", b"secret")], zipfile.ZIP_STORED))
    # Flip GP bit 0 in both the local and the central header by hand
    # (stdlib zipfile cannot write encrypted members).
    loc = data.find(b"PK\x03\x04")
    cen = data.find(b"PK\x01\x02")
    for off in (loc + 6, cen + 8):
        (flags,) = struct.unpack_from("<H", data, off)
        struct.pack_into("<H", data, off, flags | 1)
    entries = zip_entries(bytes(data))
    assert entries[0]["encrypted"] is True
    assert zip_extract(bytes(data), entries[0]) is None
    assert zip_inventory(bytes(data))["has_encrypted"] == 1


def test_output_cap_refuses_oversize_member():
    data = _make([("z.bin", b"\x00" * 100000)])
    (entry,) = zip_entries(data)
    assert zip_extract(data, entry, max_out=4096) is None
    assert zip_extract(data, entry) == b"\x00" * 100000


def test_entry_cap_bounds_walk():
    data = _make([(f"f{i}", b"x") for i in range(50)], zipfile.ZIP_STORED)
    assert len(zip_entries(data, max_entries=10)) == 10
