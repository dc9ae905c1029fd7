"""core/tarread.py — ustar walk vs honest stdlib tarfile writers."""

import gzip
import io
import tarfile

from pdf_spark.core.tarread import tar_inventory


def _tar(members, dirs=(), pax=False):
    buf = io.BytesIO()
    fmt = tarfile.PAX_FORMAT if pax else tarfile.USTAR_FORMAT
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as t:
        for d in dirs:
            info = tarfile.TarInfo(d)
            info.type = tarfile.DIRTYPE
            t.addfile(info)
        for name, payload in members:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            t.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def test_plain_tar_counts_and_sizes():
    data = _tar([("a.txt", b"x" * 100), ("d/b.bin", b"y" * 700)], dirs=["d"])
    inv = tar_inventory(data)
    assert inv == {
        "is_tar": 1,
        "is_gzipped": 0,
        "n_files": 2,
        "n_dirs": 1,
        "total_size": 800,
    }


def test_gzip_transport_unwrapped():
    data = gzip.compress(_tar([("a", b"z" * 50)]))
    inv = tar_inventory(data)
    assert inv["is_gzipped"] == 1 and inv["n_files"] == 1
    assert inv["total_size"] == 50


def test_pax_metadata_entries_not_counted_as_members():
    data = _tar([("f.txt", b"q" * 10)], pax=True)
    inv = tar_inventory(data)
    assert inv["n_files"] == 1 and inv["total_size"] == 10


def test_truncated_tail_keeps_prefix_counts():
    data = _tar([("a", b"x" * 600), ("b", b"y" * 600)])
    inv = tar_inventory(data[: 512 + 1024 + 100])  # b's header cut
    assert inv["is_tar"] == 1 and inv["n_files"] >= 1


def test_not_tar_and_corrupt_gzip():
    assert tar_inventory(b"\x89PNG junk")["is_tar"] == 0
    assert tar_inventory(b"\x1f\x8bcorrupt gzip bytes")["is_tar"] == 0
    assert tar_inventory(b"")["is_tar"] == 0
