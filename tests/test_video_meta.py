"""ISO-BMFF header-only metadata (core/video.py) — E140.

No codec payload is ever read; fixtures are honest box structures from
``encode_mp4_skeleton`` (real sizes, real 16.16 fixed-point fields, both
mvhd/tkhd version layouts, the size==1 largesize escape).
"""

import struct

import pytest

from pdf_spark.core.video import encode_mp4_skeleton, mp4_meta


def test_v0_roundtrip_video_audio():
    buf = encode_mp4_skeleton(
        "isom", 600, 3000, [("vide", 640, 360), ("soun", 0, 0)]
    )
    m = mp4_meta(buf)
    assert m == {
        "brand": "isom",
        "duration_ms": 5000,
        "width": 640,
        "height": 360,
        "n_video": 1,
        "n_audio": 1,
    }


def test_v1_64bit_and_largesize_mdat():
    buf = encode_mp4_skeleton(
        "mp42", 90000, 90000 * 7 + 45000, [("vide", 1920, 1080)],
        mvhd_version=1, largesize_mdat=True,
    )
    m = mp4_meta(buf)
    assert m["duration_ms"] == 7500
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["brand"] == "mp42"


def test_multitrack_max_dimension_wins():
    buf = encode_mp4_skeleton(
        "avc1", 1000, 1000,
        [("vide", 160, 90), ("vide", 1280, 720), ("soun", 0, 0), ("vide", 320, 180)],
    )
    m = mp4_meta(buf)
    assert (m["width"], m["height"]) == (1280, 720)
    assert m["n_video"] == 3 and m["n_audio"] == 1


def test_truncated_moov_keeps_parsed_prefix():
    buf = encode_mp4_skeleton("isom", 600, 1200, [("vide", 640, 360)])
    # cut inside the trak box: mvhd (before it) must survive
    cut = buf.find(b"trak") + 6
    m = mp4_meta(buf[:cut])
    assert m["duration_ms"] == 2000
    assert m["n_video"] == 0  # the truncated trak never completed


def test_non_bmff_rejected_and_box_bomb_bounded():
    with pytest.raises(ValueError):
        mp4_meta(b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 64)
    with pytest.raises(ValueError):
        mp4_meta(b"")
    # a box whose declared size exceeds the buffer ends the walk cleanly
    bad = encode_mp4_skeleton("isom", 600, 600, [])[:20] + struct.pack(
        ">I4s", 1 << 30, b"moov"
    )
    m = mp4_meta(bad + b"\x00" * 8)
    assert m["n_video"] == 0


def test_unknown_handler_track_ignored():
    buf = encode_mp4_skeleton("isom", 600, 600, [("text", 0, 0), ("vide", 64, 48)])
    m = mp4_meta(buf)
    assert m["n_video"] == 1 and m["n_audio"] == 0
    assert (m["width"], m["height"]) == (64, 48)
