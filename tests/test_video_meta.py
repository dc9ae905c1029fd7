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


# ---------------------------------------------------------- Matroska/WebM


def test_mkv_roundtrip_and_doctype_routing():
    from pdf_spark.core.video import encode_mkv_skeleton, mkv_meta, video_meta

    buf = encode_mkv_skeleton("webm", 5432, [("video", 640, 360), ("audio", 0, 0)])
    m = mkv_meta(buf)
    assert m == {
        "doc_type": "webm",
        "duration_ms": 5432,
        "width": 640,
        "height": 360,
        "n_video": 1,
        "n_audio": 1,
    }
    assert video_meta(buf)["format"] == "webm"
    mk = encode_mkv_skeleton("matroska", 7, [("audio", 0, 0)])
    assert video_meta(mk)["format"] == "matroska"


def test_mkv_unknown_segment_size_and_float32():
    from pdf_spark.core.video import encode_mkv_skeleton, mkv_meta

    buf = encode_mkv_skeleton(
        "webm", 123456, [("video", 1920, 1080)],
        float32=True, unknown_segment_size=True,
    )
    m = mkv_meta(buf)
    assert m["duration_ms"] == 123456  # < 2^24: float32-exact
    assert (m["width"], m["height"]) == (1920, 1080)


def test_mkv_max_dims_and_truncation():
    from pdf_spark.core.video import encode_mkv_skeleton, mkv_meta

    buf = encode_mkv_skeleton(
        "matroska", 1000,
        [("video", 64, 48), ("video", 1280, 720), ("audio", 0, 0)],
    )
    m = mkv_meta(buf)
    assert (m["width"], m["height"], m["n_video"], m["n_audio"]) == (1280, 720, 2, 1)
    # truncated mid-Tracks: Info (duration) survives, bad varint tolerated
    cut = buf.find(bytes([0x16, 0x54, 0xAE, 0x6B])) + 6
    t = mkv_meta(buf[:cut])
    assert t["duration_ms"] == 1000 and t["n_video"] == 0


def test_video_meta_router_unknown():
    from pdf_spark.core.video import video_meta

    assert video_meta(b"GIF89a" + b"\x00" * 32)["format"] == "unknown"
    assert video_meta(b"")["format"] == "unknown"


def test_mp4_sample_table_roundtrip():
    from pdf_spark.core.video import encode_mp4_skeleton, mp4_sample_table

    b = encode_mp4_skeleton(
        "isom", 1000, 1100, [("vide", 320, 240), ("soun", 0, 0)],
        sample_tables=[([(5, 100), (3, 200)], [1, 4, 7]), None],
    )
    assert mp4_sample_table(b) == {
        "n_samples": 8, "n_keyframes": 3, "media_duration_ms": 1100,
        "first_keyframe": 1, "last_keyframe": 7,
    }


def test_mp4_sample_table_no_stss_means_all_sync():
    from pdf_spark.core.video import encode_mp4_skeleton, mp4_sample_table

    b = encode_mp4_skeleton(
        "isom", 90000, 0, [("vide", 64, 64)],
        sample_tables=[([(10, 3000)], None)],
    )
    m = mp4_sample_table(b)
    assert (m["n_samples"], m["n_keyframes"], m["last_keyframe"]) == (10, 10, 10)
    assert m["media_duration_ms"] == 10 * 3000 * 1000 // 90000


def test_mp4_sample_table_routing_and_meta_compat():
    import pytest

    from pdf_spark.core.video import (
        encode_mp4_skeleton, mp4_meta, mp4_sample_table,
    )

    audio_only = encode_mp4_skeleton("isom", 1000, 5, [("soun", 0, 0)])
    assert mp4_sample_table(audio_only)["n_samples"] == 0
    with pytest.raises(ValueError):
        mp4_sample_table(b"zzzzzzzzzzzz")
    # a stbl-bearing skeleton still reads identically through mp4_meta
    b = encode_mp4_skeleton(
        "isom", 1000, 7, [("vide", 320, 240)],
        sample_tables=[([(2, 3)], [1])],
    )
    m = mp4_meta(b)
    assert (m["n_video"], m["width"], m["duration_ms"]) == (1, 320, 7)
    # out-of-range stss entries are dropped, truncated stts clamped
    tr = mp4_sample_table(
        encode_mp4_skeleton("isom", 1000, 0, [("vide", 8, 8)],
                            sample_tables=[([(3, 10)], [1, 99])])
    )
    assert (tr["n_keyframes"], tr["last_keyframe"]) == (1, 1)


def test_heif_meta_roundtrip_and_brands():
    from pdf_spark.core.video import encode_heif_skeleton, heif_meta

    m = heif_meta(encode_heif_skeleton(b"avif", [(640, 480), (64, 48)], 2))
    assert m == {
        "brand": "avif", "width": 640, "height": 480,
        "n_ispe": 2, "n_items": 2, "is_animated": 0,
    }
    # thumbnail-first order: largest ispe still wins
    m = heif_meta(encode_heif_skeleton(b"heic", [(32, 32), (1024, 768)], 3))
    assert (m["width"], m["height"], m["n_items"]) == (1024, 768, 3)
    # sequence brands flag animation
    assert heif_meta(encode_heif_skeleton(b"avis", [(10, 10)], 1))[
        "is_animated"
    ] == 1


def test_heif_meta_rejects_and_truncation():
    import pytest

    from pdf_spark.core.video import (
        encode_heif_skeleton, encode_mp4_skeleton, heif_meta,
    )

    # plain video MP4 and raw bytes both raise (single router rule)
    with pytest.raises(ValueError):
        heif_meta(encode_mp4_skeleton("isom", 1000, 500, [("vide", 8, 8)]))
    with pytest.raises(ValueError):
        heif_meta(b"\x89PNG\r\n\x1a\n" + bytes(8))
    # truncated meta keeps what was parsed before the cut
    full = encode_heif_skeleton(b"avif", [(100, 50)], 1)
    cut = heif_meta(full[: len(full) - 20])
    assert cut["brand"] == "avif" and cut["width"] == 100
