"""Compressed-audio routing meta (core/audio.py mp3/ogg/audio_meta) — E142."""

import pytest

from pdf_spark.core.audio import (
    audio_meta,
    encode_mp3_skeleton,
    encode_ogg_skeleton,
    encode_wav,
    mp3_meta,
    ogg_meta,
)


def test_mp3_cbr_v1_and_v2():
    m = mp3_meta(encode_mp3_skeleton(1, 128, 44100, 2, 50))
    assert (m["mpeg_version"], m["bitrate_kbps"], m["sample_rate"],
            m["channels"]) == (1, 128, 44100, 2)
    fl = 1152 // 8 * 128 * 1000 // 44100
    assert m["duration_ms"] == 50 * fl * 8 // 128
    m2 = mp3_meta(encode_mp3_skeleton(2, 64, 22050, 1, 40))
    assert (m2["mpeg_version"], m2["channels"]) == (2, 1)


def test_mp3_xing_and_id3_skip():
    m = mp3_meta(encode_mp3_skeleton(1, 128, 44100, 2, 33, xing=True, id3=True))
    assert m["duration_ms"] == 33 * 1152 * 1000 // 44100
    m2 = mp3_meta(encode_mp3_skeleton(2, 64, 22050, 1, 21, xing=True))
    assert m2["duration_ms"] == 21 * 576 * 1000 // 22050


def test_mp3_rejects():
    with pytest.raises(ValueError):
        mp3_meta(b"\x00" * 64)  # no sync
    with pytest.raises(ValueError):
        mp3_meta(bytes([0xFF, 0xFD, 0x00, 0x00]) + b"\x00" * 16)  # bad rate idx? free bitrate


def test_ogg_opus_preskip_and_vorbis():
    m = ogg_meta(encode_ogg_skeleton("opus", 2, 48000, 96000, pre_skip=312))
    assert (m["codec"], m["channels"], m["duration_ms"]) == ("opus", 2, 2000)
    v = ogg_meta(encode_ogg_skeleton("vorbis", 1, 44100, 44100 * 3))
    assert (v["codec"], v["sample_rate"], v["duration_ms"]) == ("vorbis", 44100, 3000)
    with pytest.raises(ValueError):
        ogg_meta(b"OggS" + b"\x00" * 40)  # unknown codec ident


def test_audio_router_families():
    assert audio_meta(encode_wav(8000, 1, 16, [0, 5, -5]))["codec"] == "wav"
    assert audio_meta(encode_mp3_skeleton(1, 128, 44100, 2, 3))["codec"] == "mp3"
    assert audio_meta(encode_ogg_skeleton("opus", 2, 48000, 480))["codec"] == "opus"
    assert audio_meta(b"not audio at all")["codec"] == "unknown"
    assert audio_meta(b"")["codec"] == "unknown"


def test_flac_streaminfo_roundtrip():
    from pdf_spark.core.audio import encode_flac_skeleton, flac_meta

    m = flac_meta(encode_flac_skeleton(44100, 2, 16, 44100 * 7 + 123))
    assert m == {
        "codec": "flac", "channels": 2, "sample_rate": 44100,
        "bits_per_sample": 16, "total_samples": 308823,
        "duration_ms": 308823 * 1000 // 44100,
    }
    # 36-bit total-samples field and the channel/bps extremes
    big = flac_meta(encode_flac_skeleton(96000, 8, 32, (1 << 35) + 5))
    assert big["total_samples"] == (1 << 35) + 5
    assert (big["channels"], big["bits_per_sample"]) == (8, 32)
    # unknown total -> duration 0
    assert flac_meta(encode_flac_skeleton(48000, 1, 24, 0))["duration_ms"] == 0


def test_flac_block_walk_and_rejects():
    from pdf_spark.core.audio import encode_flac_skeleton, flac_meta

    # PADDING + VORBIS_COMMENT blocks around STREAMINFO exercise the walk
    b = encode_flac_skeleton(8000, 1, 8, 8000, padding=32, vendor=b"x" * 40)
    assert flac_meta(b)["sample_rate"] == 8000
    with pytest.raises(ValueError):
        flac_meta(b"fLaX" + b"\x00" * 64)  # bad magic
    with pytest.raises(ValueError):
        flac_meta(encode_flac_skeleton(44100, 2, 16, 1000)[:20])  # truncated
    # a last-flagged non-STREAMINFO block ends the walk without one
    with pytest.raises(ValueError):
        flac_meta(b"fLaC" + b"\x81\x00\x00\x04" + b"\x00" * 4)


def test_flac_in_audio_router():
    from pdf_spark.core.audio import encode_flac_skeleton

    m = audio_meta(encode_flac_skeleton(48000, 2, 16, 96000))
    assert (m["codec"], m["channels"], m["sample_rate"], m["duration_ms"]) == (
        "flac", 2, 48000, 2000,
    )


def test_id3v2_versions_and_encodings():
    from pdf_spark.core.audio import encode_id3v2, id3_tags

    for v in (3, 4):
        for enc in (0, 1, 3):
            t = encode_id3v2(v, title="Söng", artist="Ärtist",
                             album="Al", year="2021", encoding=enc)
            m = id3_tags(t)
            assert (m["has_id3"], m["version"]) == (1, v)
            assert m["title"] == "Söng" and m["artist"] == "Ärtist"
            assert m["album"] == "Al" and m["year"] == "2021"


def test_id3v2_on_real_mp3_and_rejects():
    from pdf_spark.core.audio import (
        encode_id3v2, encode_mp3_skeleton, id3_tags, mp3_meta,
    )

    mp3 = encode_id3v2(3, title="T") + encode_mp3_skeleton(1, 128, 44100, 2, 5)
    assert id3_tags(mp3)["title"] == "T"
    assert mp3_meta(mp3)["codec"] == "mp3"  # sync found past the tag
    assert id3_tags(b"junk")["has_id3"] == 0
    assert id3_tags(b"")["has_id3"] == 0
    # truncated mid-frame: has_id3 stays 1 but the cut frame is dropped
    cut = id3_tags(encode_id3v2(4, title="LongTitleHere")[:12])
    assert cut["has_id3"] == 1 and cut["title"] is None
