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
