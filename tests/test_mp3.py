"""MP3 frame-walk unit tests (core/mp3.py)."""

from pdf_spark.core.mp3 import encode_mp3_frames, mp3_audit


def test_cbr_walk_and_duration():
    a = mp3_audit(encode_mp3_frames([128] * 10))
    assert a["is_mp3"] == 1 and a["n_frames"] == 10
    assert a["is_vbr"] == 0 and a["bitrate_kbps"] == 128
    assert a["duration_ms"] == (10 * 1152 * 1000) // 44100
    assert a["truncated"] == 0


def test_vbr_and_id3_envelope_skip():
    a = mp3_audit(encode_mp3_frames([128, 192, 128, 320], id3_size=50))
    assert a["is_vbr"] == 1 and a["n_frames"] == 4
    assert a["bitrate_kbps"] == 128  # first frame's rate


def test_truncation_and_rejects():
    f = encode_mp3_frames([128] * 3)
    a = mp3_audit(f[:-10])
    assert a["truncated"] == 1 and a["n_frames"] == 2
    assert mp3_audit(b"RIFF....")["is_mp3"] == 0
    assert mp3_audit(b"ID3\x04\x00\x00\x00\x00\x00\x05" + b"\x00" * 5)[
        "is_mp3"
    ] == 0  # tag only, no frames
    # sync loss mid-stream flags
    bad = bytearray(f)
    bad[len(f) // 2] = 0x00  # corrupt inside frame 2's header area
    # (corruption inside payload bytes is legal; corrupt a header sync)
    frame_len = (144 * 128 * 1000) // 44100
    bad2 = bytearray(f)
    bad2[frame_len] = 0x00
    a = mp3_audit(bytes(bad2))
    assert a["truncated"] == 1 and a["n_frames"] == 1


def test_alt_samplerate():
    a = mp3_audit(encode_mp3_frames([64] * 5, samplerate=32000))
    assert a["samplerate"] == 32000
    assert a["duration_ms"] == (5 * 1152 * 1000) // 32000
