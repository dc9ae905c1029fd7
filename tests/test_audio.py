"""Real WAV/PCM decode (core/audio.py): roundtrip across bit depths and
channel counts, integer-exact features, chunk-walk tolerance, non-PCM
routing."""

import struct

import pytest

from pdf_spark.core.audio import (
    audio_features,
    decode_wav,
    encode_wav,
    wav_meta,
)


class TestWavCodec:
    def test_roundtrip_all_depths(self):
        import random

        rng = random.Random(11)
        for bits, lo, hi in (
            (8, -128, 127),
            (16, -(1 << 15), (1 << 15) - 1),
            (24, -(1 << 23), (1 << 23) - 1),
            (32, -(1 << 31), (1 << 31) - 1),
        ):
            for ch in (1, 2):
                samples = [rng.randint(lo, hi) for _ in range(60)]
                rate = 8000
                got = decode_wav(encode_wav(rate, ch, bits, samples))
                assert got == (rate, ch, bits, samples)

    def test_features_square_wave_exact(self):
        # amplitude-A square wave: peak == mean_abs == A, exact
        a = 1000
        samples = [a if i % 8 < 4 else -a for i in range(16000)]
        blob = encode_wav(16000, 1, 16, samples)
        assert audio_features(blob) == (16000, 1, 16, 16000, 1000, a, a)

    def test_metadata_chunks_skipped(self):
        # LIST chunk between fmt and data must be walked over
        blob = bytearray(encode_wav(8000, 1, 16, [5, -5, 5, -5]))
        fmt_end = blob.index(b"data")
        lst = b"LIST" + struct.pack("<I", 6) + b"INFOab"
        spliced = bytes(blob[:fmt_end]) + lst + bytes(blob[fmt_end:])
        spliced = (
            spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
        )
        assert decode_wav(spliced)[3] == [5, -5, 5, -5]

    def test_trailing_partial_frame_dropped(self):
        blob = bytearray(encode_wav(8000, 2, 16, [1, 2, 3, 4]))
        # append 2 bytes (half a stereo frame) to the data chunk
        blob += b"\x09\x00"
        i = blob.index(b"data")
        (sz,) = struct.unpack_from("<I", blob, i + 4)
        struct.pack_into("<I", blob, i + 4, sz + 2)
        assert decode_wav(bytes(blob))[3] == [1, 2, 3, 4]

    def test_non_pcm_and_malformed_rejected(self):
        with pytest.raises(ValueError):
            decode_wav(b"RIFF\x00\x00\x00\x00WEBP")
        with pytest.raises(ValueError):
            decode_wav(b"")
        blob = bytearray(encode_wav(8000, 1, 16, [0] * 4))
        i = blob.index(b"fmt ")
        struct.pack_into("<H", blob, i + 8, 3)  # IEEE float format
        with pytest.raises(ValueError, match="non-PCM"):
            decode_wav(bytes(blob))
        struct.pack_into("<H", blob, i + 8, 0xFFFE)  # extensible
        with pytest.raises(ValueError, match="EXTENSIBLE"):
            decode_wav(bytes(blob))

    def test_wav_meta_header_only(self):
        blob = encode_wav(44100, 2, 24, [0, 0, 0, 0, 0, 0])
        assert wav_meta(blob) == ("wav", 44100, 2, 24)
        assert wav_meta(b"RIFF\x04\x00\x00\x00WEBP") is None
