"""Real audio decode: RIFF/WAVE PCM (the crawl corpus's dominant
uncompressed audio container). Pure struct-level parsing — 8-bit
unsigned, 16/24/32-bit signed little-endian integer PCM, mono or
multi-channel, chunk walk tolerant of LIST/fact/cue metadata between
fmt and data. Compressed codecs (MP3/AAC/Vorbis frames, IEEE-float or
ADPCM WAVE) raise ValueError and route to the native-backend tier, the
same split the image decoders use (imaging.py). The reference engine
has no audio surface at all; this tier exists for the multimodal
training-data pipeline (SURVEY §2.4c).

Features are integer-exact so DuckDB oracles can pin them: peak and
mean-absolute amplitude are computed in the raw integer sample domain,
duration by exact floor division.
"""

from __future__ import annotations

import struct

MAX_SAMPLES = 64 * 1024 * 1024  # decoded-sample cap (bomb guard)


def decode_wav(blob: bytes) -> tuple[int, int, int, list[int]]:
    """WAVE bytes -> ``(sample_rate, channels, bits, samples)`` where
    samples is the interleaved signed-integer sample sequence (8-bit
    unsigned is recentred to signed). Raises ValueError on non-PCM or
    malformed input."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAVE file")
    n = len(blob)
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= n:
        tag = blob[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + sz]
        if tag == b"fmt ":
            if sz < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
            if fmt is not None:
                break  # fmt precedes data in well-formed files
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, block_align, bits = fmt
    if audio_format == 0xFFFE and len(blob) >= 0:  # WAVE_FORMAT_EXTENSIBLE
        # SubFormat GUID's first two bytes carry the real format tag
        raise ValueError("WAVE_FORMAT_EXTENSIBLE unsupported")
    if audio_format != 1:
        raise ValueError(f"non-PCM WAVE format {audio_format} unsupported")
    if channels < 1 or rate < 1 or bits not in (8, 16, 24, 32):
        raise ValueError("bad PCM parameters")
    bytes_per = bits // 8
    if block_align and block_align != bytes_per * channels:
        raise ValueError("block alignment mismatch")
    count = len(data) // bytes_per
    if count > MAX_SAMPLES:
        raise ValueError("audio too large")
    samples: list[int]
    if bits == 8:
        samples = [b - 128 for b in data[:count]]
    elif bits == 16:
        samples = list(
            struct.unpack_from(f"<{count}h", data, 0)
        )
    elif bits == 32:
        samples = list(struct.unpack_from(f"<{count}i", data, 0))
    else:  # 24-bit packed little-endian
        samples = []
        for i in range(count):
            v = int.from_bytes(data[3 * i : 3 * i + 3], "little")
            samples.append(v - (1 << 24) if v & 0x800000 else v)
    # drop a trailing partial frame rather than misalign channels
    frames = len(samples) // channels
    return rate, channels, bits, samples[: frames * channels]


def encode_wav(
    rate: int, channels: int, bits: int, samples: list[int]
) -> bytes:
    """Minimal PCM WAVE writer (fixture helper — the inverse of
    :func:`decode_wav`). ``samples`` are interleaved signed ints (8-bit
    accepts the signed -128..127 range and stores unsigned)."""
    if bits not in (8, 16, 24, 32):
        raise ValueError("bits must be 8/16/24/32")
    bytes_per = bits // 8
    if bits == 8:
        data = bytes((s + 128) & 0xFF for s in samples)
    elif bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 32:
        data = struct.pack(f"<{len(samples)}i", *samples)
    else:
        data = b"".join(
            (s & 0xFFFFFF).to_bytes(3, "little") for s in samples
        )
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * bytes_per * channels,
        bytes_per * channels, bits,
    )
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_features(blob: bytes) -> tuple[int, int, int, int, int, int, int]:
    """``(sample_rate, channels, bits, n_frames, duration_ms, peak,
    mean_abs)`` — integer-exact over the raw sample domain (peak and
    mean-abs are the clipping/loudness gates a corpus filter runs)."""
    rate, channels, bits, samples = decode_wav(blob)
    frames = len(samples) // channels
    peak = max((abs(s) for s in samples), default=0)
    mean_abs = sum(abs(s) for s in samples) // len(samples) if samples else 0
    return (
        rate, channels, bits, frames, frames * 1000 // rate, peak, mean_abs
    )


def wav_meta(blob: bytes) -> tuple[str, int, int, int] | None:
    """Header-only WAVE metadata ``("wav", sample_rate, channels, bits)``
    without touching sample data — the inventory-tier twin of
    imaging.image_meta."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    pos = 12
    n = len(blob)
    while pos + 8 <= n:
        tag = blob[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", blob, pos + 4)
        if tag == b"fmt " and sz >= 16 and pos + 24 <= n:
            _f, ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", blob, pos + 8
            )
            return ("wav", rate, ch, bits)
        pos += 8 + sz + (sz & 1)
    return None
