"""MPEG-1 Layer III frame-header audit (ISO 11172-3 framing, public).

qm31 reads the ID3 tag envelope; this walks the actual AUDIO frames —
the gate that distinguishes a playable MP3 from renamed garbage, counts
real duration (tags lie; frames don't), and detects VBR (bitrate
varying across frames) without decoding a single sample.

Frame header (4 bytes, big-endian bit fields): 11-bit sync (0xFFE),
2-bit version, 2-bit layer, CRC flag, 4-bit bitrate index, 2-bit
sample-rate index, padding bit, remainder ignored here. Frame size for
Layer III = 144 * bitrate / samplerate + padding; each frame carries
1152 samples. Only MPEG-1 Layer III is inventoried (the dominant web
encoding) — other version/layer combinations flag ``nonstandard``.
An ID3v2 envelope at the front is skipped by its syncsafe length.
"""

from __future__ import annotations

_BITRATES_V1L3 = (  # kbps, index 1..14; 0 = free, 15 = bad
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1
)
_SAMPLERATES_V1 = (44100, 48000, 32000, -1)


def mp3_audit(data: bytes) -> dict:
    """Walk MP3 frames. Returns::

        {is_mp3, n_frames, is_vbr, bitrate_kbps, samplerate,
         duration_ms, truncated}

    ``bitrate_kbps`` is the FIRST frame's rate (the number players
    display for CBR); ``is_vbr`` flags any frame deviating from it.
    ``duration_ms`` = floor(n_frames * 1152 * 1000 / samplerate).
    ``truncated`` marks a final frame whose declared size runs past
    the buffer, or a sync loss mid-stream.
    """
    pos = 0
    n = len(data)
    # skip an ID3v2 envelope (syncsafe 28-bit size)
    if data[:3] == b"ID3" and n >= 10:
        size = (
            (data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7 | (data[9] & 0x7F)
        )
        pos = 10 + size
    none = {
        "is_mp3": 0, "n_frames": None, "is_vbr": None,
        "bitrate_kbps": None, "samplerate": None, "duration_ms": None,
        "truncated": None,
    }
    if pos + 4 > n or data[pos] != 0xFF or (data[pos + 1] & 0xE0) != 0xE0:
        return none
    version = (data[pos + 1] >> 3) & 3
    layer = (data[pos + 1] >> 1) & 3
    if version != 3 or layer != 1:  # only MPEG-1 Layer III inventoried
        return none
    first_kbps = None
    samplerate = None
    n_frames = 0
    is_vbr = 0
    truncated = 0
    while pos + 4 <= n:
        if data[pos] != 0xFF or (data[pos + 1] & 0xE0) != 0xE0:
            truncated = 1  # sync loss mid-stream
            break
        br_idx = (data[pos + 2] >> 4) & 0x0F
        sr_idx = (data[pos + 2] >> 2) & 0x03
        kbps = _BITRATES_V1L3[br_idx]
        sr = _SAMPLERATES_V1[sr_idx]
        if kbps <= 0 or sr <= 0:
            truncated = 1
            break
        padding = (data[pos + 2] >> 1) & 1
        frame_len = (144 * kbps * 1000) // sr + padding
        if pos + frame_len > n:
            truncated = 1
            break
        if first_kbps is None:
            first_kbps, samplerate = kbps, sr
        elif kbps != first_kbps:
            is_vbr = 1
        n_frames += 1
        pos += frame_len
    if n_frames == 0:
        return none
    return {
        "is_mp3": 1,
        "n_frames": n_frames,
        "is_vbr": is_vbr,
        "bitrate_kbps": first_kbps,
        "samplerate": samplerate,
        "duration_ms": (n_frames * 1152 * 1000) // samplerate,
        "truncated": truncated,
    }


def encode_mp3_frames(
    bitrates_kbps: list[int],
    samplerate: int = 44100,
    id3_size: int = 0,
) -> bytes:
    """Assemble syncable zero-payload frames (+ optional ID3v2 envelope)
    — the fixture writer the audit is certified against."""
    out = bytearray()
    if id3_size:
        out += b"ID3\x04\x00\x00" + bytes(
            [(id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F,
             (id3_size >> 7) & 0x7F, id3_size & 0x7F]
        )
        out += b"\x00" * id3_size
    sr_idx = _SAMPLERATES_V1.index(samplerate)
    for kbps in bitrates_kbps:
        br_idx = _BITRATES_V1L3.index(kbps)
        frame_len = (144 * kbps * 1000) // samplerate  # padding 0
        hdr = bytes(
            [0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00]
        )
        out += hdr + b"\x00" * (frame_len - 4)
    return bytes(out)
