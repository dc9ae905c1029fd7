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


# ---------------------------------------------------- compressed-audio meta
#
# Header-only routing meta for the crawl's compressed audio long tail —
# MP3 (MPEG-1/2 Layer III frame header + optional Xing/Info VBR tag,
# ID3v2 prefix skipped by its syncsafe size) and Ogg (Vorbis/Opus ident
# packet on the first page, duration from the LAST page's granule
# position). No entropy payload is ever decoded; the op reads the first
# frame/page and the tail page and routes everything else.

_MP3_BITRATE_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                     160, 192, 224, 256, 320, 0]
_MP3_BITRATE_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
                     96, 112, 128, 144, 160, 0]
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
              0: [11025, 12000, 8000]}


def _skip_id3v2(blob: bytes) -> int:
    if blob[:3] != b"ID3" or len(blob) < 10:
        return 0
    sz = ((blob[6] & 0x7F) << 21) | ((blob[7] & 0x7F) << 14) \
        | ((blob[8] & 0x7F) << 7) | (blob[9] & 0x7F)
    return 10 + sz


def mp3_meta(blob: bytes) -> dict:
    """First-frame MP3 header meta: version, bitrate, rate, channels,
    CBR duration estimate (exact integer ms via audio-byte count x 8000
    // bitrate-in-bps-derived), Xing/Info frame count when present.
    Raises ValueError when no Layer-III sync is found near the start."""
    blob = bytes(blob)
    off = _skip_id3v2(blob)
    end = min(len(blob) - 4, off + 4096)
    pos = -1
    for i in range(off, max(off, end) + 1):
        if i + 4 <= len(blob) and blob[i] == 0xFF and (blob[i + 1] & 0xE0) == 0xE0:
            pos = i
            break
    if pos < 0:
        raise ValueError("no MPEG audio sync")
    b1, b2, b3 = blob[pos + 1], blob[pos + 2], blob[pos + 3]
    ver = (b1 >> 3) & 3          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (b1 >> 1) & 3        # 1 = Layer III
    if ver == 1 or layer != 1:
        raise ValueError("not MPEG Layer III")
    table = _MP3_BITRATE_V1L3 if ver == 3 else _MP3_BITRATE_V2L3
    bitrate = table[(b2 >> 4) & 0xF]          # kbit/s
    rate = _MP3_RATES[ver][(b2 >> 2) & 3] if ((b2 >> 2) & 3) < 3 else 0
    if not bitrate or not rate:
        raise ValueError("free-format/invalid MP3 header")
    channels = 1 if ((b3 >> 6) & 3) == 3 else 2
    spf = 1152 if ver == 3 else 576           # samples per frame, Layer III
    # Xing/Info tag (VBR): frame count lives in the first frame's body
    side = (17 if channels == 1 else 32) if ver == 3 else (9 if channels == 1 else 17)
    tag_off = pos + 4 + side
    frames = 0
    if blob[tag_off : tag_off + 4] in (b"Xing", b"Info") and \
            len(blob) >= tag_off + 12 and (blob[tag_off + 7] & 1):
        frames = struct.unpack_from(">I", blob, tag_off + 8)[0]
    if frames:
        duration_ms = frames * spf * 1000 // rate
    else:
        duration_ms = (len(blob) - pos) * 8 // bitrate  # CBR: bytes*8/kbps = ms
    return {
        "codec": "mp3",
        "mpeg_version": {3: 1, 2: 2, 0: 25}[ver],
        "bitrate_kbps": bitrate,
        "sample_rate": rate,
        "channels": channels,
        "duration_ms": int(duration_ms),
    }


def ogg_meta(blob: bytes) -> dict:
    """Ogg container meta: ident packet on page 0 (Vorbis or Opus),
    duration from the last page's granule position. Header-only — no
    entropy payload decoded. Raises ValueError on non-Ogg input."""
    blob = bytes(blob)
    if blob[:4] != b"OggS" or len(blob) < 28:
        raise ValueError("not an Ogg stream")
    nseg = blob[26]
    body0 = 27 + nseg
    ident = blob[body0 : body0 + 64]
    if ident[:8] == b"OpusHead":
        codec = "opus"
        channels = ident[9]
        rate = 48000  # Opus always plays at 48 kHz; granule is 48 kHz ticks
        pre_skip = struct.unpack_from("<H", ident, 10)[0]
    elif ident[:7] == b"\x01vorbis":
        codec = "vorbis"
        channels = ident[11]
        rate = struct.unpack_from("<I", ident, 12)[0]
        pre_skip = 0
    else:
        raise ValueError("unknown Ogg codec")
    if not rate:
        raise ValueError("zero sample rate")
    # last page's granule position: scan the tail window for final OggS
    tail_start = max(0, len(blob) - 65536)
    last = blob.rfind(b"OggS")
    granule = 0
    while last >= tail_start and last >= 0:
        if last + 14 <= len(blob):
            g = struct.unpack_from("<q", blob, last + 6)[0]
            if g >= 0:
                granule = g
                break
        last = blob.rfind(b"OggS", 0, last)
    duration_ms = max(0, granule - pre_skip) * 1000 // rate
    return {
        "codec": codec,
        "channels": int(channels),
        "sample_rate": int(rate),
        "duration_ms": int(duration_ms),
    }


def flac_meta(blob: bytes) -> dict:
    """FLAC STREAMINFO meta, header-only: walk the metadata-block chain
    (1-byte is-last/type header + 24-bit big-endian length) to the
    type-0 STREAMINFO block and unpack its packed bitfields — 20-bit
    sample rate, 3-bit channels-1, 5-bit bps-1, 36-bit total samples.
    No frame/entropy bytes are ever read; duration is exact integer ms
    (0 when the encoder left total-samples unknown). Block walk is
    bomb-capped. Raises ValueError on non-FLAC or truncated input."""
    blob = bytes(blob)
    if blob[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    for _ in range(64):  # block-count bomb cap
        if pos + 4 > len(blob):
            raise ValueError("truncated FLAC metadata chain")
        hdr = blob[pos]
        btype = hdr & 0x7F
        blen = int.from_bytes(blob[pos + 1 : pos + 4], "big")
        if btype == 0:
            s = blob[pos + 4 : pos + 4 + 34]
            if blen < 34 or len(s) < 34:
                raise ValueError("truncated STREAMINFO")
            rate = (s[10] << 12) | (s[11] << 4) | (s[12] >> 4)
            channels = ((s[12] >> 1) & 7) + 1
            bps = (((s[12] & 1) << 4) | (s[13] >> 4)) + 1
            total = ((s[13] & 0xF) << 32) | int.from_bytes(s[14:18], "big")
            if not rate:
                raise ValueError("zero FLAC sample rate")
            return {
                "codec": "flac",
                "channels": int(channels),
                "sample_rate": int(rate),
                "bits_per_sample": int(bps),
                "total_samples": int(total),
                "duration_ms": int(total * 1000 // rate),
            }
        if hdr & 0x80:
            break
        pos += 4 + blen
    raise ValueError("no STREAMINFO block")


def audio_meta(blob: bytes) -> dict:
    """Route a blob across the audio-container families:
    wav | flac | mp3 | opus | vorbis | unknown — uniform meta shape."""
    out = {"codec": "unknown", "channels": 0, "sample_rate": 0,
           "bitrate_kbps": 0, "duration_ms": 0}
    m = wav_meta(blob)
    if m is not None:
        _fmt, rate, ch, _bits = m
        out.update(codec="wav", channels=ch, sample_rate=rate)
        return out
    try:
        m = flac_meta(blob)
        out.update(codec="flac", channels=m["channels"],
                   sample_rate=m["sample_rate"],
                   duration_ms=m["duration_ms"])
        return out
    except (ValueError, IndexError):
        pass
    try:
        m = mp3_meta(blob)
        out.update(codec="mp3", channels=m["channels"],
                   sample_rate=m["sample_rate"],
                   bitrate_kbps=m["bitrate_kbps"],
                   duration_ms=m["duration_ms"])
        return out
    except (ValueError, IndexError):
        pass
    try:
        m = ogg_meta(blob)
        out.update(codec=m["codec"], channels=m["channels"],
                   sample_rate=m["sample_rate"],
                   duration_ms=m["duration_ms"])
        return out
    except (ValueError, IndexError):
        pass
    return out


# ------------------------------------------------- compressed-audio fixtures


def encode_mp3_skeleton(ver: int, bitrate_kbps: int, rate: int,
                        channels: int, n_frames: int,
                        xing: bool = False, id3: bool = False) -> bytes:
    """Honest MP3 frame stream: real sync headers with the real
    bitrate/rate index fields and spec frame sizes (payload zeros — the
    meta op never reads entropy bytes), optional Xing tag in frame 0,
    optional ID3v2 prefix."""
    vbits = {1: 3, 2: 2, 25: 0}[ver]
    table = _MP3_BITRATE_V1L3 if ver == 1 else _MP3_BITRATE_V2L3
    bidx = table.index(bitrate_kbps)
    ridx = _MP3_RATES[vbits].index(rate)
    spf = 1152 if ver == 1 else 576
    frame_len = spf // 8 * bitrate_kbps * 1000 // rate  # padding bit 0
    hdr = bytes([
        0xFF,
        0xE0 | (vbits << 3) | (1 << 1),           # layer III
        (bidx << 4) | (ridx << 2),
        0xC0 if channels == 1 else 0x00,          # mono vs stereo
    ])
    frame = bytearray(hdr + b"\x00" * (frame_len - 4))
    if xing:
        side = (17 if channels == 1 else 32) if ver == 1 else \
            (9 if channels == 1 else 17)
        frame[4 + side : 4 + side + 4] = b"Xing"
        frame[4 + side + 4 : 4 + side + 8] = struct.pack(">I", 1)  # flags: frames
        frame[4 + side + 8 : 4 + side + 12] = struct.pack(">I", n_frames)
    out = bytes(frame) * n_frames
    if id3:
        tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 32]) + b"\x00" * 32
        out = tag + out
    return out


def _ogg_page(serial: int, seq: int, granule: int, packet: bytes,
              flags: int = 0) -> bytes:
    segs = []
    rem = len(packet)
    while rem >= 255:
        segs.append(255)
        rem -= 255
    segs.append(rem)
    head = struct.pack("<4sBBqIIIB", b"OggS", 0, flags, granule,
                       serial, seq, 0, len(segs)) + bytes(segs)
    return head + packet


def encode_ogg_skeleton(codec: str, channels: int, rate: int,
                        total_samples: int, pre_skip: int = 0) -> bytes:
    """Honest Ogg stream: real page headers + real ident packet; one
    data page carrying the final granule position."""
    if codec == "opus":
        ident = b"OpusHead" + bytes([1, channels]) + \
            struct.pack("<HIhB", pre_skip, rate, 0, 0)
        granule = total_samples + pre_skip
    else:
        ident = b"\x01vorbis" + struct.pack(
            "<IBIiiiB", 0, channels, rate, 0, 0, 0, 1)
        granule = total_samples
    return (_ogg_page(1, 0, 0, ident, flags=2)
            + _ogg_page(1, 1, granule, b"\x00" * 32, flags=4))


def encode_flac_skeleton(
    rate: int,
    channels: int,
    bps: int,
    total_samples: int,
    padding: int = 0,
    vendor: bytes = b"",
) -> bytes:
    """Honest FLAC metadata skeleton: real `fLaC` magic, a real 34-byte
    STREAMINFO with the spec's packed bitfields (20-bit rate, 3-bit
    channels-1, 5-bit bps-1, 36-bit total), then optional PADDING and
    VORBIS_COMMENT blocks with genuine lengths so the block walk is
    exercised on real structures. meta never reads frame bytes, so the
    skeleton ends at the last metadata block."""
    assert 1 <= channels <= 8 and 4 <= bps <= 32 and rate < (1 << 20)
    assert total_samples < (1 << 36)
    si = bytearray()
    si += (4096).to_bytes(2, "big") * 2          # min/max block size
    si += (0).to_bytes(3, "big") * 2             # min/max frame size unknown
    si.append((rate >> 12) & 0xFF)
    si.append((rate >> 4) & 0xFF)
    si.append(((rate & 0xF) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4))
    si.append((((bps - 1) & 0xF) << 4) | ((total_samples >> 32) & 0xF))
    si += (total_samples & 0xFFFFFFFF).to_bytes(4, "big")
    si += b"\x00" * 16                           # MD5 of unencoded audio
    blocks = [(0, bytes(si))]
    if vendor:
        vc = len(vendor).to_bytes(4, "little") + vendor \
            + (0).to_bytes(4, "little")          # zero user comments
        blocks.append((4, vc))
    if padding:
        blocks.append((1, b"\x00" * padding))
    out = bytearray(b"fLaC")
    for i, (btype, body) in enumerate(blocks):
        last = 0x80 if i == len(blocks) - 1 else 0
        out.append(last | btype)
        out += len(body).to_bytes(3, "big")
        out += body
    return bytes(out)


# ------------------------------------------------------------- ID3v2 frames
#
# The audio corpus's provenance tier (EXIF's music twin): title/artist/
# album/year from ID3v2 text frames. v2.3 and v2.4 differ in exactly the
# trap spot — frame sizes are plain big-endian in v2.3 but SYNCSAFE in
# v2.4 — and text frames carry their own encoding byte (latin-1, utf-16
# with BOM, utf-8). Header/frame walk only; audio frames never touched.

_ID3_TEXT_KEYS = {b"TIT2": "title", b"TPE1": "artist",
                  b"TALB": "album", b"TDRC": "year", b"TYER": "year"}


def _syncsafe(b: bytes) -> int:
    return ((b[0] & 0x7F) << 21) | ((b[1] & 0x7F) << 14) \
        | ((b[2] & 0x7F) << 7) | (b[3] & 0x7F)


def _id3_text(payload: bytes) -> str | None:
    if not payload:
        return None
    enc = payload[0]
    body = payload[1:].split(b"\x00\x00" if enc in (1, 2) else b"\x00", 1)[0]
    try:
        if enc == 0:
            s = body.decode("latin-1")
        elif enc == 1:
            s = body.decode("utf-16")        # BOM-led per spec
        elif enc == 2:
            s = body.decode("utf-16-be")
        elif enc == 3:
            s = body.decode("utf-8")
        else:
            return None
    except UnicodeDecodeError:
        return None
    return s.strip() or None


def id3_tags(blob: bytes) -> dict:
    """``{has_id3, version, title, artist, album, year}`` from an ID3v2
    prefix — v2.3 (plain big-endian frame sizes) and v2.4 (syncsafe)
    both handled; absent/malformed -> has_id3=0 (routing)."""
    blob = bytes(blob)
    none = {"has_id3": 0, "version": 0, "title": None, "artist": None,
            "album": None, "year": None}
    if blob[:3] != b"ID3" or len(blob) < 10:
        return dict(none)
    version = blob[3]
    if version not in (3, 4):
        return dict(none)
    tag_end = min(10 + _syncsafe(blob[6:10]), len(blob))
    out = dict(none, has_id3=1, version=version)
    pos = 10
    for _ in range(256):  # frame-count bomb cap
        if pos + 10 > tag_end:
            break
        fid = blob[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        raw_sz = blob[pos + 4 : pos + 8]
        sz = _syncsafe(raw_sz) if version == 4 else int.from_bytes(raw_sz, "big")
        if sz < 0 or pos + 10 + sz > tag_end:
            break
        key = _ID3_TEXT_KEYS.get(fid)
        if key is not None and out[key] is None:
            out[key] = _id3_text(blob[pos + 10 : pos + 10 + sz])
        pos += 10 + sz
    return out


def encode_id3v2(
    version: int,
    title: str | None = None,
    artist: str | None = None,
    album: str | None = None,
    year: str | None = None,
    encoding: int = 0,
    padding: int = 16,
) -> bytes:
    """Honest ID3v2 tag writer: real syncsafe tag size, real frame
    headers with version-correct size encoding (plain BE for v2.3,
    syncsafe for v2.4), text frames in latin-1 (0), utf-16+BOM (1) or
    utf-8 (3)."""
    assert version in (3, 4) and encoding in (0, 1, 3)
    frames = bytearray()
    fields = [(b"TIT2", title), (b"TPE1", artist), (b"TALB", album),
              (b"TDRC" if version == 4 else b"TYER", year)]
    for fid, val in fields:
        if val is None:
            continue
        if encoding == 0:
            body = bytes([0]) + val.encode("latin-1")
        elif encoding == 1:
            body = bytes([1]) + "﻿".encode("utf-16-be")[:0] + val.encode("utf-16")
        else:
            body = bytes([3]) + val.encode("utf-8")
        sz = len(body)
        raw_sz = (
            bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                   (sz >> 7) & 0x7F, sz & 0x7F])
            if version == 4 else sz.to_bytes(4, "big")
        )
        frames += fid + raw_sz + b"\x00\x00" + body
    frames += b"\x00" * padding
    n = len(frames)
    hdr = b"ID3" + bytes([version, 0, 0,
                          (n >> 21) & 0x7F, (n >> 14) & 0x7F,
                          (n >> 7) & 0x7F, n & 0x7F])
    return hdr + bytes(frames)
