"""Header-only video-container metadata (ISO-BMFF / MP4 family).

The video twin of ``imaging.image_meta`` / ``audio.wav_meta``: at 10^12
crawl blobs the decode tier is gated by a routing op that reads ~1 KB of
container structure and NO codec payload — brand, duration, dimensions,
track inventory — so transcode/sample/feature work lands only where the
container says there is anything to do.

ISO base media file format (ISO/IEC 14496-12, public spec) box walk:

- top level: ``ftyp`` (major brand), ``moov`` (metadata), ``mdat`` (payload,
  skipped by declared size — never read)
- ``moov`` -> ``mvhd`` (movie timescale + duration -> duration_ms)
- ``moov`` -> ``trak`` -> ``tkhd`` (16.16 fixed-point presentation size)
  and ``trak`` -> ``mdia`` -> ``hdlr`` (handler: ``vide``/``soun``/...)

Version 0 (32-bit) and version 1 (64-bit) mvhd/tkhd are both handled, as
is the ``size == 1`` largesize escape and ``size == 0`` to-end-of-file.
Truncated/malformed boxes end the walk with whatever was parsed (routing
decision, not an error); a buffer with no ftyp/moov signature raises
``ValueError`` so the dispatcher can route it elsewhere.

The fixture writer ``encode_mp4_skeleton`` emits honest box structure
(real sizes, real fixed-point fields, an mdat placeholder) so tests and
the qm20 oracle run on genuine bitstreams, mirroring the image/audio
fixture writers (no hand-waved blobs).

Reference parity note: the reference engine (someone13574/pdf) has no
media-container surface at all — this tier is net-new, like the E126+
image formats.
"""

from __future__ import annotations

import struct

__all__ = [
    "mp4_meta", "encode_mp4_skeleton", "heif_meta", "encode_heif_skeleton",
]

_MAX_BOXES = 4096
_MAX_DEPTH = 8

# Containers we descend into (only the spine the meta needs).
_DESCEND = {b"moov", b"trak", b"mdia"}


def _u32(buf: bytes, off: int) -> int:
    return struct.unpack_from(">I", buf, off)[0]


def _u64(buf: bytes, off: int) -> int:
    return struct.unpack_from(">Q", buf, off)[0]


def _iter_boxes(buf: bytes, start: int, end: int, depth: int, state: dict):
    """Yield (type, payload_start, payload_end) for boxes in [start, end)."""
    off = start
    while off + 8 <= end and state["boxes"] < _MAX_BOXES:
        size = _u32(buf, off)
        btype = buf[off + 4 : off + 8]
        head = 8
        if size == 1:
            if off + 16 > end:
                return
            size = _u64(buf, off + 8)
            head = 16
        elif size == 0:
            size = end - off
        if size < head:
            return  # malformed: stop this level, keep what we have
        if off + size > end:
            # truncated tail box: walk the bytes that exist, then stop —
            # a cut-off moov still yields its parsed prefix (routing meta,
            # not an error)
            state["boxes"] += 1
            yield btype, off + head, end, depth
            return
        state["boxes"] += 1
        yield btype, off + head, off + size, depth
        off += size


def _walk(buf: bytes, start: int, end: int, depth: int, state: dict) -> None:
    if depth > _MAX_DEPTH:
        return
    trak_ctx = None
    for btype, p0, p1, _d in _iter_boxes(buf, start, end, depth, state):
        if btype == b"ftyp" and p1 - p0 >= 4:
            state.setdefault("brand", buf[p0 : p0 + 4].decode("latin-1").strip())
        elif btype == b"mvhd" and p1 - p0 >= 20:
            ver = buf[p0]
            if ver == 1 and p1 - p0 >= 28:
                ts, dur = _u32(buf, p0 + 20), _u64(buf, p0 + 24)
            else:
                ts, dur = _u32(buf, p0 + 12), _u32(buf, p0 + 16)
            if ts:
                state["duration_ms"] = dur * 1000 // ts
        elif btype == b"trak":
            trak_ctx = {"w": 0, "h": 0, "handler": b""}
            state["_trak"] = trak_ctx
            _walk(buf, p0, p1, depth + 1, state)
            t = state.pop("_trak")
            h = t["handler"]
            if h == b"vide":
                state["n_video"] += 1
                if t["w"] * t["h"] > state["width"] * state["height"]:
                    state["width"], state["height"] = t["w"], t["h"]
            elif h == b"soun":
                state["n_audio"] += 1
        elif btype == b"tkhd" and "_trak" in state:
            ver = buf[p0]
            # width/height are the LAST two u32s of the fixed-layout box:
            # v0 payload = 84 bytes, v1 = 96 bytes (16.16 fixed point).
            need = 96 if ver == 1 else 84
            if p1 - p0 >= need:
                state["_trak"]["w"] = _u32(buf, p0 + need - 8) >> 16
                state["_trak"]["h"] = _u32(buf, p0 + need - 4) >> 16
        elif btype == b"hdlr" and "_trak" in state and p1 - p0 >= 12:
            state["_trak"]["handler"] = buf[p0 + 8 : p0 + 12]
        elif btype in _DESCEND:
            _walk(buf, p0, p1, depth + 1, state)


def mp4_meta(buf: bytes) -> dict:
    """Parse ISO-BMFF structure from header bytes; no codec payload read.

    Returns dict(brand, duration_ms, width, height, n_video, n_audio).
    Raises ValueError when the buffer is not ISO-BMFF (routing signal).
    """
    buf = bytes(buf)
    if len(buf) < 12 or buf[4:8] not in (
        b"ftyp",
        b"moov",
        b"mdat",
        b"free",
        b"skip",
        b"wide",
    ):
        raise ValueError("not an ISO-BMFF container")
    state = {
        "boxes": 0,
        "duration_ms": 0,
        "width": 0,
        "height": 0,
        "n_video": 0,
        "n_audio": 0,
    }
    _walk(buf, 0, len(buf), 0, state)
    return {
        "brand": state.get("brand", ""),
        "duration_ms": int(state["duration_ms"]),
        "width": int(state["width"]),
        "height": int(state["height"]),
        "n_video": int(state["n_video"]),
        "n_audio": int(state["n_audio"]),
    }


# ---------------------------------------------------------------- fixtures


def _box(btype: bytes, payload: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return struct.pack(">I4sQ", 1, btype, 16 + len(payload)) + payload
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _mvhd(timescale: int, duration: int, version: int) -> bytes:
    if version == 1:
        body = struct.pack(">BxxxQQIQ", 1, 0, 0, timescale, duration)
    else:
        body = struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration)
    # rate, volume+reserved, matrix (identity), predefined, next_track_id
    body += struct.pack(">i", 0x00010000) + struct.pack(">hH", 0x0100, 0)
    body += struct.pack(">2I", 0, 0)
    body += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    body += b"\x00" * 24 + struct.pack(">I", 2)
    return _box(b"mvhd", body)


def _tkhd(track_id: int, duration: int, w: int, h: int, version: int) -> bytes:
    if version == 1:
        body = struct.pack(">BxxxQQIIQ", 1, 0, 0, track_id, 0, duration)
    else:
        body = struct.pack(">BxxxIIIII", 0, 0, 0, track_id, 0, duration)
    body += struct.pack(">2I", 0, 0) + struct.pack(">hhhH", 0, 0, 0, 0)
    body += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    body += struct.pack(">II", w << 16, h << 16)
    return _box(b"tkhd", body)


def _hdlr(handler: bytes) -> bytes:
    return _box(b"hdlr", struct.pack(">Bxxx4s4s12x", 0, b"\0\0\0\0", handler) + b"\x00")


def _mdhd(timescale: int, duration: int) -> bytes:
    body = struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration)
    body += struct.pack(">HH", 0x55C4, 0)  # language 'und', predefined
    return _box(b"mdhd", body)


def encode_mp4_skeleton(
    major_brand: str,
    timescale: int,
    duration: int,
    tracks: list,
    mvhd_version: int = 0,
    largesize_mdat: bool = False,
    sample_tables: list | None = None,
) -> bytes:
    """Emit an honest ISO-BMFF skeleton: ftyp + moov(mvhd, trak...) + mdat.

    ``tracks`` is a list of (handler_str, width, height) — e.g.
    ("vide", 640, 360) or ("soun", 0, 0). Box sizes, fixed-point fields
    and version layouts are real; the mdat payload is a placeholder.
    ``sample_tables`` optionally aligns with ``tracks``: None, or
    ``(stts_entries, stss_samples_or_None)`` to emit a real
    minf/stbl/stts (+stss) chain for that track.
    """
    brand = major_brand.encode("latin-1").ljust(4)[:4]
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mp41")
    kids = [_mvhd(timescale, duration, mvhd_version)]
    for i, (handler, w, h) in enumerate(tracks):
        stbl_bytes = b""
        st = sample_tables[i] if sample_tables else None
        if st is not None:
            stts_entries, stss_samples = st
            inner = _stts(stts_entries)
            if stss_samples is not None:
                inner += _stss(stss_samples)
            stbl_bytes = _box(b"minf", _box(b"stbl", inner))
        mdia = _box(
            b"mdia",
            _mdhd(timescale, duration)
            + _hdlr(handler.encode("latin-1"))
            + stbl_bytes,
        )
        kids.append(
            _box(
                b"trak",
                _tkhd(i + 1, duration, w, h, mvhd_version) + mdia,
            )
        )
    moov = _box(b"moov", b"".join(kids))
    mdat = _box(b"mdat", b"\x00" * 16, largesize=largesize_mdat)
    return ftyp + moov + mdat




# ------------------------------------------------- sample tables (stbl tier)
#
# The frame-sample tier's shopping list: how many samples a video track
# has, which are keyframes (sync samples), and the media-timescale
# duration — read from the stbl sample tables (stts/stss) without
# touching one codec byte. An absent stss means EVERY sample is a sync
# sample per ISO 14496-12 (intra-only streams), and the keyframe list
# is what a distributed frame sampler actually seeks to.

_STBL_DESCEND = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _stbl_walk(buf: bytes, start: int, end: int, depth: int, state: dict) -> None:
    if depth > _MAX_DEPTH:
        return
    for btype, p0, p1, _d in _iter_boxes(buf, start, end, depth, state):
        if btype == b"trak":
            state["_trak"] = {"handler": b"", "timescale": 0,
                              "stts": None, "stss": None, "has_stss": False}
            _stbl_walk(buf, p0, p1, depth + 1, state)
            t = state.pop("_trak")
            if t["handler"] == b"vide" and "video" not in state:
                state["video"] = t
        elif btype == b"mdhd" and "_trak" in state and p1 - p0 >= 20:
            ver = buf[p0]
            state["_trak"]["timescale"] = (
                _u32(buf, p0 + 20) if ver == 1 else _u32(buf, p0 + 12)
            )
        elif btype == b"hdlr" and "_trak" in state and p1 - p0 >= 12:
            state["_trak"]["handler"] = buf[p0 + 8 : p0 + 12]
        elif btype == b"stts" and "_trak" in state and p1 - p0 >= 8:
            n = min(_u32(buf, p0 + 4), (p1 - p0 - 8) // 8, 1 << 16)
            state["_trak"]["stts"] = [
                (_u32(buf, p0 + 8 + 8 * i), _u32(buf, p0 + 12 + 8 * i))
                for i in range(n)
            ]
        elif btype == b"stss" and "_trak" in state and p1 - p0 >= 8:
            n = min(_u32(buf, p0 + 4), (p1 - p0 - 8) // 4, 1 << 16)
            state["_trak"]["has_stss"] = True
            state["_trak"]["stss"] = [
                _u32(buf, p0 + 8 + 4 * i) for i in range(n)
            ]
        elif btype in _STBL_DESCEND:
            _stbl_walk(buf, p0, p1, depth + 1, state)


def mp4_sample_table(buf: bytes) -> dict:
    """Video-track sample inventory from the stbl tables: ``n_samples``
    and media duration from stts runs, keyframe count/first/last from
    stss (absent stss = every sample is sync per §8.6.2). Raises
    ValueError on non-BMFF; a BMFF file without a video track or sample
    tables returns zeros (routing decision)."""
    buf = bytes(buf)
    if len(buf) < 12 or buf[4:8] not in (
        b"ftyp", b"moov", b"mdat", b"free", b"skip", b"wide",
    ):
        raise ValueError("not an ISO-BMFF container")
    state: dict = {"boxes": 0}
    _stbl_walk(buf, 0, len(buf), 0, state)
    t = state.get("video")
    none = {"n_samples": 0, "n_keyframes": 0, "media_duration_ms": 0,
            "first_keyframe": 0, "last_keyframe": 0}
    if not t or not t["stts"]:
        return none
    n_samples = sum(c for c, _ in t["stts"])
    ticks = sum(c * d for c, d in t["stts"])
    ts = t["timescale"]
    if t["has_stss"]:
        ks = [k for k in (t["stss"] or []) if 1 <= k <= n_samples]
        n_key, first, last = len(ks), (ks[0] if ks else 0), (ks[-1] if ks else 0)
    else:  # no stss box: every sample is a sync sample
        n_key, first, last = n_samples, 1, n_samples
    return {
        "n_samples": int(n_samples),
        "n_keyframes": int(n_key),
        "media_duration_ms": int(ticks * 1000 // ts) if ts else 0,
        "first_keyframe": int(first),
        "last_keyframe": int(last),
    }


def _stts(entries: list) -> bytes:
    body = struct.pack(">II", 0, len(entries))
    for cnt, delta in entries:
        body += struct.pack(">II", cnt, delta)
    return _box(b"stts", body)


def _stss(samples: list) -> bytes:
    return _box(
        b"stss",
        struct.pack(">II", 0, len(samples))
        + b"".join(struct.pack(">I", s) for s in samples),
    )


# ------------------------------------------------------------- Matroska/WebM
#
# EBML walk (RFC 8794 + Matroska spec, both public): the crawl's second
# video container family. Same contract as mp4_meta — header/metadata
# elements only, no codec payload read, truncation tolerated, bombs capped.

_EBML_HEADER = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_DOCTYPE = 0x4282

_MKV_DESCEND = {_SEGMENT, _INFO, _TRACKS, _TRACK_ENTRY, _VIDEO, _EBML_HEADER}
_MAX_ELEMENTS = 4096


def _ebml_id(buf: bytes, off: int, end: int):
    """Element ID varint — marker bit KEPT (IDs compare with it)."""
    if off >= end:
        return None
    first = buf[off]
    if first == 0:
        return None
    n = 8 - first.bit_length()  # leading zeros -> n continuation bytes
    if off + 1 + n > end:
        return None
    val = first
    for i in range(n):
        val = (val << 8) | buf[off + 1 + i]
    return val, off + 1 + n


def _ebml_size(buf: bytes, off: int, end: int):
    """Data-size varint — marker bit STRIPPED; all-ones payload = unknown."""
    if off >= end:
        return None
    first = buf[off]
    if first == 0:
        return None
    n = 8 - first.bit_length()
    if off + 1 + n > end:
        return None
    val = first & ((1 << (7 - n)) - 1)
    ones = val == (1 << (7 - n)) - 1
    for i in range(n):
        b = buf[off + 1 + i]
        val = (val << 8) | b
        ones = ones and b == 0xFF
    return val, off + 1 + n, ones


def _uint(buf: bytes) -> int:
    v = 0
    for b in buf:
        v = (v << 8) | b
    return v


def _float(buf: bytes) -> float:
    if len(buf) == 4:
        return struct.unpack(">f", buf)[0]
    if len(buf) == 8:
        return struct.unpack(">d", buf)[0]
    return 0.0


def _mkv_walk(buf: bytes, start: int, end: int, depth: int, state: dict) -> None:
    if depth > _MAX_DEPTH:
        return
    off = start
    while off < end and state["elements"] < _MAX_ELEMENTS:
        got = _ebml_id(buf, off, end)
        if got is None:
            return
        eid, off2 = got
        got = _ebml_size(buf, off2, end)
        if got is None:
            return
        size, p0, unknown = got
        p1 = end if unknown else min(p0 + size, end)  # truncation-clamped
        state["elements"] += 1
        if eid == _TRACK_ENTRY:
            t = state["_trak"] = {"type": 0, "w": 0, "h": 0}
            _mkv_walk(buf, p0, p1, depth + 1, state)
            del state["_trak"]
            if t["type"] == 1:
                state["n_video"] += 1
                if t["w"] * t["h"] > state["width"] * state["height"]:
                    state["width"], state["height"] = t["w"], t["h"]
            elif t["type"] == 2:
                state["n_audio"] += 1
        elif eid in _MKV_DESCEND:
            _mkv_walk(buf, p0, p1, depth + 1, state)
        elif eid == _DOCTYPE:
            state["doc_type"] = buf[p0:p1].split(b"\x00")[0].decode("latin-1")
        elif eid == _TS_SCALE:
            state["ts_scale"] = _uint(buf[p0:p1])
        elif eid == _DURATION:
            state["duration_raw"] = _float(buf[p0:p1])
        elif eid == _TRACK_TYPE and "_trak" in state:
            state["_trak"]["type"] = _uint(buf[p0:p1])
        elif eid == _PIXEL_W and "_trak" in state:
            state["_trak"]["w"] = _uint(buf[p0:p1])
        elif eid == _PIXEL_H and "_trak" in state:
            state["_trak"]["h"] = _uint(buf[p0:p1])
        if unknown:
            return  # unknown-size master consumed the rest of this level
        off = p1


def mkv_meta(buf: bytes) -> dict:
    """Matroska/WebM metadata from the EBML spine; no codec payload read.

    Returns dict(doc_type, duration_ms, width, height, n_video, n_audio).
    Raises ValueError when the buffer is not EBML (routing signal).
    """
    buf = bytes(buf)
    if len(buf) < 8 or buf[:4] != b"\x1aE\xdf\xa3":
        raise ValueError("not an EBML container")
    state = {
        "elements": 0,
        "doc_type": "",
        "ts_scale": 1_000_000,  # Matroska default: 1 ms in ns
        "duration_raw": 0.0,
        "width": 0,
        "height": 0,
        "n_video": 0,
        "n_audio": 0,
    }
    _mkv_walk(buf, 0, len(buf), 0, state)
    return {
        "doc_type": state["doc_type"],
        "duration_ms": int(state["duration_raw"] * state["ts_scale"] // 1_000_000),
        "width": int(state["width"]),
        "height": int(state["height"]),
        "n_video": int(state["n_video"]),
        "n_audio": int(state["n_audio"]),
    }


def video_meta(buf: bytes) -> dict:
    """Route a blob to its container family: mp4 | webm | matroska | unknown."""
    try:
        m = mp4_meta(buf)
        m["format"] = "mp4"
        m.setdefault("doc_type", "")
        return m
    except ValueError:
        pass
    try:
        m = mkv_meta(buf)
        m["format"] = "webm" if m["doc_type"] == "webm" else "matroska"
        m["brand"] = ""
        return m
    except ValueError:
        pass
    return {
        "format": "unknown",
        "brand": "",
        "doc_type": "",
        "duration_ms": 0,
        "width": 0,
        "height": 0,
        "n_video": 0,
        "n_audio": 0,
    }


# ------------------------------------------------- Matroska fixture writer


def _ebml_encode_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _ebml_encode_size(size: int, unknown: bool = False) -> bytes:
    if unknown:
        return b"\xff"
    for n in range(1, 9):
        if size < (1 << (7 * n)) - 1:
            return ((1 << (7 * n)) | size).to_bytes(n, "big")
    raise ValueError("size too large")


def _elem(eid: int, payload: bytes, unknown: bool = False) -> bytes:
    return _ebml_encode_id(eid) + _ebml_encode_size(len(payload), unknown) + payload


def _uint_elem(eid: int, v: int) -> bytes:
    return _elem(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def encode_mkv_skeleton(
    doc_type: str,
    duration_ms: int,
    tracks: list,
    float32: bool = False,
    unknown_segment_size: bool = False,
) -> bytes:
    """Emit an honest EBML skeleton: header + Segment(Info, Tracks).

    ``tracks`` is a list of (type_str, width, height) with type_str in
    {"video", "audio"}. Duration is written as a real float element
    (float64 by default, float32 when ``float32`` — integers < 2^24 stay
    exact) against the default 1e6 TimestampScale.
    """
    header = _elem(
        _EBML_HEADER,
        _elem(_DOCTYPE, doc_type.encode("latin-1")),
    )
    dur = struct.pack(">f" if float32 else ">d", float(duration_ms))
    info = _elem(
        _INFO, _uint_elem(_TS_SCALE, 1_000_000) + _elem(_DURATION, dur)
    )
    entries = b""
    for kind, w, h in tracks:
        body = _uint_elem(_TRACK_TYPE, 1 if kind == "video" else 2)
        if kind == "video":
            body += _elem(_VIDEO, _uint_elem(_PIXEL_W, w) + _uint_elem(_PIXEL_H, h))
        entries += _elem(_TRACK_ENTRY, body)
    seg_payload = info + _elem(_TRACKS, entries)
    return header + _elem(_SEGMENT, seg_payload, unknown=unknown_segment_size)


# ------------------------------------------------- HEIF/AVIF image containers
#
# AVIF/HEIC are ISO-BMFF too (ISO/IEC 23008-12 image format on the
# 14496-12 box grammar) — modern crawls carry them where JPEG/PNG used
# to be. Routing meta only: brand, pixel dims from the ispe properties
# under meta->iprp->ipco, item count from iinf, animation flag from the
# sequence brands. No codec payload (AV1/HEVC OBUs) is ever read.

_HEIF_BRANDS = {b"avif", b"avis", b"heic", b"heix", b"mif1", b"msf1"}
_HEIF_SEQ_BRANDS = {b"avis", b"msf1"}


def heif_meta(buf: bytes) -> dict:
    """HEIF/AVIF routing metadata from header bytes.

    ``meta`` is a FULL box (4-byte version/flags before children) —
    the one grammar difference from the movie spine. Dims are the
    LARGEST ispe property (primary image; thumbnails are smaller
    ispes), ``n_items`` the iinf entry count, ``is_animated`` set for
    the sequence brands (avis/msf1). Raises ValueError for non-HEIF
    ISO-BMFF (qm20's mp4_meta owns those) and non-BMFF bytes alike,
    so the media router keeps a single dispatch rule."""
    buf = bytes(buf)
    if len(buf) < 16 or buf[4:8] != b"ftyp" or buf[8:12] not in _HEIF_BRANDS:
        raise ValueError("not a HEIF/AVIF container")
    state = {"boxes": 0}
    out = {
        "brand": buf[8:12].decode("latin-1"),
        "width": 0,
        "height": 0,
        "n_ispe": 0,
        "n_items": 0,
        "is_animated": int(buf[8:12] in _HEIF_SEQ_BRANDS),
    }

    def walk(start: int, end: int, depth: int) -> None:
        if depth > _MAX_DEPTH:
            return
        for btype, p0, p1, _d in _iter_boxes(buf, start, end, depth, state):
            if btype == b"meta" and p1 - p0 >= 4:
                walk(p0 + 4, p1, depth + 1)  # fullbox: skip version/flags
            elif btype in (b"iprp", b"ipco"):
                walk(p0, p1, depth + 1)
            elif btype == b"ispe" and p1 - p0 >= 12:
                w, h = _u32(buf, p0 + 4), _u32(buf, p0 + 8)
                out["n_ispe"] += 1
                if w * h > out["width"] * out["height"]:
                    out["width"], out["height"] = w, h
            elif btype == b"iinf" and p1 - p0 >= 6:
                ver = buf[p0]
                out["n_items"] = (
                    _u32(buf, p0 + 4) if ver >= 1 and p1 - p0 >= 8
                    else struct.unpack_from(">H", buf, p0 + 4)[0]
                )

    walk(0, len(buf), 0)
    return out


def encode_heif_skeleton(
    brand: bytes,
    dims: list[tuple[int, int]],
    n_items: int,
) -> bytes:
    """Honest HEIF/AVIF box skeleton: real ftyp, a real fullbox meta
    with hdlr(pict)/pitm/iinf and an iprp/ipco chain carrying one ispe
    per (w, h) — the exact spine heif_meta walks."""
    ipco = b"".join(
        _box(b"ispe", struct.pack(">III", 0, w, h)) for w, h in dims
    )
    meta_children = (
        _box(b"hdlr", struct.pack(">I", 0) + b"\0\0\0\0pict" + bytes(12))
        + _box(b"pitm", struct.pack(">IH", 0, 1))
        + _box(b"iinf", struct.pack(">IH", 0, n_items))
        + _box(b"iprp", _box(b"ipco", ipco))
    )
    return (
        _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mif1")
        + _box(b"meta", struct.pack(">I", 0) + meta_children)
        + _box(b"mdat", b"\0" * 16)
    )
