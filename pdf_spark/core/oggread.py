"""Ogg container structural audit (RFC 3533, public).

The streaming-media counterpart of qm39's tar walk: Ogg is the free
container the web serves Vorbis/Opus audio and Theora video in, and a
corpus's media tier wants the same no-decode framing audit the other
qm gates give — page boundaries, logical-stream bookkeeping, codec
identification from the first packet's magic, truncation flagged at the
exact failure point.

Page layout (RFC 3533 §6): ``OggS`` capture pattern, version 0, header
flags (0x01 continuation, 0x02 BOS, 0x04 EOS), 8-byte LE granule
position, 4-byte LE bitstream serial, 4-byte LE page sequence, 4-byte
CRC, segment count, segment table (one lacing byte each), then the
payload (sum of lacing values). No packet is decoded; codec detection
reads only the magic prefix of the first BOS page's payload
(``\\x01vorbis`` / ``OpusHead`` / ``\\x80theora`` — each codec's public
mapping spec).
"""

from __future__ import annotations

_CODEC_MAGICS = (
    (b"\x01vorbis", "vorbis"),
    (b"OpusHead", "opus"),
    (b"\x80theora", "theora"),
)


def ogg_audit(data: bytes) -> dict:
    """Walk Ogg page framing. Returns::

        {is_ogg, n_pages, n_streams, has_eos, codec, truncated}

    ``n_streams`` counts BOS pages (one per logical bitstream in a
    well-formed file); ``codec`` comes from the first BOS payload's
    magic (None if unrecognized); ``truncated`` flags a page whose
    header or payload runs past the buffer (inventory keeps everything
    before the failure point — the qm39 tolerant-walk rule).
    """
    if len(data) < 27 or data[:4] != b"OggS":
        return {
            "is_ogg": 0,
            "n_pages": None,
            "n_streams": None,
            "has_eos": None,
            "codec": None,
            "truncated": None,
        }
    pos = 0
    n = len(data)
    n_pages = n_streams = has_eos = truncated = 0
    codec = None
    while pos < n:
        if n - pos < 27 or data[pos:pos + 4] != b"OggS" or data[pos + 4] != 0:
            truncated = 1
            break
        flags = data[pos + 5]
        n_segs = data[pos + 26]
        table_end = pos + 27 + n_segs
        if table_end > n:
            truncated = 1
            break
        body_len = sum(data[pos + 27:table_end])
        if table_end + body_len > n:
            truncated = 1
            break
        n_pages += 1
        if flags & 0x02:
            n_streams += 1
            if codec is None:
                body = data[table_end:table_end + body_len]
                for magic, name in _CODEC_MAGICS:
                    if body.startswith(magic):
                        codec = name
                        break
        if flags & 0x04:
            has_eos = 1
        pos = table_end + body_len
    return {
        "is_ogg": 1,
        "n_pages": n_pages,
        "n_streams": n_streams,
        "has_eos": has_eos,
        "codec": codec,
        "truncated": truncated,
    }


def encode_ogg_page(
    serial: int,
    seq: int,
    payload: bytes,
    bos: bool = False,
    eos: bool = False,
    granule: int = 0,
) -> bytes:
    """Assemble one syntactically-valid page (CRC left zero — the audit
    checks framing, not checksums) — the fixture writer the audit is
    certified against."""
    flags = (0x02 if bos else 0) | (0x04 if eos else 0)
    # lacing: 255-valued bytes plus a terminator < 255
    lacing = bytearray()
    rest = len(payload)
    while rest >= 255:
        lacing.append(255)
        rest -= 255
    lacing.append(rest)
    return (
        b"OggS"
        + bytes([0, flags])
        + granule.to_bytes(8, "little")
        + serial.to_bytes(4, "little")
        + seq.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + bytes([len(lacing)])
        + bytes(lacing)
        + payload
    )
