"""HTTP/1.1 chunked Transfer-Encoding decoding (RFC 9112 §7.1, public).

WARC ``response`` records store the raw wire body; when the origin sent
``Transfer-Encoding: chunked``, the payload the extractor needs is
interleaved with chunk-size framing — decoding it is the transport
sibling of the gzip Content-Encoding unwrap (E21): skip it and every
downstream byte offset, charset sniff, and hash is wrong (the classic
"3b0\\r\\n" garbage prefix inside extracted text).

Grammar: each chunk is ``<hex-size>[;ext]\\r\\n<data>\\r\\n``; a ``0``-size
chunk terminates, optionally followed by trailer fields and a final
CRLF. Tolerances mirror browsers: bare-LF line endings accepted,
chunk extensions ignored, truncation flagged at the exact failure
point with everything decoded so far retained.
"""

from __future__ import annotations


def dechunk(data: bytes) -> dict:
    """Decode a chunked body. Returns::

        {ok, body, n_chunks, body_len, has_trailer, malformed}

    ``ok`` is 1 when the terminating 0-chunk was seen; ``malformed``
    flags a non-hex size line or data running past the buffer (the
    partial ``body`` is retained — tolerant-walk rule). ``has_trailer``
    is 1 when non-empty trailer fields follow the 0-chunk.
    """
    pos = 0
    n = len(data)
    body = bytearray()
    n_chunks = 0
    has_trailer = 0
    ok = 0
    malformed = 0
    while pos < n:
        eol = data.find(b"\n", pos)
        if eol == -1:
            malformed = 1
            break
        line = data[pos:eol].rstrip(b"\r")
        pos = eol + 1
        size_str = line.split(b";", 1)[0].strip()
        try:
            size = int(size_str, 16)
        except ValueError:
            malformed = 1
            break
        if size == 0:
            ok = 1
            # trailer fields run to the final empty line
            while pos < n:
                eol = data.find(b"\n", pos)
                if eol == -1:
                    break
                tline = data[pos:eol].rstrip(b"\r")
                pos = eol + 1
                if not tline:
                    break
                has_trailer = 1
            break
        if pos + size > n:
            body += data[pos:n]
            malformed = 1
            break
        body += data[pos:pos + size]
        n_chunks += 1
        pos += size
        # consume the CRLF (or LF) after the chunk data
        if data[pos:pos + 2] == b"\r\n":
            pos += 2
        elif data[pos:pos + 1] == b"\n":
            pos += 1
        else:
            malformed = 1
            break
    return {
        "ok": ok,
        "body": bytes(body),
        "n_chunks": n_chunks,
        "body_len": len(body),
        "has_trailer": has_trailer,
        "malformed": malformed,
    }


def encode_chunked(
    parts: list[bytes], trailer: bytes | None = None
) -> bytes:
    """Assemble a chunked body from data parts — the fixture writer the
    decoder is certified against."""
    out = bytearray()
    for part in parts:
        out += format(len(part), "x").encode() + b"\r\n" + part + b"\r\n"
    out += b"0\r\n"
    if trailer:
        out += trailer + b"\r\n"
    out += b"\r\n"
    return bytes(out)
