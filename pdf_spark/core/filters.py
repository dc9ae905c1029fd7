"""Stream filter chain: ASCIIHexDecode + FlateDecode.

Mirrors ``/root/reference/libs/pdf/src/stream/filters.c:11-72`` — the filter
chain is applied left-to-right over the ``Filter`` name-or-array; the
reference implements exactly ASCIIHexDecode (ascii.c:27-76) and FlateDecode
(a from-scratch RFC1950/1951 inflate, libs/codec/src/deflate.c). We use the
CPython ``zlib`` C module — same RFCs, identical output bytes by
construction. LZWDecode (named in scope by the north star, panicking in the
reference at filters.c:54) is implemented per PDF 32000-1 §7.4.4 with
EarlyChange. Anything else (DCTDecode, …) raises UNSUPPORTED_FILTER (the
reference panic class; we record the error-code row instead).

EXTENSION beyond the reference: PNG predictors (DecodeParms /Predictor >= 10)
are implemented vectorized with numpy — common in real-world Common-Crawl
PDFs, absent from the parity corpus.
"""

from __future__ import annotations

import zlib
from typing import Optional

import numpy as np

from pdf_spark.core.errors import (
    FILTER_ERROR,
    UNSUPPORTED_FILTER,
    PdfError,
)

WHITESPACE = b"\x00\t\n\x0c\r "


def ascii_hex_decode(data: bytes) -> bytes:
    """Whitespace-tolerant hex pairs until ``>`` (EOD); odd trailing digit is
    the high nibble (ascii.c:27-76)."""
    from pdf_spark.core.objects import hex_body_to_bytes

    end = data.find(b">")
    body = data[:end] if end >= 0 else data
    try:
        return hex_body_to_bytes(body)
    except (ValueError, UnicodeDecodeError) as exc:
        raise PdfError(FILTER_ERROR, f"ASCIIHexDecode: {exc}") from None


def flate_decode(data: bytes) -> bytes:
    """RFC1950 zlib stream (deflate.c:23-549 reimplements this; we call the C
    zlib module). Tolerates a truncated Adler-32 trailer via decompressobj."""
    try:
        return zlib.decompress(data)
    except zlib.error:
        try:
            d = zlib.decompressobj()
            out = d.decompress(data)
            out += d.flush()
            return out
        except zlib.error as exc:
            raise PdfError(FILTER_ERROR, f"FlateDecode: {exc}") from None


def lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF LZWDecode (PDF 32000-1 §7.4.4): TIFF-style LZW, MSB-first codes,
    9→12 bit widths, Clear=256, EOD=257, EarlyChange default 1.

    EXTENSION beyond the reference: /root/reference panics on LZWDecode
    (filters.c:54 LOG_TODO); the north star names LZW as in scope, so this
    is implemented per spec and exercised by its own generator variant.
    """
    out = bytearray()
    dic: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    code_bits = 9
    next_code = 258
    prev: Optional[bytes] = None
    bitbuf = 0
    nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= code_bits:
            nbits -= code_bits
            code = (bitbuf >> nbits) & ((1 << code_bits) - 1)
            if code == 256:  # ClearTable
                dic = {i: bytes([i]) for i in range(256)}
                code_bits = 9
                next_code = 258
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                entry = dic.get(code)
                if entry is None:
                    raise PdfError(FILTER_ERROR, f"LZWDecode: bad first code {code}")
            elif code in dic:
                entry = dic[code]
                if next_code < 4096:  # entries past 12-bit max are unreferencable
                    dic[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:  # KwKwK case
                entry = prev + prev[:1]
                if next_code < 4096:
                    dic[next_code] = entry
                next_code += 1
            else:
                raise PdfError(FILTER_ERROR, f"LZWDecode: bad code {code}")
            out += entry
            prev = entry
            if next_code >= (1 << code_bits) - early_change and code_bits < 12:
                code_bits += 1
    return bytes(out)


def lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """LZW encoder matching ``lzw_decode`` (used by the corpus generator
    and tests; emits Clear at start and before table overflow)."""
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, bits: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << bits) | code
        nbits += bits
        while nbits >= 8:
            nbits -= 8
            out.append((bitbuf >> nbits) & 0xFF)

    dic: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    code_bits = 9
    next_code = 258
    emit(256, code_bits)
    w = b""
    for i in range(len(data)):
        ch = data[i : i + 1]
        wc = w + ch
        if wc in dic:
            w = wc
            continue
        emit(dic[w], code_bits)
        dic[wc] = next_code
        next_code += 1
        # the decoder's table add lags the encoder's by one step, so the
        # encoder widens one entry later than the decoder's
        # ``next >= 2^b - early`` rule to keep code widths in lockstep
        if next_code + early_change - 1 >= (1 << code_bits) and code_bits < 12:
            code_bits += 1
        if next_code >= 4093:  # reset before the 12-bit table fills
            emit(256, code_bits)
            dic = {bytes([i]): i for i in range(256)}
            code_bits = 9
            next_code = 258
        w = ch
    if w:
        emit(dic[w], code_bits)
    emit(257, code_bits)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _png_unpredict(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    """Reverse PNG row filters (predictor >= 10). Vectorized per-row."""
    bpp = max(1, (colors * bpc) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    stride = rowlen + 1
    nrows = len(data) // stride
    if nrows == 0:
        return data
    raw = np.frombuffer(data[: nrows * stride], dtype=np.uint8).reshape(
        nrows, stride
    )
    out = np.zeros((nrows, rowlen), dtype=np.uint8)
    prior = np.zeros(rowlen, dtype=np.uint8)
    for r in range(nrows):
        ftype = raw[r, 0]
        row = raw[r, 1:].astype(np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub
            cur = row.copy()
            for i in range(bpp, rowlen):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prior) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for i in range(rowlen):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + int(prior[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for i in range(rowlen):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prior[i])
                c = int(prior[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise PdfError(FILTER_ERROR, f"bad PNG row filter {ftype}")
        out[r] = cur.astype(np.uint8)
        prior = out[r]
    return out.tobytes()


def _apply_predictor(data: bytes, parms: Optional[dict]) -> bytes:
    if not parms:
        return data
    predictor = parms.get("Predictor", 1)
    if predictor in (None, 1):
        return data
    if predictor == 2:
        raise PdfError(UNSUPPORTED_FILTER, "TIFF predictor 2")
    colors = parms.get("Colors", 1) or 1
    bpc = parms.get("BitsPerComponent", 8) or 8
    columns = parms.get("Columns", 1) or 1
    return _png_unpredict(data, colors, bpc, columns)


def decode_stream(stream_dict: dict, raw: bytes, resolver=None) -> bytes:
    """Run the ``Filter`` chain left-to-right (filters.c:28-66).

    ``Filter`` may be a single name or an array (stream_dict.h:4-9);
    ``DecodeParms`` likewise a dict or parallel array.
    """

    def rz(v):
        from pdf_spark.core.objects import Ref

        if resolver is not None and isinstance(v, Ref):
            return resolver.resolve(v)
        return v

    filters = rz(stream_dict.get("Filter"))
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    parms = rz(stream_dict.get("DecodeParms") or stream_dict.get("DP"))
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    elif len(parms) < len(filters):
        # malformed-but-real: a short DecodeParms array must not silently
        # drop trailing filters via zip truncation
        parms = parms + [None] * (len(filters) - len(parms))
    data = raw
    for name, parm in zip(filters, parms):
        name = rz(name)
        parm = rz(parm)
        if name == "ASCIIHexDecode" or name == "AHx":
            data = ascii_hex_decode(data)
        elif name == "FlateDecode" or name == "Fl":
            data = flate_decode(data)
            data = _apply_predictor(data, parm)
        elif name == "LZWDecode" or name == "LZW":
            ec = 1
            if isinstance(parm, dict):
                ec = parm.get("EarlyChange", 1)
                ec = 1 if ec is None else int(ec)
            data = lzw_decode(data, ec)
            data = _apply_predictor(data, parm)
        else:
            raise PdfError(UNSUPPORTED_FILTER, str(name))
    return data
