"""CCITTFaxDecode (ITU-T T.4 / T.6) for PDF embedded images.

Scanned PDFs are overwhelmingly Group 4 (2-D MMR) images wrapped in
``/CCITTFaxDecode``; the reference implements only ASCIIHex + Flate
(``libs/pdf/src/stream/filters.c:11-72``), so this extends the E10/E11
filter pattern with the one high-frequency real-corpus decode that was
still routed to "native". Implemented from the public specs (ITU-T T.4
§4.1/§4.2 one-dimensional MH and two-dimensional MR, ITU-T T.6 §2 MMR;
PDF 32000-1 §7.4.6 for the parameter semantics):

- ``K < 0``  — pure 2-D (Group 4 / MMR): pass, horizontal and the seven
  vertical modes against the changing elements of the reference line.
- ``K = 0``  — 1-D MH rows (Group 3), optional leading EOLs.
- ``K > 0``  — mixed 1-D/2-D (Group 3 2-D): EOL + tag bit per row.

Bit conventions follow the spec exactly: codes are MSB-first; output is
1 bit/pixel with rows padded to byte boundaries; ``BlackIs1=false``
(the PDF default) stores black as 0 bits. ``EncodedByteAlign`` pads
*input* rows (K<=0: before each row; K<0 per §7.4.6 note) to byte
boundaries. A matching Group 4 encoder generates honest fixtures for
tests and the qx38 corpus variant.
"""

from __future__ import annotations

from pdf_spark.core.errors import PdfError, UNSUPPORTED_FILTER

# --- ITU-T T.4 modified Huffman run-length tables ------------------------------
# (code_bits_as_string -> run). Terminating codes 0..63 plus makeup codes
# 64..2560; makeups >= 1792 are shared between colors (T.4 table 3a/3b).

_WHITE_CODES = {
    "00110101": 0, "000111": 1, "0111": 2, "1000": 3, "1011": 4,
    "1100": 5, "1110": 6, "1111": 7, "10011": 8, "10100": 9,
    "00111": 10, "01000": 11, "001000": 12, "000011": 13, "110100": 14,
    "110101": 15, "101010": 16, "101011": 17, "0100111": 18,
    "0001100": 19, "0001000": 20, "0010111": 21, "0000011": 22,
    "0000100": 23, "0101000": 24, "0101011": 25, "0010011": 26,
    "0100100": 27, "0011000": 28, "00000010": 29, "00000011": 30,
    "00011010": 31, "00011011": 32, "00010010": 33, "00010011": 34,
    "00010100": 35, "00010101": 36, "00010110": 37, "00010111": 38,
    "00101000": 39, "00101001": 40, "00101010": 41, "00101011": 42,
    "00101100": 43, "00101101": 44, "00000100": 45, "00000101": 46,
    "00001010": 47, "00001011": 48, "01010010": 49, "01010011": 50,
    "01010100": 51, "01010101": 52, "00100100": 53, "00100101": 54,
    "01011000": 55, "01011001": 56, "01011010": 57, "01011011": 58,
    "01001010": 59, "01001011": 60, "00110010": 61, "00110011": 62,
    "00110100": 63,
    # white makeup codes
    "11011": 64, "10010": 128, "010111": 192, "0110111": 256,
    "00110110": 320, "00110111": 384, "01100100": 448, "01100101": 512,
    "01101000": 576, "01100111": 640, "011001100": 704, "011001101": 768,
    "011010010": 832, "011010011": 896, "011010100": 960,
    "011010101": 1024, "011010110": 1088, "011010111": 1152,
    "011011000": 1216, "011011001": 1280, "011011010": 1344,
    "011011011": 1408, "010011000": 1472, "010011001": 1536,
    "010011010": 1600, "011000": 1664, "010011011": 1728,
}

_BLACK_CODES = {
    "0000110111": 0, "010": 1, "11": 2, "10": 3, "011": 4,
    "0011": 5, "0010": 6, "00011": 7, "000101": 8, "000100": 9,
    "0000100": 10, "0000101": 11, "0000111": 12, "00000100": 13,
    "00000111": 14, "000011000": 15, "0000010111": 16, "0000011000": 17,
    "0000001000": 18, "00001100111": 19, "00001101000": 20,
    "00001101100": 21, "00000110111": 22, "00000101000": 23,
    "00000010111": 24, "00000011000": 25, "000011001010": 26,
    "000011001011": 27, "000011001100": 28, "000011001101": 29,
    "000001101000": 30, "000001101001": 31, "000001101010": 32,
    "000001101011": 33, "000011010010": 34, "000011010011": 35,
    "000011010100": 36, "000011010101": 37, "000011010110": 38,
    "000011010111": 39, "000001101100": 40, "000001101101": 41,
    "000011011010": 42, "000011011011": 43, "000001010100": 44,
    "000001010101": 45, "000001010110": 46, "000001010111": 47,
    "000001100100": 48, "000001100101": 49, "000001010010": 50,
    "000001010011": 51, "000000100100": 52, "000000110111": 53,
    "000000111000": 54, "000000100111": 55, "000000101000": 56,
    "000001011000": 57, "000001011001": 58, "000000101011": 59,
    "000000101100": 60, "000001011010": 61, "000001100110": 62,
    "000001100111": 63,
    # black makeup codes
    "0000001111": 64, "000011001000": 128, "000011001001": 192,
    "000001011011": 256, "000000110011": 320, "000000110100": 384,
    "000000110101": 448, "0000001101100": 512, "0000001101101": 576,
    "0000001001010": 640, "0000001001011": 704, "0000001001100": 768,
    "0000001001101": 832, "0000001110010": 896, "0000001110011": 960,
    "0000001110100": 1024, "0000001110101": 1088, "0000001110110": 1152,
    "0000001110111": 1216, "0000001010010": 1280, "0000001010011": 1344,
    "0000001010100": 1408, "0000001010101": 1472, "0000001011010": 1536,
    "0000001011011": 1600, "0000001100100": 1664, "0000001100101": 1728,
}

# extended makeup codes (1792..2560), shared between colors (T.4 table 3b)
_EXT_CODES = {
    "00000001000": 1792, "00000001100": 1856, "00000001101": 1920,
    "000000010010": 1984, "000000010011": 2048, "000000010100": 2112,
    "000000010101": 2176, "000000010110": 2240, "000000010111": 2304,
    "000000011100": 2368, "000000011101": 2432, "000000011110": 2496,
    "000000011111": 2560,
}

_EOL = "000000000001"


def _prefix_map(*tables: dict) -> dict[str, int]:
    out: dict[str, int] = {}
    for t in tables:
        out.update(t)
    return out


_WHITE_ALL = _prefix_map(_WHITE_CODES, _EXT_CODES)
_BLACK_ALL = _prefix_map(_BLACK_CODES, _EXT_CODES)
_WHITE_ENC = {run: code for code, run in _WHITE_ALL.items()}
_BLACK_ENC = {run: code for code, run in _BLACK_ALL.items()}
_MAX_CODE_LEN = 14


class _Bits:
    """MSB-first bit reader over bytes."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def eof(self) -> bool:
        return self.pos >= self.n

    def read1(self) -> int:
        p = self.pos
        if p >= self.n:
            raise PdfError(UNSUPPORTED_FILTER, "CCITT: truncated stream")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def peek_str(self, k: int) -> str:
        out = []
        p = self.pos
        end = min(self.n, p + k)
        while p < end:
            out.append("1" if (self.data[p >> 3] >> (7 - (p & 7))) & 1
                       else "0")
            p += 1
        return "".join(out)

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_mh_run(bits: _Bits, white: bool) -> int:
    """One complete MH run (makeup* + terminating) for one color."""
    table = _WHITE_ALL if white else _BLACK_ALL
    total = 0
    while True:
        run = None
        buf = ""
        for _ in range(_MAX_CODE_LEN):
            buf += "1" if bits.read1() else "0"
            if buf in table:
                run = table[buf]
                break
        if run is None:
            raise PdfError(UNSUPPORTED_FILTER, f"CCITT: bad MH code {buf!r}")
        total += run
        if run < 64:  # terminating code ends the run
            return total
        # makeup codes accumulate; a terminating code must follow


def _transitions_to_row(trans: list[int], columns: int,
                        black_is_1: bool) -> bytes:
    """Changing elements (positions where color flips, starting white)
    -> one packed row, byte padded; pad bits 0."""
    white_bit, black_bit = (0, 1) if black_is_1 else (1, 0)
    px = [white_bit] * columns
    color_black = False
    prev = 0
    for pos in trans:
        pos = min(pos, columns)
        if color_black and black_bit != white_bit:
            px[prev:pos] = [black_bit] * (pos - prev)
        color_black = not color_black
        prev = pos
        if prev >= columns:
            break
    if color_black:
        px[prev:columns] = [black_bit] * (columns - prev)
    row = bytearray((columns + 7) // 8)
    for x, v in enumerate(px):
        if v:
            row[x >> 3] |= 1 << (7 - (x & 7))
    return bytes(row)


def _decode_1d_row(bits: _Bits, columns: int) -> list[int]:
    """One MH-coded row -> changing-element positions."""
    trans: list[int] = []
    pos = 0
    white = True
    while pos < columns:
        run = _read_mh_run(bits, white)
        pos += run
        trans.append(min(pos, columns))
        white = not white
    return trans


def _b1_b2(ref: list[int], a0: int, color_black: bool,
           columns: int) -> tuple[int, int]:
    """Changing elements b1/b2 on the reference line (T.6 §2.1.2):
    b1 = first changing element on ref line to the right of a0 with the
    OPPOSITE color of a0's color run (i.e. same parity as the next
    transition of the coding line); b2 = next one after b1."""
    # ref transitions alternate white->black (even index) / black->white
    # (odd index). The first transition with value > a0 and correct
    # parity: parity 0 (white->black) while coding a white run.
    want_parity = 1 if color_black else 0
    i = 0
    n = len(ref)
    while i < n and (ref[i] <= a0 or (i & 1) != want_parity):
        i += 1
    b1 = ref[i] if i < n else columns
    b2 = ref[i + 1] if i + 1 < n else columns
    return b1, b2


def _decode_2d_row(bits: _Bits, ref: list[int], columns: int) -> list[int]:
    """One 2-D-coded row (MMR / MR vertical-horizontal-pass modes) ->
    changing-element positions."""
    trans: list[int] = []
    a0 = -1
    color_black = False
    n_modes = 0
    while a0 < columns:
        n_modes += 1
        if n_modes > 2 * columns + 8:
            # corrupt vertical/pass modes can stop advancing a0; a valid
            # row never needs more modes than transitions
            raise PdfError(UNSUPPORTED_FILTER, "CCITT: row does not advance")
        b1, b2 = _b1_b2(ref, a0, color_black, columns)
        # mode decode (prefix-free): V0=1, VR1=011, VL1=010, H=001,
        # P=0001, VR2=000011, VL2=000010, VR3=0000011, VL3=0000010
        if bits.read1():
            a1 = b1  # V0
            trans.append(min(a1, columns))
            a0 = a1
            color_black = not color_black
            continue
        if bits.read1():
            a1 = b1 + 1 if bits.read1() else b1 - 1  # VR1 / VL1
            trans.append(min(max(a1, 0), columns))
            a0 = a1
            color_black = not color_black
            continue
        if bits.read1():  # 001 horizontal: two MH runs in current color
            start = 0 if a0 < 0 else a0
            r1 = _read_mh_run(bits, not color_black)
            r2 = _read_mh_run(bits, color_black)
            a1 = start + r1
            a2 = a1 + r2
            trans.append(min(a1, columns))
            trans.append(min(a2, columns))
            a0 = a2
            continue
        if bits.read1():  # 0001 pass
            a0 = b2
            continue
        if bits.read1():
            a1 = b1 + 2 if bits.read1() else b1 - 2  # VR2 / VL2
            trans.append(min(max(a1, 0), columns))
            a0 = a1
            color_black = not color_black
            continue
        if bits.read1():
            a1 = b1 + 3 if bits.read1() else b1 - 3  # VR3 / VL3
            trans.append(min(max(a1, 0), columns))
            a0 = a1
            color_black = not color_black
            continue
        # 0000000... — EOL prefix (error or terminator); report upward
        raise _EolSignal()
    return trans


class _EolSignal(Exception):
    """2-D row decode hit an EOL/EOFB prefix instead of a mode code."""


def _skip_eols(bits: _Bits) -> int:
    """Consume any EOL codes at the current position; returns count."""
    n = 0
    while True:
        look = bits.peek_str(len(_EOL))
        if look == _EOL:
            bits.pos += len(_EOL)
            n += 1
        else:
            return n


def ccitt_decode(
    data: bytes,
    columns: int = 1728,
    rows: int = 0,
    k: int = 0,
    black_is_1: bool = False,
    byte_align: bool = False,
) -> bytes:
    """CCITT G3/G4 -> packed 1-bpp rows (byte padded), PDF bit sense.

    ``rows=0`` decodes until EOFB or data exhaustion. Raises
    :class:`PdfError` (UNSUPPORTED_FILTER) on malformed streams so the
    caller's error-row contract holds.
    """
    if columns <= 0 or columns > 1 << 16:
        raise PdfError(UNSUPPORTED_FILTER, f"CCITT: columns {columns}")
    bits = _Bits(data)
    out = bytearray()
    ref = [columns, columns]
    n_rows = 0
    max_rows = rows if rows > 0 else 1 << 20
    while n_rows < max_rows:
        if byte_align and k <= 0:
            # EncodedByteAlign: each coded row starts byte-aligned
            bits.align()
        if bits.eof():
            break
        two_d = k < 0
        if k >= 0:
            n_eol = _skip_eols(bits)
            if k > 0 and n_eol == 0 and n_rows == 0:
                # T.4 2-D streams must open with EOL+tag; tolerate its
                # absence by assuming a 1-D first row (real-world scans)
                pass
            if byte_align and n_eol:
                pass  # alignment applied before the EOL above
            if bits.eof():
                break
            if k > 0:
                if n_eol:
                    two_d = bits.read1() == 0  # tag bit: 1=1-D, 0=2-D
                else:
                    two_d = False
        else:
            # G4 terminator: EOFB = two EOLs
            if bits.peek_str(len(_EOL)) == _EOL:
                break
        try:
            if two_d:
                trans = _decode_2d_row(bits, ref, columns)
            else:
                trans = _decode_1d_row(bits, columns)
        except _EolSignal:
            break
        except PdfError:
            if rows <= 0 and n_rows > 0 and bits.n - bits.pos < 16:
                break  # trailing fill bits after the last row
            raise
        out += _transitions_to_row(trans, columns, black_is_1)
        if len(out) > 1 << 26:  # 64 MB decompression-bomb cap
            raise PdfError(UNSUPPORTED_FILTER, "CCITT: output too large")
        ref = trans
        n_rows += 1
    if rows > 0 and n_rows < rows:
        raise PdfError(
            UNSUPPORTED_FILTER, f"CCITT: {n_rows} of {rows} rows"
        )
    return bytes(out)


# --- Group 4 encoder (fixture generator) ---------------------------------------


class _BitW:
    __slots__ = ("buf", "acc", "nb")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nb = 0

    def write(self, code: str) -> None:
        for c in code:
            self.acc = (self.acc << 1) | (1 if c == "1" else 0)
            self.nb += 1
            if self.nb == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.nb = 0

    def done(self) -> bytes:
        if self.nb:
            self.buf.append((self.acc << (8 - self.nb)) & 0xFF)
        return bytes(self.buf)


def _mh_code(run: int, white: bool) -> str:
    enc = _WHITE_ENC if white else _BLACK_ENC
    out = ""
    while run >= 64:
        # largest makeup <= run
        mk = min(run - run % 64, 2560)
        while mk not in enc:
            mk -= 64
        out += enc[mk]
        run -= mk
    return out + enc[run]


def _row_transitions(row_bits: list[int]) -> list[int]:
    """Pixel row (1=black) -> changing-element positions."""
    trans = []
    prev = 0
    for x, v in enumerate(row_bits):
        if v != prev:
            trans.append(x)
            prev = v
    return trans


def encode_ccitt_g3_1d(
    rows_pixels: list[list[int]],
    columns: int,
    with_eol: bool = True,
    byte_align: bool = False,
) -> bytes:
    """Group 3 one-dimensional (MH) encoder over pixel rows (1 = black),
    optional per-row EOL and EncodedByteAlign — the K=0 fixture twin of
    :func:`encode_ccitt_g4`."""
    w = _BitW()
    for row in rows_pixels:
        if len(row) != columns:
            raise ValueError("row width mismatch")
        if byte_align and w.nb:
            w.write("0" * (8 - w.nb))
        if with_eol:
            w.write(_EOL)
        trans = _row_transitions(row) + [columns]
        prev = 0
        white = True
        for pos in trans:
            w.write(_mh_code(pos - prev, white))
            prev = pos
            white = not white
    return w.done()


def encode_ccitt_g4(rows_pixels: list[list[int]], columns: int) -> bytes:
    """Group 4 (pure 2-D MMR) encoder over pixel rows (1 = black).

    Emits pass/vertical/horizontal modes exactly per T.6 §2.2 and the
    closing EOFB, so any conforming reader decodes it — honest fixture
    bytes, mirroring the repo's other format writers."""
    w = _BitW()
    ref = [columns, columns]
    for row in rows_pixels:
        if len(row) != columns:
            raise ValueError("row width mismatch")
        cur = _row_transitions(row)
        a0 = -1
        color_black = False
        ci = 0
        while a0 < columns:
            b1, b2 = _b1_b2(ref, a0, color_black, columns)
            a1 = cur[ci] if ci < len(cur) else columns
            if b2 < a1:
                w.write("0001")  # pass
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                w.write({0: "1", 1: "011", 2: "000011", 3: "0000011",
                         -1: "010", -2: "000010", -3: "0000010"}[d])
                a0 = a1
                ci += 1
                color_black = not color_black
                continue
            # horizontal: two runs from a0 (first pixel counts from 0)
            a2 = cur[ci + 1] if ci + 1 < len(cur) else columns
            start = 0 if a0 < 0 else a0
            w.write("001")
            w.write(_mh_code(a1 - start, not color_black))
            w.write(_mh_code(a2 - a1, color_black))
            a0 = a2
            ci += 2
        ref = cur
    w.write(_EOL + _EOL)  # EOFB
    return w.done()
