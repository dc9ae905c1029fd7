"""Minimal CFF (Type1C / FontFile3) charset+encoding reader for text decode.

The reference carries a full CFF parser — INDEX/Top-DICT/charset structures
plus a Type2 charstring interpreter — because it needs glyph SHAPES
(/root/reference/libs/cff/src/cff.c, charsets.c, charstring.c:344-867).
Extraction needs none of the outline machinery: a symbolic Type1C font with
no ToUnicode and no usable /Encoding can still be decoded by walking
``code -> GID`` (the CFF's built-in Encoding) ``-> SID`` (the charset)
``-> glyph name`` (standard strings or the String INDEX) ``-> Unicode``
(AGL). This module parses exactly those four structures and nothing else —
charstrings, Private DICTs and subrs are never touched.

Binary layout per the public CFF spec (Adobe TN #5176): INDEX = count(u16)
offSize(u8) offsets[(count+1)*offSize] data; DICT operands are the 5
integer/real forms; charset formats 0/1/2; encoding formats 0/1 plus the
0x80 supplement flag. The standard strings (SID 0-228, the ISOAdobe set)
are published spec data (TN #5176 Appendix A); the expert-set SIDs 229-390
are intentionally omitted — they name smallcap/oldstyle ornament variants
with no AGL text value, and unknown SIDs simply fall through to the next
decode source.

CID-keyed CFFs (Top DICT with ROS) use the charset as GID->CID, not
GID->name — out of scope here (CIDFontType0 text decode goes through
ToUnicode / predefined CMaps / the charset codec path in core.cmap).
"""

from __future__ import annotations

from typing import Optional

from pdf_spark.core.encodings import STANDARD_ENCODING

# CFF standard strings, SIDs 0-228 (TN #5176 Appendix A, ISOAdobe range).
# SIDs 1-95 are the printable-ASCII glyph run; 96-149 the StandardEncoding
# high range in code order; 150-228 the ISOLatin1 supplement.
STANDARD_STRINGS: tuple[str, ...] = (
    ".notdef", "space", "exclam", "quotedbl", "numbersign", "dollar",
    "percent", "ampersand", "quoteright", "parenleft", "parenright",
    "asterisk", "plus", "comma", "hyphen", "period", "slash", "zero",
    "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "colon", "semicolon", "less", "equal", "greater", "question",
    "at", "A", "B", "C", "D", "E", "F", "G", "H", "I", "J", "K", "L",
    "M", "N", "O", "P", "Q", "R", "S", "T", "U", "V", "W", "X", "Y", "Z",
    "bracketleft", "backslash", "bracketright", "asciicircum",
    "underscore", "quoteleft", "a", "b", "c", "d", "e", "f", "g", "h",
    "i", "j", "k", "l", "m", "n", "o", "p", "q", "r", "s", "t", "u", "v",
    "w", "x", "y", "z", "braceleft", "bar", "braceright", "asciitilde",
    "exclamdown", "cent", "sterling", "fraction", "yen", "florin",
    "section", "currency", "quotesingle", "quotedblleft",
    "guillemotleft", "guilsinglleft", "guilsinglright", "fi", "fl",
    "endash", "dagger", "daggerdbl", "periodcentered", "paragraph",
    "bullet", "quotesinglbase", "quotedblbase", "quotedblright",
    "guillemotright", "ellipsis", "perthousand", "questiondown", "grave",
    "acute", "circumflex", "tilde", "macron", "breve", "dotaccent",
    "dieresis", "ring", "cedilla", "hungarumlaut", "ogonek", "caron",
    "emdash", "AE", "ordfeminine", "Lslash", "Oslash", "OE",
    "ordmasculine", "ae", "dotlessi", "lslash", "oslash", "oe",
    "germandbls", "onesuperior", "logicalnot", "mu", "trademark", "Eth",
    "onehalf", "plusminus", "Thorn", "onequarter", "divide", "brokenbar",
    "degree", "thorn", "threequarters", "twosuperior", "registered",
    "minus", "eth", "multiply", "threesuperior", "copyright", "Aacute",
    "Acircumflex", "Adieresis", "Agrave", "Aring", "Atilde", "Ccedilla",
    "Eacute", "Ecircumflex", "Edieresis", "Egrave", "Iacute",
    "Icircumflex", "Idieresis", "Igrave", "Ntilde", "Oacute",
    "Ocircumflex", "Odieresis", "Ograve", "Otilde", "Scaron", "Uacute",
    "Ucircumflex", "Udieresis", "Ugrave", "Yacute", "Ydieresis",
    "Zcaron", "aacute", "acircumflex", "adieresis", "agrave", "aring",
    "atilde", "ccedilla", "eacute", "ecircumflex", "edieresis", "egrave",
    "iacute", "icircumflex", "idieresis", "igrave", "ntilde", "oacute",
    "ocircumflex", "odieresis", "ograve", "otilde", "scaron", "uacute",
    "ucircumflex", "udieresis", "ugrave", "yacute", "ydieresis", "zcaron",
)

_N_STD = len(STANDARD_STRINGS)  # 229


def _u16(b: bytes, off: int) -> int:
    return (b[off] << 8) | b[off + 1]


def _read_index(data: bytes, off: int):
    """One INDEX -> (items, next_offset) or None on malformed bounds."""
    if off + 2 > len(data):
        return None
    count = _u16(data, off)
    if count == 0:
        return [], off + 2
    if off + 3 > len(data):
        return None
    off_size = data[off + 2]
    if not 1 <= off_size <= 4:
        return None
    p = off + 3
    end_offs = p + (count + 1) * off_size
    if end_offs > len(data):
        return None
    offs = []
    for _ in range(count + 1):
        v = 0
        for byte in data[p : p + off_size]:
            v = (v << 8) | byte
        offs.append(v)
        p += off_size
    base = p - 1  # offsets are 1-based from the byte before the data block
    if any(o < 1 for o in offs) or any(
        offs[i] > offs[i + 1] for i in range(count)
    ):
        return None
    if base + offs[-1] > len(data):
        return None
    items = [data[base + offs[i] : base + offs[i + 1]] for i in range(count)]
    return items, base + offs[-1]


def _parse_dict(data: bytes) -> dict:
    """DICT bytes -> {op: [operands]} (escape ops keyed as 0xc00 | op2)."""
    out: dict = {}
    operands: list = []
    i, n = 0, len(data)
    while i < n:
        b0 = data[i]
        if 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250 and i + 1 < n:
            operands.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254 and i + 1 < n:
            operands.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        elif b0 == 28 and i + 2 < n:
            v = _u16(data, i + 1)
            operands.append(v - 0x10000 if v >= 0x8000 else v)
            i += 3
        elif b0 == 29 and i + 4 < n:
            v = int.from_bytes(data[i + 1 : i + 5], "big", signed=True)
            operands.append(v)
            i += 5
        elif b0 == 30:
            # real number: BCD nibbles until 0xf terminator; only the
            # byte-length matters here (no Top DICT key we read is real)
            i += 1
            while i < n:
                byte = data[i]
                i += 1
                if (byte & 0x0F) == 0x0F or (byte >> 4) == 0x0F:
                    break
            operands.append(0.0)
        elif b0 == 12 and i + 1 < n:
            out[0xC00 | data[i + 1]] = operands
            operands = []
            i += 2
        elif b0 <= 21:
            out[b0] = operands
            operands = []
            i += 1
        else:
            return out  # malformed: keep what parsed
    return out


class CffNames:
    """code -> glyph name view of one Type1C font program."""

    __slots__ = ("gid_names", "enc_code_to_gid", "sup_code_to_name")

    def __init__(self) -> None:
        self.gid_names: list[Optional[str]] = []
        # None = the CFF's standard encoding (resolve via the shared
        # StandardEncoding name table, no gid hop needed)
        self.enc_code_to_gid: Optional[dict[int, int]] = None
        self.sup_code_to_name: dict[int, str] = {}

    def gid_to_name(self, gid: int) -> Optional[str]:
        if 0 <= gid < len(self.gid_names):
            return self.gid_names[gid]
        return None

    def code_to_name(self, code: int) -> Optional[str]:
        sup = self.sup_code_to_name.get(code)
        if sup is not None:
            return sup
        if self.enc_code_to_gid is None:
            return STANDARD_ENCODING.get(code)
        gid = self.enc_code_to_gid.get(code)
        if gid is None:
            return None
        return self.gid_to_name(gid)


def _sid_name(sid: int, strings: list) -> Optional[str]:
    if sid < _N_STD:
        return STANDARD_STRINGS[sid]
    k = sid - 391
    if 0 <= k < len(strings):
        try:
            return strings[k].decode("latin-1")
        except Exception:  # noqa: BLE001 — malformed custom string
            return None
    return None  # expert-set SIDs 229-390 (no text value) or out of range


def parse_cff_names(data: bytes) -> Optional[CffNames]:
    """Parse a bare CFF font program's charset + encoding into a
    :class:`CffNames`. Returns None on anything unparseable or on
    CID-keyed fonts (ROS present) — callers fall through to the next
    decode source, the same contract as :func:`sfnt.parse_sfnt_cmaps`."""
    try:
        return _parse(data)
    except Exception:  # noqa: BLE001 — font data is attacker-controlled
        return None


def _parse(data: bytes) -> Optional[CffNames]:
    if len(data) < 4 or data[0] != 1:
        return None  # major version must be 1
    hdr_size = data[2]
    r = _read_index(data, hdr_size)  # Name INDEX
    if r is None:
        return None
    r = _read_index(data, r[1])  # Top DICT INDEX
    if r is None or not r[0]:
        return None
    top = _parse_dict(r[0][0])
    r = _read_index(data, r[1])  # String INDEX
    if r is None:
        return None
    strings = r[0]
    if (0xC00 | 30) in top:  # ROS: CID-keyed, charset is GID->CID
        return None
    cs_off = top.get(17)  # CharStrings
    if not cs_off or not isinstance(cs_off[-1], int):
        return None
    r = _read_index(data, cs_off[-1])
    if r is None:
        return None
    n_glyphs = len(r[0])
    if n_glyphs == 0 or n_glyphs > 0xFFFF:
        return None

    out = CffNames()
    out.gid_names = _read_charset(
        data, (top.get(15) or [0])[-1], n_glyphs, strings
    )
    _read_encoding(data, (top.get(16) or [0])[-1], out, strings)
    return out


def _read_charset(
    data: bytes, off, n_glyphs: int, strings: list
) -> list[Optional[str]]:
    names: list[Optional[str]] = [".notdef"] + [None] * (n_glyphs - 1)
    if off == 0:
        # predefined ISOAdobe: SID = GID for the standard range
        for gid in range(1, min(n_glyphs, _N_STD)):
            names[gid] = STANDARD_STRINGS[gid]
        return names
    if not isinstance(off, int) or off in (1, 2):
        # Expert/ExpertSubset predefined charsets: expert-set names only,
        # no text value — leave unnamed (fall through to other sources)
        return names
    if off + 1 > len(data):
        return names
    fmt = data[off]
    p = off + 1
    gid = 1
    if fmt == 0:
        while gid < n_glyphs and p + 2 <= len(data):
            names[gid] = _sid_name(_u16(data, p), strings)
            gid += 1
            p += 2
    elif fmt in (1, 2):
        step = 3 if fmt == 1 else 4
        while gid < n_glyphs and p + step <= len(data):
            sid = _u16(data, p)
            n_left = data[p + 2] if fmt == 1 else _u16(data, p + 2)
            for k in range(n_left + 1):
                if gid >= n_glyphs:
                    break
                names[gid] = _sid_name(sid + k, strings)
                gid += 1
            p += step
    return names


def _read_encoding(data: bytes, off, out: CffNames, strings: list) -> None:
    if off == 0 or not isinstance(off, int):
        out.enc_code_to_gid = None  # standard encoding
        return
    if off == 1:
        # expert encoding: expert-set names only — treat as unmapped
        out.enc_code_to_gid = {}
        return
    if off + 2 > len(data):
        out.enc_code_to_gid = {}
        return
    fmt = data[off]
    enc: dict[int, int] = {}
    p = off + 1
    if (fmt & 0x7F) == 0:
        n_codes = data[p]
        p += 1
        for i in range(n_codes):
            if p >= len(data):
                break
            enc[data[p]] = i + 1  # code of glyph i+1
            p += 1
    elif (fmt & 0x7F) == 1:
        n_ranges = data[p]
        p += 1
        gid = 1
        for _ in range(n_ranges):
            if p + 2 > len(data):
                break
            first = data[p]
            n_left = data[p + 1]
            for k in range(n_left + 1):
                if first + k <= 0xFF:
                    enc[first + k] = gid
                gid += 1
            p += 2
    out.enc_code_to_gid = enc
    if fmt & 0x80:
        # supplements: (code u8, SID u16) pairs mapping codes directly
        if p < len(data):
            n_sups = data[p]
            p += 1
            for _ in range(n_sups):
                if p + 3 > len(data):
                    break
                name = _sid_name(_u16(data, p + 1), strings)
                if name is not None:
                    out.sup_code_to_name[data[p]] = name
                p += 3
