"""Minimal sfnt (TrueType) ``cmap`` table reader for text decode fallback.

The reference parses the full sfnt table directory and cmap subtable
formats 0/4/6 to map character codes to glyph ids for *rendering*
(/root/reference/libs/sfnt/src/cmap.c:30-91, render/font.c:89-248); we
additionally read format 12 (supplementary-plane coverage, which the
reference lacks). For
extraction we need the same tables for a different purpose: a symbolic
TrueType font with no ToUnicode/Encoding can only be decoded by going
``code -> GID`` through its (3,0)/(1,0) cmap and then ``GID -> Unicode``
through the *inverse* of its (3,1)/(0,x) Unicode cmap. Only the cmap table
is read; glyf/loca/head stay untouched (glyph shapes are out of scope,
SURVEY.md §7.4).

All big-endian, per the OpenType/TrueType spec (public).
"""

from __future__ import annotations

from typing import Optional

import struct


def _u16(b: bytes, off: int) -> int:
    return (b[off] << 8) | b[off + 1]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from(">I", b, off)[0]


def _parse_subtable(data: bytes, off: int) -> Optional[dict[int, int]]:
    """One cmap subtable (formats 0, 4, 6) -> {code: gid}."""
    if off + 2 > len(data):
        return None
    fmt = _u16(data, off)
    if fmt == 0:
        # byte encoding table: 256 glyph ids
        if off + 6 + 256 > len(data):
            return None
        return {
            c: data[off + 6 + c]
            for c in range(256)
            if data[off + 6 + c] != 0
        }
    if fmt == 6:
        # trimmed table: firstCode + contiguous glyph run
        if off + 10 > len(data):
            return None
        first = _u16(data, off + 6)
        count = _u16(data, off + 8)
        if off + 10 + 2 * count > len(data):
            return None
        out = {}
        for k in range(count):
            gid = _u16(data, off + 10 + 2 * k)
            if gid:
                out[first + k] = gid
        return out
    if fmt == 4:
        # segment mapping to delta values
        if off + 14 > len(data):
            return None
        seg_x2 = _u16(data, off + 6)
        nseg = seg_x2 // 2
        ends = off + 14
        starts = ends + seg_x2 + 2  # +2: reservedPad
        deltas = starts + seg_x2
        range_offs = deltas + seg_x2
        if range_offs + seg_x2 > len(data):
            return None
        out = {}
        # Total-work cap: segCountX2 is attacker-controlled (up to ~32k
        # segments each spanning up to 65536 codes -> ~2e9 iterations from
        # one crafted FontFile2). The code space is 16-bit, so any honest
        # table visits <= 65536 codes; twice that tolerates overlapping
        # segments before we return the partial map (font falls through to
        # the next decode source for unvisited codes).
        visited_budget = 2 * 65536
        for s in range(nseg):
            end = _u16(data, ends + 2 * s)
            start = _u16(data, starts + 2 * s)
            delta = _u16(data, deltas + 2 * s)
            roff = _u16(data, range_offs + 2 * s)
            if start > end or (start == 0xFFFF and end == 0xFFFF):
                continue
            visited_budget -= end - start + 1
            if visited_budget < 0:
                break
            for code in range(start, end + 1):
                if roff == 0:
                    gid = (code + delta) & 0xFFFF
                else:
                    # glyphIdArray addressing relative to the rangeOffset slot
                    gpos = range_offs + 2 * s + roff + 2 * (code - start)
                    if gpos + 2 > len(data):
                        continue
                    gid = _u16(data, gpos)
                    if gid:
                        gid = (gid + delta) & 0xFFFF
                if gid:
                    out[code] = gid
        return out
    if fmt == 12:
        # segmented coverage: sequential-map groups of u32
        # (startCharCode, endCharCode, startGlyphID). EXTENSION beyond the
        # reference's 0/4/6 set (sfnt/src/cmap.c:30-91): modern fonts carry
        # format 12 for supplementary-plane text, which the symbolic /
        # CIDFontType2 inverse-Unicode fallback would otherwise miss.
        if off + 16 > len(data):
            return None
        ngroups = _u32(data, off + 12)
        if off + 16 + 12 * ngroups > len(data):
            return None
        out = {}
        # same total-work cap rationale as format 4: nGroups and per-group
        # spans are attacker-controlled; an honest font maps a bounded
        # character repertoire
        visited_budget = 2 * 65536
        for g in range(ngroups):
            base = off + 16 + 12 * g
            start = _u32(data, base)
            end = _u32(data, base + 4)
            gid0 = _u32(data, base + 8)
            if start > end or end > 0x10FFFF:
                continue
            if end - start + 1 > visited_budget:
                # clamp an oversized group to the remaining budget so one
                # whole-range group still yields a usable partial map
                end = start + visited_budget - 1
                if end < start:
                    break
            visited_budget -= end - start + 1
            for k in range(end - start + 1):
                gid = (gid0 + k) & 0xFFFF
                if gid:
                    out[start + k] = gid
        return out
    return None  # formats 2/8/10/13/14 not needed for the decode path


class SfntCmaps:
    """Parsed cmap views of one embedded font program."""

    __slots__ = ("symbol_map", "unicode_map", "gid_to_unicode")

    def __init__(self) -> None:
        self.symbol_map: dict[int, int] = {}  # (3,0) / (1,0): raw code -> gid
        self.unicode_map: dict[int, int] = {}  # (3,1) / (0,x): unicode -> gid
        self.gid_to_unicode: dict[int, str] = {}

    def decode_code(self, code: int) -> Optional[str]:
        """Symbolic decode: code -> gid (direct, then 0xF0xx symbol-area
        alias) -> inverse-Unicode."""
        gid = self.symbol_map.get(code)
        if gid is None:
            gid = self.symbol_map.get(0xF000 | code)
        if gid is None:
            gid = self.unicode_map.get(code)
        if gid is None:
            return None
        return self.gid_to_unicode.get(gid)

    def decode_gid(self, gid: int) -> Optional[str]:
        return self.gid_to_unicode.get(gid)


# The 258 standard Macintosh glyph names a `post` version-2.0 table
# indexes below 258 (OpenType spec, "Macintosh standard glyph ordering" —
# identical in Apple's TrueType reference manual). Indices 3..97 are the
# 95 printable ASCII glyphs in AGL-name form, which is why a subset font
# that keeps only the standard indices still decodes perfectly.
_MAC_GLYPH_ORDER = (
    ".notdef", ".null", "nonmarkingreturn", "space", "exclam", "quotedbl",
    "numbersign", "dollar", "percent", "ampersand", "quotesingle",
    "parenleft", "parenright", "asterisk", "plus", "comma", "hyphen",
    "period", "slash", "zero", "one", "two", "three", "four", "five",
    "six", "seven", "eight", "nine", "colon", "semicolon", "less",
    "equal", "greater", "question", "at",
    "A", "B", "C", "D", "E", "F", "G", "H", "I", "J", "K", "L", "M",
    "N", "O", "P", "Q", "R", "S", "T", "U", "V", "W", "X", "Y", "Z",
    "bracketleft", "backslash", "bracketright", "asciicircum",
    "underscore", "grave",
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
    "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z",
    "braceleft", "bar", "braceright", "asciitilde",
    "Adieresis", "Aring", "Ccedilla", "Eacute", "Ntilde", "Odieresis",
    "Udieresis", "aacute", "agrave", "acircumflex", "adieresis",
    "atilde", "aring", "ccedilla", "eacute", "egrave", "ecircumflex",
    "edieresis", "iacute", "igrave", "icircumflex", "idieresis",
    "ntilde", "oacute", "ograve", "ocircumflex", "odieresis", "otilde",
    "uacute", "ugrave", "ucircumflex", "udieresis", "dagger", "degree",
    "cent", "sterling", "section", "bullet", "paragraph", "germandbls",
    "registered", "copyright", "trademark", "acute", "dieresis",
    "notequal", "AE", "Oslash", "infinity", "plusminus", "lessequal",
    "greaterequal", "yen", "mu", "partialdiff", "summation", "product",
    "pi", "integral", "ordfeminine", "ordmasculine", "Omega", "ae",
    "oslash", "questiondown", "exclamdown", "logicalnot", "radical",
    "florin", "approxequal", "Delta", "guillemotleft", "guillemotright",
    "ellipsis", "nonbreakingspace", "Agrave", "Atilde", "Otilde", "OE",
    "oe", "endash", "emdash", "quotedblleft", "quotedblright",
    "quoteleft", "quoteright", "divide", "lozenge", "ydieresis",
    "Ydieresis", "fraction", "currency", "guilsinglleft",
    "guilsinglright", "fi", "fl", "daggerdbl", "periodcentered",
    "quotesinglbase", "quotedblbase", "perthousand", "Acircumflex",
    "Ecircumflex", "Aacute", "Edieresis", "Egrave", "Iacute",
    "Icircumflex", "Idieresis", "Igrave", "Oacute", "Ocircumflex",
    "apple", "Ograve", "Uacute", "Ucircumflex", "Ugrave", "dotlessi",
    "circumflex", "tilde", "macron", "breve", "dotaccent", "ring",
    "cedilla", "hungarumlaut", "ogonek", "caron", "Lslash", "lslash",
    "Scaron", "scaron", "Zcaron", "zcaron", "brokenbar", "Eth", "eth",
    "Yacute", "yacute", "Thorn", "thorn", "minus", "multiply",
    "onesuperior", "twosuperior", "threesuperior", "onehalf",
    "onequarter", "threequarters", "franc", "Gbreve", "gbreve",
    "Idotaccent", "Scedilla", "scedilla", "Cacute", "cacute", "Ccaron",
    "ccaron", "dcroat",
)

_POST_GLYPH_CAP = 65536


def _parse_post_names(data: bytes, off: int, length: int) -> dict[int, str]:
    """``post`` version-2.0 table -> {gid: glyph name}.

    Header (32 bytes: version, italicAngle, underline metrics, memory
    hints) + numberOfGlyphs + glyphNameIndex[n] + Pascal-string pool.
    Index < 258 = the standard Macintosh order above; >= 258 indexes the
    pool. Versions 1.0 (implicit standard order) map gid k -> name k for
    k < 258; 2.5/3.0 carry no usable names. Bounds-tolerant throughout —
    a truncated pool yields the names that fit."""
    end = min(off + length, len(data))
    if off + 4 > end:
        return {}
    version = _u32(data, off)
    out: dict[int, str] = {}
    if version == 0x00010000:
        # implicit standard ordering, 258 glyphs
        return dict(enumerate(_MAC_GLYPH_ORDER))
    if version != 0x00020000 or off + 34 > end:
        return {}
    n = min(_u16(data, off + 32), _POST_GLYPH_CAP)
    idx_base = off + 34
    if idx_base + 2 * n > end:
        n = max(0, (end - idx_base) // 2)
    indices = [_u16(data, idx_base + 2 * k) for k in range(n)]
    # pool: Pascal strings in order; custom index i = pool entry i-258
    pool: list[str] = []
    p = idx_base + 2 * n
    need = max((i - 258 for i in indices if i >= 258), default=-1)
    while p < end and len(pool) <= need:
        ln = data[p]
        pool.append(data[p + 1 : p + 1 + ln].decode("latin-1"))
        p += 1 + ln
    for gid, i in enumerate(indices):
        if i < 258:
            out[gid] = _MAC_GLYPH_ORDER[i]
        elif i - 258 < len(pool):
            out[gid] = pool[i - 258]
    return out


def parse_sfnt_cmaps(font_program: bytes) -> Optional[SfntCmaps]:
    """Locate the ``cmap`` (and ``post``) tables in an sfnt and parse the
    usable subtables.

    Returns None when there is neither a parseable cmap nor a named
    ``post`` (CFF-only OpenType without one, broken programs) — callers
    fall through to the next decode source. ``post`` glyph names feed
    ``gid -> Unicode`` through the AGL (subset-embedded symbolic fonts
    whose Unicode cmap the subsetter dropped routinely keep ``post`` —
    it is required for PostScript printing); the inverse Unicode cmap
    stays authoritative where both exist. The reference's sfnt reader
    has no post path (sfnt/src/cmap.c covers cmap only) — net-new, like
    format 12."""
    data = font_program
    if len(data) < 12:
        return None
    ntables = _u16(data, 4)
    cmap_off = None
    post_span = None
    pos = 12
    for _ in range(ntables):
        if pos + 16 > len(data):
            return None
        tag = data[pos : pos + 4]
        if tag == b"cmap":
            cmap_off = _u32(data, pos + 8)
        elif tag == b"post":
            post_span = (_u32(data, pos + 8), _u32(data, pos + 12))
        pos += 16
    out = SfntCmaps()
    if cmap_off is not None and cmap_off + 4 <= len(data):
        n_sub = _u16(data, cmap_off + 2)
        for i in range(n_sub):
            rec = cmap_off + 4 + 8 * i
            if rec + 8 > len(data):
                break
            plat = _u16(data, rec)
            enc = _u16(data, rec + 2)
            sub_off = cmap_off + _u32(data, rec + 4)
            table = _parse_subtable(data, sub_off)
            if table is None:
                continue
            if (plat, enc) in ((3, 0), (1, 0)):
                out.symbol_map.update(table)
            elif plat == 3 and enc in (1, 10) or plat == 0:
                out.unicode_map.update(table)
    # invert the Unicode view once; first (lowest) code point wins per gid
    for code in sorted(out.unicode_map, reverse=True):
        out.gid_to_unicode[out.unicode_map[code]] = chr(code)
    if post_span is not None and post_span[0] < len(data):
        from pdf_spark.core.encodings import glyph_name_to_unicode

        for gid, name in _parse_post_names(data, *post_span).items():
            if gid not in out.gid_to_unicode:
                u = glyph_name_to_unicode(name)
                if u is not None:
                    out.gid_to_unicode[gid] = u
    if not out.symbol_map and not out.unicode_map and not out.gid_to_unicode:
        return None
    return out
