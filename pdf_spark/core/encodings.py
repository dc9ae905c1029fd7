"""Simple-font encodings + AGL glyph-name -> Unicode mapping.

The reference maps ``code -> glyph name`` through built-in encoding tables
(MacRoman/MacExpert/WinAnsi + /Differences overrides,
/root/reference/libs/pdf/src/fonts/encoding.c:432-520) and then
``glyph name -> Unicode`` through the Adobe Glyph List asset
(assets/agl-aglfn/glyphlist.txt, parsed at fonts/agl.c:27-…). We embed
these *public-spec* tables (PDF 32000-1 Annex D; AGL 2.0) directly:
Standard/WinAnsi in full, MacRoman including the complete 128-255 high
range, MacExpert for the text-meaningful rows, the AGL names every 8-bit
encoding in Annex D can reach, PLUS the non-Latin AGL blocks real-world
``/Differences`` arrays use: Greek letter names, the Cyrillic ``afii*``
runs (Russian + Ukrainian/Serbian extensions), and the expert-set
smallcap/oldstyle names. Unknown names fall back to the AGL algorithm's
``uniXXXX``/``uXXXX[XX]`` rule, then to U+FFFD.
"""

from __future__ import annotations

from typing import Optional

_ASCII_NAMES = {
    32: "space", 33: "exclam", 34: "quotedbl", 35: "numbersign",
    36: "dollar", 37: "percent", 38: "ampersand", 40: "parenleft",
    41: "parenright", 42: "asterisk", 43: "plus", 44: "comma",
    45: "hyphen", 46: "period", 47: "slash", 48: "zero", 49: "one",
    50: "two", 51: "three", 52: "four", 53: "five", 54: "six",
    55: "seven", 56: "eight", 57: "nine", 58: "colon", 59: "semicolon",
    60: "less", 61: "equal", 62: "greater", 63: "question", 64: "at",
    91: "bracketleft", 92: "backslash", 93: "bracketright",
    94: "asciicircum", 95: "underscore", 123: "braceleft", 124: "bar",
    125: "braceright", 126: "asciitilde",
}
for _c in range(65, 91):
    _ASCII_NAMES[_c] = chr(_c)
for _c in range(97, 123):
    _ASCII_NAMES[_c] = chr(_c)

# StandardEncoding: ASCII range with the two quote quirks (Annex D.2)
STANDARD_ENCODING: dict[int, str] = dict(_ASCII_NAMES)
STANDARD_ENCODING[39] = "quoteright"
STANDARD_ENCODING[96] = "quoteleft"

# WinAnsiEncoding: cp1252-shaped (Annex D.2); high range subset
WIN_ANSI_ENCODING: dict[int, str] = dict(_ASCII_NAMES)
WIN_ANSI_ENCODING[39] = "quotesingle"
WIN_ANSI_ENCODING[96] = "grave"
WIN_ANSI_ENCODING.update({
    128: "Euro", 130: "quotesinglbase", 131: "florin", 132: "quotedblbase",
    133: "ellipsis", 134: "dagger", 135: "daggerdbl", 136: "circumflex",
    137: "perthousand", 138: "Scaron", 139: "guilsinglleft", 140: "OE",
    145: "quoteleft", 146: "quoteright", 147: "quotedblleft",
    148: "quotedblright", 149: "bullet", 150: "endash", 151: "emdash",
    152: "tilde", 153: "trademark", 154: "scaron", 155: "guilsinglright",
    156: "oe", 159: "Ydieresis", 161: "exclamdown", 162: "cent",
    163: "sterling", 164: "currency", 165: "yen", 166: "brokenbar",
    167: "section", 168: "dieresis", 169: "copyright", 170: "ordfeminine",
    171: "guillemotleft", 172: "logicalnot", 173: "hyphen",
    174: "registered", 175: "macron", 176: "degree", 177: "plusminus",
    180: "acute", 181: "mu", 182: "paragraph", 183: "periodcentered",
    184: "cedilla", 186: "ordmasculine", 187: "guillemotright",
    191: "questiondown", 192: "Agrave", 193: "Aacute", 194: "Acircumflex",
    195: "Atilde", 196: "Adieresis", 197: "Aring", 198: "AE",
    199: "Ccedilla", 200: "Egrave", 201: "Eacute", 202: "Ecircumflex",
    203: "Edieresis", 204: "Igrave", 205: "Iacute", 206: "Icircumflex",
    207: "Idieresis", 209: "Ntilde", 210: "Ograve", 211: "Oacute",
    212: "Ocircumflex", 213: "Otilde", 214: "Odieresis", 216: "Oslash",
    217: "Ugrave", 218: "Uacute", 219: "Ucircumflex", 220: "Udieresis",
    221: "Yacute", 223: "germandbls", 224: "agrave", 225: "aacute",
    226: "acircumflex", 227: "atilde", 228: "adieresis", 229: "aring",
    230: "ae", 231: "ccedilla", 232: "egrave", 233: "eacute",
    234: "ecircumflex", 235: "edieresis", 236: "igrave", 237: "iacute",
    238: "icircumflex", 239: "idieresis", 241: "ntilde", 242: "ograve",
    243: "oacute", 244: "ocircumflex", 245: "otilde", 246: "odieresis",
    248: "oslash", 249: "ugrave", 250: "uacute", 251: "ucircumflex",
    252: "udieresis", 253: "yacute", 255: "ydieresis",
})

# MacRoman: ASCII low range + the full 128-255 high range (PDF 32000-1
# Annex D.2 / classic Mac OS Roman layout — public-spec data)
MAC_ROMAN_ENCODING: dict[int, str] = dict(_ASCII_NAMES)
MAC_ROMAN_ENCODING[39] = "quotesingle"
MAC_ROMAN_ENCODING[96] = "grave"
MAC_ROMAN_ENCODING.update({
    128: "Adieresis", 129: "Aring", 130: "Ccedilla", 131: "Eacute",
    132: "Ntilde", 133: "Odieresis", 134: "Udieresis", 135: "aacute",
    136: "agrave", 137: "acircumflex", 138: "adieresis", 139: "atilde",
    140: "aring", 141: "ccedilla", 142: "eacute", 143: "egrave",
    144: "ecircumflex", 145: "edieresis", 146: "iacute", 147: "igrave",
    148: "icircumflex", 149: "idieresis", 150: "ntilde", 151: "oacute",
    152: "ograve", 153: "ocircumflex", 154: "odieresis", 155: "otilde",
    156: "uacute", 157: "ugrave", 158: "ucircumflex", 159: "udieresis",
    160: "dagger", 161: "degree", 162: "cent", 163: "sterling",
    164: "section", 165: "bullet", 166: "paragraph", 167: "germandbls",
    168: "registered", 169: "copyright", 170: "trademark", 171: "acute",
    172: "dieresis", 173: "notequal", 174: "AE", 175: "Oslash",
    176: "infinity", 177: "plusminus", 178: "lessequal", 179: "greaterequal",
    180: "yen", 181: "mu", 182: "partialdiff", 183: "summation",
    184: "product", 185: "pi", 186: "integral", 187: "ordfeminine",
    188: "ordmasculine", 189: "Omega", 190: "ae", 191: "oslash",
    192: "questiondown", 193: "exclamdown", 194: "logicalnot",
    195: "radical", 196: "florin", 197: "approxequal", 198: "Delta",
    199: "guillemotleft", 200: "guillemotright", 201: "ellipsis",
    202: "space", 203: "Agrave", 204: "Atilde", 205: "Otilde", 206: "OE",
    207: "oe", 208: "endash", 209: "emdash", 210: "quotedblleft",
    211: "quotedblright", 212: "quoteleft", 213: "quoteright",
    214: "divide", 215: "lozenge", 216: "ydieresis", 217: "Ydieresis",
    218: "fraction", 219: "currency", 220: "guilsinglleft",
    221: "guilsinglright", 222: "fi", 223: "fl", 224: "daggerdbl",
    225: "periodcentered", 226: "quotesinglbase", 227: "quotedblbase",
    228: "perthousand", 229: "Acircumflex", 230: "Ecircumflex",
    231: "Aacute", 232: "Edieresis", 233: "Egrave", 234: "Iacute",
    235: "Icircumflex", 236: "Idieresis", 237: "Igrave", 238: "Oacute",
    239: "Ocircumflex", 240: "apple", 241: "Ograve", 242: "Uacute",
    243: "Ucircumflex", 244: "Ugrave", 245: "dotlessi", 246: "circumflex",
    247: "tilde", 248: "macron", 249: "breve", 250: "dotaccent",
    251: "ring", 252: "cedilla", 253: "hungarumlaut", 254: "ogonek",
    255: "caron",
})

# MacExpertEncoding (PDF 32000-1 Annex D.4): expert-set glyphs — small
# capitals, oldstyle figures, superiors/inferiors, fractions. The layout
# below is the Annex D table for the rows extraction can use; codes whose
# glyphs have no text meaning (ornaments) are omitted and fall through to
# the U+FFFD path. DIVERGENCE (documented): AGL maps most expert names into
# the Private Use Area (Asmall -> U+F761 etc., what the reference's
# glyphlist.txt load produces, fonts/encoding.c:13-431 + agl.c); extraction
# maps them to their TEXT equivalents instead — a small-cap A reads as
# 'a', an oldstyle 7 as '7' — because PUA codepoints are useless to every
# downstream text consumer.
MAC_EXPERT_ENCODING: dict[int, str] = {32: "space"}
for _k in range(10):  # 0x30..0x39: zerooldstyle..nineoldstyle
    _dig = ("zero one two three four five six seven eight nine").split()[_k]
    MAC_EXPERT_ENCODING[0x30 + _k] = f"{_dig}oldstyle"
for _k in range(26):  # 0x61..0x7A: Asmall..Zsmall (small capitals)
    MAC_EXPERT_ENCODING[0x61 + _k] = chr(65 + _k) + "small"
MAC_EXPERT_ENCODING.update({
    0x21: "exclamsmall", 0x26: "ampersandsmall", 0x27: "centoldstyle",
    0x2C: "comma", 0x2D: "hyphen", 0x2E: "period", 0x2F: "fraction",
    0x3A: "colon", 0x3B: "semicolon", 0x3F: "questionsmall",
})

BASE_ENCODINGS = {
    "StandardEncoding": STANDARD_ENCODING,
    "WinAnsiEncoding": WIN_ANSI_ENCODING,
    "MacRomanEncoding": MAC_ROMAN_ENCODING,
    "MacExpertEncoding": MAC_EXPERT_ENCODING,
}

# AGL subset: glyph name -> unicode char (AGL 2.0, public)
AGL: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "braceleft": "{", "bar": "|", "braceright": "}",
    "asciitilde": "~", "quoteright": "’", "quoteleft": "‘",
    "grave": "`", "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "ellipsis": "…",
    "bullet": "•", "dagger": "†", "daggerdbl": "‡",
    "perthousand": "‰", "trademark": "™", "Euro": "€",
    "florin": "ƒ", "circumflex": "ˆ", "tilde": "˜",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "OE": "Œ", "oe": "œ", "Scaron": "Š", "scaron": "š",
    "Ydieresis": "Ÿ", "fi": "ﬁ", "fl": "ﬂ",
    "dotlessi": "ı", "lslash": "ł", "Lslash": "Ł",
    # math/symbol names used by the MacRoman high range (AGL 2.0)
    "notequal": "≠", "infinity": "∞", "lessequal": "≤",
    "greaterequal": "≥", "partialdiff": "∂", "summation": "∑",
    "product": "∏", "pi": "π", "integral": "∫", "Omega": "Ω",
    "radical": "√", "approxequal": "≈", "Delta": "∆", "divide": "÷",
    "multiply": "×", "lozenge": "◊", "fraction": "⁄", "apple": "",
    "breve": "˘", "dotaccent": "˙", "ring": "˚", "hungarumlaut": "˝",
    "ogonek": "˛", "caron": "ˇ", "minus": "−", "nbspace": " ",
}
for _c in range(65, 91):
    AGL[chr(_c)] = chr(_c)
for _c in range(97, 123):
    AGL[chr(_c)] = chr(_c)
# Latin-1 high range names (exclamdown..ydieresis) map to their latin-1 chars
for _code, _name in WIN_ANSI_ENCODING.items():
    if _code >= 161 and _name not in AGL:
        AGL[_name] = chr(_code)

# -- AGL non-Latin blocks (AGL 2.0, public Adobe asset; the reference loads
# the same mapping from assets/agl-aglfn/glyphlist.txt via fonts/agl.c) --

# Greek: plain letter names map to the Greek block. NOTE the three AGL
# legacy quirks already present above (Delta -> U+2206 increment,
# Omega -> ohm-adjacent, mu -> micro, pi -> U+03C0) keep their entries;
# setdefault never overwrites them.
_GREEK_UPPER = (
    "Alpha Beta Gamma Delta Epsilon Zeta Eta Theta Iota Kappa Lambda Mu "
    "Nu Xi Omicron Pi Rho  Sigma Tau Upsilon Phi Chi Psi Omega"
).split()  # index 17 ('') skipped below: U+03A2 is unassigned
_GREEK_LOWER = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
    "nu xi omicron pi rho sigmafinal sigma tau upsilon phi chi psi omega"
).split()
for _k, _n in enumerate(_GREEK_UPPER):
    AGL.setdefault(_n, chr(0x0391 + _k + (1 if _k >= 17 else 0)))
for _k, _n in enumerate(_GREEK_LOWER):
    AGL.setdefault(_n, chr(0x03B1 + _k))
AGL.setdefault("sigma1", "ς")      # AGL name for final sigma
AGL.setdefault("theta1", "ϑ")
AGL.setdefault("phi1", "ϕ")
AGL.setdefault("omega1", "ϖ")

# Cyrillic: the afii run (AGL 2.0). Uppercase afii10017..10049 covers
# А..Я with Ё (U+0401) interleaved at afii10023; lowercase afii10065..10097
# is the same layout at а../ё (U+0451).
def _cyr(base: int, yo: int, k: int) -> str:
    if k == 6:
        return chr(yo)
    return chr(base + k - (1 if k > 6 else 0))


for _k in range(33):
    AGL.setdefault(f"afii{10017 + _k}", _cyr(0x0410, 0x0401, _k))
    AGL.setdefault(f"afii{10065 + _k}", _cyr(0x0430, 0x0451, _k))
# extended Cyrillic (Ukrainian/Serbian/Macedonian/Belarusian) afii names
_CYR_EXT_UPPER = {
    10050: 0x0490, 10051: 0x0402, 10052: 0x0403, 10053: 0x0404,
    10054: 0x0405, 10055: 0x0406, 10056: 0x0407, 10057: 0x0408,
    10058: 0x0409, 10059: 0x040A, 10060: 0x040B, 10061: 0x040C,
    10062: 0x040E, 10145: 0x040F,
}
_CYR_EXT_LOWER = {
    10098: 0x0491, 10099: 0x0452, 10100: 0x0453, 10101: 0x0454,
    10102: 0x0455, 10103: 0x0456, 10104: 0x0457, 10105: 0x0458,
    10106: 0x0459, 10107: 0x045A, 10108: 0x045B, 10109: 0x045C,
    10110: 0x045E, 10193: 0x045F,
}
for _a, _u in {**_CYR_EXT_UPPER, **_CYR_EXT_LOWER}.items():
    AGL.setdefault(f"afii{_a}", chr(_u))
AGL.setdefault("afii61352", "№")
AGL.setdefault("afii00208", "―")  # horizontal bar

# Expert-set names -> TEXT equivalents (divergence from AGL's Private Use
# Area codepoints; rationale at MAC_EXPERT_ENCODING above)
for _k, _dig in enumerate(
    "zero one two three four five six seven eight nine".split()
):
    AGL.setdefault(f"{_dig}oldstyle", str(_k))
for _k in range(26):
    AGL.setdefault(chr(65 + _k) + "small", chr(97 + _k))
AGL.setdefault("exclamsmall", "!")
AGL.setdefault("questionsmall", "?")
AGL.setdefault("ampersandsmall", "&")
AGL.setdefault("centoldstyle", "¢")
AGL.setdefault("onefitted", "1")


def glyph_name_to_unicode(name: str) -> Optional[str]:
    """AGL algorithm: table lookup, then uniXXXX / uXXXX(XX) forms."""
    u = AGL.get(name)
    if u is not None:
        return u
    if name.startswith("uni") and len(name) >= 7:
        try:
            return "".join(
                chr(int(name[i : i + 4], 16)) for i in range(3, len(name), 4)
            )
        except ValueError:
            return None
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return None
    return None


# -- PDF text strings (PDF 32000-1 §7.9.2.2 + Annex D.3) ---------------------
#
# Strings OUTSIDE content streams' show operators (ActualText, outlines,
# document info) are "text strings": UTF-16BE with a FEFF BOM, else
# PDFDocEncoding. PDF 2.0 (ISO 32000-2 §7.9.2.2) additionally allows a
# UTF-8 BOM; UTF-16LE appears in the wild from sloppy producers and is
# sniffed too. PDFDocEncoding is Latin-1 except the 0x18-0x1F accent row,
# the 0x80-0x9E publishing block, and 0xA0 = EURO (Table D.2); the
# undefined codes 0x7F/0x9F decode to U+FFFD.

_PDFDOC_DIFF = {
    0x18: "˘", 0x19: "ˇ", 0x1a: "ˆ", 0x1b: "˙",
    0x1c: "˝", 0x1d: "˛", 0x1e: "˚", 0x1f: "˜",
    0x7f: "�",
    0x80: "•", 0x81: "†", 0x82: "‡", 0x83: "…",
    0x84: "—", 0x85: "–", 0x86: "ƒ", 0x87: "⁄",
    0x88: "‹", 0x89: "›", 0x8a: "−", 0x8b: "‰",
    0x8c: "„", 0x8d: "“", 0x8e: "”", 0x8f: "‘",
    0x90: "’", 0x91: "‚", 0x92: "™", 0x93: "ﬁ",
    0x94: "ﬂ", 0x95: "Ł", 0x96: "Œ", 0x97: "Š",
    0x98: "Ÿ", 0x99: "Ž", 0x9a: "ı", 0x9b: "ł",
    0x9c: "œ", 0x9d: "š", 0x9e: "ž", 0x9f: "�",
    0xa0: "€",
}


def decode_text_string(raw: bytes) -> str:
    """Decode a PDF text string: BOM-sniffed UTF-16BE/LE/UTF-8, else
    PDFDocEncoding. Never raises (malformed UTF-16 -> U+FFFD)."""
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace")
    if raw[:2] == b"\xff\xfe":
        return raw[2:].decode("utf-16-le", "replace")
    if raw[:3] == b"\xef\xbb\xbf":
        return raw[3:].decode("utf-8", "replace")
    return raw.decode("latin-1").translate(_PDFDOC_DIFF)
