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

# -- Built-in encodings of the two symbolic base-14 fonts --------------------
#
# Symbol and ZapfDingbats do NOT use the standard Latin encodings: their
# code->glyph tables are the fonts' own built-in encodings (PDF 32000-1
# Annex D.5 / D.6 — public tables). A PDF that selects them typically has
# no /Encoding entry at all (symbolic fonts, §9.6.6.2), so without these
# tables every bullet, Greek letter, and math operator decodes through the
# StandardEncoding/latin-1 fallback to the WRONG character (e.g. Symbol
# code 0x61 'alpha' would read back as 'a'). The reference has no table
# for either (fonts/encoding.c carries only the three Latin encodings) —
# this is an EXTENSION, motivated by how common Symbol bullets are in real
# office-exported PDFs.

# Symbol (Annex D.5): ASCII slots carry Greek + math operator glyph names.
# The glyph-fragment rows (bracket/brace/integral extenders 0xE2..0xFE,
# radicalex 0x60) are omitted — they have no text meaning and fall through
# to the U+FFFD path.
SYMBOL_ENCODING: dict[int, str] = {
    0x20: "space", 0x21: "exclam", 0x22: "universal", 0x23: "numbersign",
    0x24: "existential", 0x25: "percent", 0x26: "ampersand",
    0x27: "suchthat", 0x28: "parenleft", 0x29: "parenright",
    0x2A: "asteriskmath", 0x2B: "plus", 0x2C: "comma", 0x2D: "minus",
    0x2E: "period", 0x2F: "slash",
    0x3A: "colon", 0x3B: "semicolon", 0x3C: "less", 0x3D: "equal",
    0x3E: "greater", 0x3F: "question", 0x40: "congruent",
    0x5B: "bracketleft", 0x5C: "therefore", 0x5D: "bracketright",
    0x5E: "perpendicular", 0x5F: "underscore",
    0x7B: "braceleft", 0x7C: "bar", 0x7D: "braceright", 0x7E: "similar",
    # high range: math/symbol rows (text-meaningful subset)
    0xA0: "Euro", 0xA1: "Upsilon1", 0xA2: "minute", 0xA3: "lessequal",
    0xA4: "fraction", 0xA5: "infinity", 0xA6: "florin", 0xA7: "club",
    0xA8: "diamond", 0xA9: "heart", 0xAA: "spade", 0xAB: "arrowboth",
    0xAC: "arrowleft", 0xAD: "arrowup", 0xAE: "arrowright",
    0xAF: "arrowdown", 0xB0: "degree", 0xB1: "plusminus", 0xB2: "second",
    0xB3: "greaterequal", 0xB4: "multiply", 0xB5: "proportional",
    0xB6: "partialdiff", 0xB7: "bullet", 0xB8: "divide", 0xB9: "notequal",
    0xBA: "equivalence", 0xBB: "approxequal", 0xBC: "ellipsis",
    0xBF: "carriagereturn", 0xC0: "aleph", 0xC1: "Ifraktur",
    0xC2: "Rfraktur", 0xC3: "weierstrass", 0xC4: "circlemultiply",
    0xC5: "circleplus", 0xC6: "emptyset", 0xC7: "intersection",
    0xC8: "union", 0xC9: "propersuperset", 0xCA: "reflexsuperset",
    0xCB: "notsubset", 0xCC: "propersubset", 0xCD: "reflexsubset",
    0xCE: "element", 0xCF: "notelement", 0xD0: "angle", 0xD1: "gradient",
    0xD2: "registerserif", 0xD3: "copyrightserif", 0xD4: "trademarkserif",
    0xD5: "product", 0xD6: "radical", 0xD7: "dotmath", 0xD8: "logicalnot",
    0xD9: "logicaland", 0xDA: "logicalor", 0xDB: "arrowdblboth",
    0xDC: "arrowdblleft", 0xDD: "arrowdblup", 0xDE: "arrowdblright",
    0xDF: "arrowdbldown", 0xE0: "lozenge", 0xE1: "angleleft",
    0xF1: "angleright", 0xE5: "summation",
}
for _k in range(10):  # digits keep their slots
    SYMBOL_ENCODING[0x30 + _k] = (
        "zero one two three four five six seven eight nine".split()[_k]
    )
# Greek letters at the Latin letter slots (the Symbol layout: X=Chi, Q=Theta,
# W=Omega, J/j carry the variant theta/phi forms, v = variant pi)
_SYMBOL_UPPER = (
    "Alpha Beta Chi Delta Epsilon Phi Gamma Eta Iota theta1 Kappa Lambda "
    "Mu Nu Omicron Pi Theta Rho Sigma Tau Upsilon sigma1 Omega Xi Psi Zeta"
).split()
_SYMBOL_LOWER = (
    "alpha beta chi delta epsilon phi gamma eta iota phi1 kappa lambda "
    "mu nu omicron pi theta rho sigma tau upsilon omega1 omega xi psi zeta"
).split()
for _k in range(26):
    SYMBOL_ENCODING[0x41 + _k] = _SYMBOL_UPPER[_k]
    SYMBOL_ENCODING[0x61 + _k] = _SYMBOL_LOWER[_k]

# ZapfDingbats (Annex D.6): the Unicode Dingbats block U+2701..U+275E was
# taken from this font IN CODE ORDER, except the four glyphs Unicode 1.0
# already had in Miscellaneous Symbols (telephone, the two pointing hands,
# black star) — their block slots (U+2705/270A/270B/2728) stayed empty for
# two decades. Names are the Adobe aN series (zapfdingbats.txt, public).
_ZAPF_NAMES = (
    "a1 a2 a202 a3 a4 a5 a119 a118 a117 a11 a12 a13 a14 a15 a16 a105 "
    "a17 a18 a19 a20 a21 a22 a23 a24 a25 a26 a27 a28 a6 a7 a8 a9 a10 "
    "a29 a30 a31 a32 a33 a34 a35 a36 a37 a38 a39 a40 a41 a42 a43 a44 "
    "a45 a46 a47 a48 a49 a50 a51 a52 a53 a54 a55 a56 a57 a58 a59 a60 "
    "a61 a62 a63 a64 a65 a66 a67 a68 a69 a70 a71 a72 a73 a74 a203 a75 "
    "a204 a76 a77 a78 a79 a81 a82 a83 a84 a97 a98 a99 a100"
).split()
_ZAPF_UNICODE_EXCEPTIONS = {
    # Miscellaneous Symbols block (their Dingbats slots 2705/270A/270B/2728
    # stayed empty until Unicode 6.0 reused them for emoji)
    0x25: 0x260E,  # a4  black telephone
    0x2A: 0x261B,  # a11 black right pointing index
    0x2B: 0x261E,  # a12 white right pointing index
    0x48: 0x2605,  # a35 black star
    # Geometric Shapes block (slots 274C/274E/2753-2755 likewise)
    0x6C: 0x25CF,  # a71 black circle
    0x6E: 0x25A0,  # a73 black square
    0x73: 0x25B2,  # a76 black up-pointing triangle
    0x74: 0x25BC,  # a77 black down-pointing triangle
    0x75: 0x25C6,  # a78 black diamond
}
ZAPF_DINGBATS_ENCODING: dict[int, str] = {0x20: "space"}
for _k, _n in enumerate(_ZAPF_NAMES):
    _code = 0x21 + _k
    ZAPF_DINGBATS_ENCODING[_code] = _n

# built-in encodings selected by (subset-stripped) BaseFont name when a
# simple font carries no usable /Encoding (§9.6.6.2: symbolic fonts use
# the font program's built-in encoding)
BUILTIN_FONT_ENCODINGS = {
    "Symbol": SYMBOL_ENCODING,
    "ZapfDingbats": ZAPF_DINGBATS_ENCODING,
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
    # Latin-1 names NOT reachable via the WinAnsi table below (WinAnsi
    # drops these codes); needed by the CFF standard-strings set (SIDs
    # 150-228) and by /Differences arrays
    "onesuperior": "¹", "twosuperior": "²", "threesuperior": "³",
    "onehalf": "½", "onequarter": "¼", "threequarters": "¾",
    "Eth": "Ð", "eth": "ð", "Thorn": "Þ", "thorn": "þ",
    "Zcaron": "Ž", "zcaron": "ž",
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

# Symbol-font glyph names (AGL 2.0 math/symbol block; the variant letter
# forms keep their U+03D* codepoints). The three *serif/*sans aliases map
# to the plain marks — AGL sends them to PUA, text consumers want ®©™.
AGL.update({
    "universal": "∀", "existential": "∃", "suchthat": "∋",
    "asteriskmath": "∗", "congruent": "≅", "therefore": "∴",
    "perpendicular": "⊥", "similar": "∼", "Upsilon1": "ϒ",
    "minute": "′", "second": "″", "club": "♣", "diamond": "♦",
    "heart": "♥", "spade": "♠", "arrowboth": "↔", "arrowleft": "←",
    "arrowup": "↑", "arrowright": "→", "arrowdown": "↓",
    "proportional": "∝", "equivalence": "≡", "carriagereturn": "↵",
    "aleph": "ℵ", "Ifraktur": "ℑ", "Rfraktur": "ℜ", "weierstrass": "℘",
    "circlemultiply": "⊗", "circleplus": "⊕", "emptyset": "∅",
    "intersection": "∩", "union": "∪", "propersuperset": "⊃",
    "reflexsuperset": "⊇", "notsubset": "⊄", "propersubset": "⊂",
    "reflexsubset": "⊆", "element": "∈", "notelement": "∉",
    "angle": "∠", "gradient": "∇", "dotmath": "⋅", "logicaland": "∧",
    "logicalor": "∨", "arrowdblboth": "⇔", "arrowdblleft": "⇐",
    "arrowdblup": "⇑", "arrowdblright": "⇒", "arrowdbldown": "⇓",
    "angleleft": "〈", "angleright": "〉",
    "registerserif": "®", "copyrightserif": "©", "trademarkserif": "™",
    "registersans": "®", "copyrightsans": "©", "trademarksans": "™",
})

# ZapfDingbats aN names -> Unicode via the in-code-order rule (see
# ZAPF_DINGBATS_ENCODING above for the derivation + the four exceptions)
for _k, _n in enumerate(_ZAPF_NAMES):
    AGL.setdefault(
        _n, chr(_ZAPF_UNICODE_EXCEPTIONS.get(0x21 + _k, 0x2701 + _k))
    )


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
