"""CMap parsing: code -> CID and code -> Unicode (ToUnicode) tables.

The reference interprets CMap files with a full PostScript interpreter that
registers exactly the CIDInit ops ``usecmap begincodespacerange
begincidrange beginbfchar`` (+ their ``end*``; /root/reference/libs/pdf/src/
fonts/cmap.c:529-622). Per SURVEY.md §2.3 we implement a *data-driven*
parser over the same four section kinds instead of a PS interpreter — same
computed mapping, far less machinery. Tokens handled exactly as the PS
tokenizer does: ``%`` comments, ``<hex>`` strings, ``/names``, numbers,
``<< >>`` dicts (skipped), bare operators.

EXTENSIONS beyond the reference (documented divergences):
- ``beginbfrange``/``endbfrange`` — the reference lacks it (its own
  ``embedded.pdf`` fixture's ToUnicode uses bfrange, but the render path
  never consults ToUnicode for Type0 fonts); an extraction engine must.
- predefined ``Identity-H``/``Identity-V``, the Unicode-keyed
  ``Uni*-UCS2-H/V`` / ``Uni*-UTF16-H/V`` families, AND the legacy
  byte-oriented CJK families (``90ms-RKSJ-H``, ``GB-EUC-H``, ``GBK-EUC-H``,
  ``B5pc-H``, ``ETen-B5-H``, ``KSC-EUC-H``, ``KSCms-UHC-H`` + variants) are
  built in (the reference loads the whole Adobe set from the cmap-resources
  asset tree, fonts/cmap_paths.c:1-515 — an asset its own submodule ships
  empty). The legacy families carry mixed 1/2-byte codespace ranges and a
  stdlib charset codec: extraction needs code -> Unicode, which
  shift_jis/gbk/big5/euc_kr provide without the Adobe CID tables. Only
  EUC-TW (CNS-EUC-H) stays UNSUPPORTED_CMAP — CPython has no codec for it.

Lookup semantics mirror the reference: codespace ranges are recorded but the
Type0 code iterator always consumes 2 bytes (render/font.c:46-67 hardcodes
2-byte big-endian reads) — reproduced for parity.
"""

from __future__ import annotations

import re
from typing import Optional

from pdf_spark.core.errors import UNSUPPORTED_CMAP, PdfError

_TOKEN_RE = re.compile(
    rb"%[^\r\n]*"                      # comment
    rb"|<<|>>"                          # dict delims
    rb"|<[0-9a-fA-F\s]*>"              # hex string
    rb"|\[|\]"
    rb"|/[^\s<>\[\]{}/%()]*"           # name
    rb"|\([^)]*\)"                      # literal string (CMap metadata only)
    rb"|[^\s<>\[\]{}/%()]+"            # number / operator
)


class CMap:
    """Range tables + bf mappings (mirrors ``CMapTable``, cmap.c:60-78)."""

    __slots__ = (
        "name", "codespace", "cid_ranges", "bf_singles", "bf_ranges",
        "parent", "unicode_identity", "charset", "lead_lens", "wmode",
    )

    def __init__(self, name: str = "") -> None:
        self.name = name
        self.codespace: list[tuple[int, int, int]] = []  # (lo, hi, nbytes)
        self.cid_ranges: list[tuple[int, int, int]] = []  # (lo, hi, cid_base)
        self.bf_singles: dict[int, str] = {}
        # (lo, hi, dst_base, dst_nbytes) — nbytes preserved so >BMP
        # destinations re-render as UTF-16BE instead of one chr()
        self.bf_ranges: list[tuple[int, int, int, int]] = []
        self.parent: Optional[CMap] = None  # usecmap chain (cmap.c:176-205)
        # True for the UCS-2/UTF-16 predefined families: the SOURCE code is
        # itself the Unicode code point, so extraction can decode any BMP
        # code even where the embedded CID table is partial
        self.unicode_identity = False
        # legacy byte-oriented CJK families (90ms-RKSJ-H, GB-EUC-H, …):
        # the stdlib codec that maps raw code BYTES to Unicode, and the
        # per-lead-byte code length table derived from the codespace
        self.charset: Optional[str] = None
        self.lead_lens: Optional[tuple[int, ...]] = None
        # writing mode (PDF 32000-1 §9.7.5.1 /WMode): 0 horizontal,
        # 1 vertical. Predefined ``*-V`` names and embedded CMaps carrying
        # ``/WMode 1`` set it; the font layer turns it into a downward
        # advance and the extractor into column-major reading order.
        self.wmode = 0

    def build_lead_lens(self) -> Optional[tuple[int, ...]]:
        """Per-lead-byte code length (1 or 2) from the codespace ranges;
        None when every range is the fixed 2-byte form (the common Identity/
        UCS2 case keeps its unconditional 2-byte fast path). Lead bytes not
        covered by any range default to 1 so a malformed string advances
        instead of looping."""
        if all(nb == 2 for _, _, nb in self.codespace) or not self.codespace:
            return None
        lens = [1] * 256
        for lo, hi, nb in self.codespace:
            if nb == 1:
                continue
            if nb == 2:
                for lead in range(lo >> 8, min((hi >> 8) + 1, 256)):
                    lens[lead] = 2
            # 3/4-byte ranges don't occur in the supported families
        self.lead_lens = tuple(lens)
        return self.lead_lens

    # code -> CID (pdf_cmap_get_cid, cmap.c:116-138)
    def get_cid(self, code: int) -> Optional[int]:
        for lo, hi, base in self.cid_ranges:
            if lo <= code <= hi:
                return base + (code - lo)
        if self.parent is not None:
            return self.parent.get_cid(code)
        return None

    # code -> unicode str (pdf_cmap_get_unicode, cmap.c:140-159, extended
    # with bfrange)
    def get_unicode(self, code: int) -> Optional[str]:
        u = self.bf_singles.get(code)
        if u is not None:
            return u
        for lo, hi, base, nbytes in self.bf_ranges:
            if lo <= code <= hi:
                v = base + (code - lo)
                if nbytes <= 2 and v <= 0xFFFF:
                    return chr(v)
                # multi-code-unit destination (e.g. a surrogate pair for
                # mathematical alphanumerics): re-render the incremented
                # value as UTF-16BE bytes of the declared width — chr()
                # on a 4-byte value like 0xD835DC00 would raise
                try:
                    raw = v.to_bytes(max(nbytes, 2), "big")
                    return raw.decode("utf-16-be", errors="surrogatepass")
                except (OverflowError, UnicodeDecodeError):
                    return "�"
        if self.parent is not None:
            return self.parent.get_unicode(code)
        return None


def _identity_cmap(name: str) -> CMap:
    cm = CMap(name)
    cm.codespace = [(0x0000, 0xFFFF, 2)]
    cm.cid_ranges = [(0x0000, 0xFFFF, 0)]
    return cm


# The Unicode-keyed predefined families (PDF 32000-1 §9.7.5.2 Table 118):
# <registry>-UCS2 maps UCS-2 code points to CIDs of the collection;
# <registry>-UTF16 is the same over UTF-16BE. We embed the structural facts
# that are stable public spec data: the 2-byte BMP codespace, the identity
# "source code = Unicode" property (which is what extraction needs), and
# the proportional-Latin CID run (U+0020..U+007E -> CID 1..95, identical in
# the Adobe-Japan1 / GB1 / CNS1 / Korea1/KR character-collection specs).
# CIDs outside that run fall back to the descendant font's /DW width —
# text decode is still exact for every BMP code point.
_UNICODE_CMAP_STEMS = frozenset(
    f"Uni{reg}-{enc}"
    for reg in ("JIS", "GB", "CNS", "KS", "KR", "JIS2004", "JISX0213")
    for enc in ("UCS2", "UTF16")
)


def _unicode_cmap(name: str) -> CMap:
    cm = CMap(name)
    cm.codespace = [(0x0000, 0xFFFF, 2)]
    cm.cid_ranges = [(0x0020, 0x007E, 1)]
    cm.unicode_identity = True
    return cm


# Legacy byte-oriented predefined CJK CMaps (the pre-Unicode families the
# reference loads from the Adobe cmap-resources asset tree,
# fonts/cmap_paths.c:1-515 + fonts/cmap.c:529-689). Extraction needs
# code -> UNICODE, which the charset's stdlib codec provides without the
# Adobe CID tables; the codespace ranges below are the structural facts of
# each encoding (public spec data: Shift-JIS / EUC / GBK / Big5 / UHC
# layouts, identical to the ranges in Adobe's published CMap files).
# stem -> (python codec, codespace ranges [(lo, hi, nbytes)])
_SJIS_SPACE = [(0x00, 0x80, 1), (0xA0, 0xDF, 1), (0x8140, 0x9FFC, 2), (0xE040, 0xFCFC, 2)]
_EUC_SPACE = [(0x00, 0x7F, 1), (0xA1A1, 0xFEFE, 2)]
_GBK_SPACE = [(0x00, 0x7F, 1), (0x8140, 0xFEFE, 2)]
_B5_SPACE = [(0x00, 0x7F, 1), (0xA140, 0xF9FE, 2)]
_HK_SPACE = [(0x00, 0x7F, 1), (0x8140, 0xFEFE, 2)]
_UHC_SPACE = [(0x00, 0x7F, 1), (0x8141, 0xFEFE, 2)]

_LEGACY_CMAP_STEMS: dict[str, tuple[str, list[tuple[int, int, int]]]] = {
    # Japanese (Adobe-Japan1): Shift-JIS keyed
    "90ms-RKSJ": ("cp932", _SJIS_SPACE),
    "90msp-RKSJ": ("cp932", _SJIS_SPACE),
    "90pv-RKSJ": ("shift_jis", _SJIS_SPACE),
    "83pv-RKSJ": ("shift_jis", _SJIS_SPACE),
    "Ext-RKSJ": ("cp932", _SJIS_SPACE),
    "Add-RKSJ": ("shift_jis", _SJIS_SPACE),
    # Japanese EUC
    "EUC": ("euc_jp", [(0x00, 0x7F, 1), (0x8EA0, 0x8EDF, 2), (0xA1A1, 0xFEFE, 2)]),
    # Simplified Chinese (Adobe-GB1)
    "GB-EUC": ("gb2312", _EUC_SPACE),
    "GBpc-EUC": ("gb2312", _EUC_SPACE),
    "GBK-EUC": ("gbk", _GBK_SPACE),
    "GBKp-EUC": ("gbk", _GBK_SPACE),
    "GBK2K": ("gb18030", _GBK_SPACE),
    # Traditional Chinese (Adobe-CNS1)
    "B5pc": ("big5", _B5_SPACE),
    "B5": ("big5", _B5_SPACE),
    "ETen-B5": ("big5", _B5_SPACE),
    "ETenms-B5": ("big5", _B5_SPACE),
    "HKscs-B5": ("big5hkscs", _HK_SPACE),
    "CNS-EUC": ("euc_jis_2004", _EUC_SPACE),  # no exact stdlib codec; see note
    # Korean (Adobe-Korea1 / KR)
    "KSC-EUC": ("euc_kr", _EUC_SPACE),
    "KSCms-UHC": ("cp949", _UHC_SPACE),
    "KSCms-UHC-HW": ("cp949", _UHC_SPACE),
    "KSCpc-EUC": ("euc_kr", _EUC_SPACE),
}
# CNS-EUC-H is EUC-TW, which CPython has no codec for; drop it rather than
# decode wrongly (it remains UNSUPPORTED_CMAP, matching the error-row path).
del _LEGACY_CMAP_STEMS["CNS-EUC"]


def _legacy_cmap(name: str, codec: str, space: list[tuple[int, int, int]]) -> CMap:
    cm = CMap(name)
    cm.codespace = list(space)
    cm.charset = codec
    cm.build_lead_lens()
    return cm


def get_predefined_cmap(name: str) -> CMap:
    cm = None
    if name in ("Identity-H", "Identity-V"):
        cm = _identity_cmap(name)
    else:
        stem, _, direction = name.rpartition("-")
        if direction in ("H", "V"):
            if stem in _UNICODE_CMAP_STEMS:
                cm = _unicode_cmap(name)
            else:
                legacy = _LEGACY_CMAP_STEMS.get(stem)
                if legacy is not None:
                    cm = _legacy_cmap(name, legacy[0], legacy[1])
    if cm is None:
        raise PdfError(UNSUPPORTED_CMAP, f"predefined CMap {name!r}")
    if name.endswith("-V"):
        # the V form of every predefined family shares the H codespace and
        # mappings; only the writing mode differs (§9.7.5.2 Table 118)
        cm.wmode = 1
    return cm


def _hex_token_value(tok: bytes) -> tuple[int, int]:
    """``<0041>`` -> (0x41, nbytes=2). Whitespace inside is legal."""
    body = re.sub(rb"\s", b"", tok[1:-1])
    if not body:
        return 0, 0
    return int(body, 16), (len(body) + 1) // 2


def _utf16be_str(tok: bytes) -> str:
    body = re.sub(rb"\s", b"", tok[1:-1])
    if len(body) % 2:
        body += b"0"
    raw = bytes.fromhex(body.decode("ascii"))
    if len(raw) % 2 == 0 and len(raw) >= 2:
        try:
            return raw.decode("utf-16-be")
        except UnicodeDecodeError:
            pass
    return "".join(chr(b) for b in raw)


def parse_cmap(data: bytes) -> CMap:
    """Parse an (embedded or ToUnicode) CMap stream body."""
    cm = CMap()
    toks = _TOKEN_RE.findall(data)
    i, n = 0, len(toks)

    def is_hex(t: bytes) -> bool:
        return t.startswith(b"<") and t not in (b"<<",)

    while i < n:
        t = toks[i]
        if t.startswith(b"%"):
            i += 1
            continue
        if t == b"usecmap":
            # stack form: /Name usecmap — name is the previous name token
            j = i - 1
            while j >= 0 and not toks[j].startswith(b"/"):
                j -= 1
            if j >= 0:
                cm.parent = get_predefined_cmap(toks[j][1:].decode("latin-1"))
            i += 1
            continue
        if t == b"begincodespacerange":
            i += 1
            while i < n and toks[i] != b"endcodespacerange":
                if is_hex(toks[i]) and i + 1 < n and is_hex(toks[i + 1]):
                    lo, nb = _hex_token_value(toks[i])
                    hi, _ = _hex_token_value(toks[i + 1])
                    cm.codespace.append((lo, hi, nb))
                    i += 2
                else:
                    i += 1
            i += 1
            continue
        if t == b"begincidrange":
            i += 1
            while i < n and toks[i] != b"endcidrange":
                if (
                    is_hex(toks[i])
                    and i + 2 < n
                    and is_hex(toks[i + 1])
                    and not toks[i + 2].startswith((b"<", b"/"))
                ):
                    lo, _ = _hex_token_value(toks[i])
                    hi, _ = _hex_token_value(toks[i + 1])
                    try:
                        base = int(toks[i + 2])
                    except ValueError:
                        i += 1
                        continue
                    cm.cid_ranges.append((lo, hi, base))
                    i += 3
                else:
                    i += 1
            i += 1
            continue
        if t == b"beginbfchar":
            i += 1
            while i < n and toks[i] != b"endbfchar":
                if is_hex(toks[i]) and i + 1 < n and is_hex(toks[i + 1]):
                    code, _ = _hex_token_value(toks[i])
                    cm.bf_singles[code] = _utf16be_str(toks[i + 1])
                    i += 2
                else:
                    i += 1
            i += 1
            continue
        if t == b"beginbfrange":
            i += 1
            while i < n and toks[i] != b"endbfrange":
                if (
                    is_hex(toks[i])
                    and i + 2 < n
                    and is_hex(toks[i + 1])
                    and is_hex(toks[i + 2])
                ):
                    lo, _ = _hex_token_value(toks[i])
                    hi, _ = _hex_token_value(toks[i + 1])
                    dst, dst_nb = _hex_token_value(toks[i + 2])
                    cm.bf_ranges.append((lo, hi, dst, dst_nb))
                    i += 3
                elif is_hex(toks[i]) and i + 2 < n and toks[i + 2] == b"[":
                    # array form: <lo> <hi> [<d0> <d1> ...]
                    lo, _ = _hex_token_value(toks[i])
                    i += 3
                    k = 0
                    while i < n and toks[i] != b"]":
                        if is_hex(toks[i]):
                            cm.bf_singles[lo + k] = _utf16be_str(toks[i])
                            k += 1
                        i += 1
                    i += 1
                else:
                    i += 1
            i += 1
            continue
        if t.startswith(b"/") and t[1:] == b"CMapName":
            if i + 1 < n and toks[i + 1].startswith(b"/"):
                cm.name = toks[i + 1][1:].decode("latin-1")
        elif t == b"/WMode" and i + 1 < n:
            try:
                cm.wmode = 1 if int(toks[i + 1]) == 1 else 0
            except ValueError:
                pass
        i += 1
    return cm
