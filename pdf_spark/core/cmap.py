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
- predefined ``Identity-H``/``Identity-V`` plus the Unicode-keyed
  ``Uni*-UCS2-H/V`` / ``Uni*-UTF16-H/V`` families are built in (the
  reference loads the whole Adobe set from the cmap-resources asset tree,
  fonts/cmap_paths.c — an asset its own submodule ships empty); the legacy
  byte-oriented CJK CMaps (Shift-JIS/EUC/Big5 keyed) still raise
  UNSUPPORTED_CMAP.

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
        "parent", "unicode_identity",
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


def get_predefined_cmap(name: str) -> CMap:
    if name in ("Identity-H", "Identity-V"):
        return _identity_cmap(name)
    stem, _, direction = name.rpartition("-")
    if direction in ("H", "V") and stem in _UNICODE_CMAP_STEMS:
        return _unicode_cmap(name)
    raise PdfError(UNSUPPORTED_CMAP, f"predefined CMap {name!r}")


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
        i += 1
    return cm
