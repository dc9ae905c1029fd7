"""COS object model + recursive-descent parser.

Reimplements (from public PDF-spec knowledge + observed behavior of the
reference) the object layer of ``/root/reference/libs/pdf/src/object.c``:

- dispatch on first byte(s): ``t/f``→bool, digit→indirect-or-number with
  bounded backtrack, ``(``→string, ``<``→hex string, ``<<``→dict, ``/``→name,
  ``[``→array, ``n``→null            (object.c:65-134)
- number: sign + digits + optional ``.`` fraction; int vs real decided by the
  presence of ``.``                   (object.c:226-346)
- string literal: balanced parens, ``\\n \\r \\t \\b \\f \\( \\) \\\\`` escapes
  (object.c:348-467). DIVERGENCE: we additionally implement octal escapes and
  backslash-EOL continuation per the PDF spec — the reference panics on octal
  (object.c:451); none of the parity corpus uses them.
- hex string: whitespace-tolerant pairs, odd trailing digit = high nibble
  (object.c:484-552)
- name: ``/`` + regular chars with ``#xx`` escapes, chars in ``!``..``~``
  (object.c:554-651)
- array/dict: insertion order kept; duplicate dict keys → FIRST wins
  (lookup is a linear scan from the front, object.c:929-945)
- stream: dict + ``stream`` keyword + EOL, ``Length``-bounded slice (Length
  may be an indirect ref), ``endstream``   (object.c:775-849)
- indirect object/ref: ``id gen obj … endobj`` vs ``id gen R`` with
  backtrack-to-number fallback        (object.c:851-926)

Character classes follow ctx.c:418-433 (whitespace = NUL TAB LF FF CR SP;
delimiters = ``()<>[]{}/%``). DIVERGENCE: ``%`` comments are skipped as
whitespace (PDF spec 7.2.4); the reference never encounters comments inside
parsed regions, so this is strictly more permissive.
"""

from __future__ import annotations

import re
from typing import Any, Optional

from pdf_spark.core.errors import (
    INCORRECT_TYPE,
    INVALID_OBJECT,
    MISSING_KEY,
    NAME_BAD_CHAR_CODE,
    UNBALANCED_STR,
    PdfError,
)

# -- character classes (ctx.c:418-433) ---------------------------------------

WHITESPACE = b"\x00\t\n\x0c\r "
DELIMITERS = b"()<>[]{}/%"

# whitespace run, optionally interleaved with %-comments
_WS_RE = re.compile(rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)+")
_WS_OR_PCT = frozenset(b"\x00\t\n\x0c\r %")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_INT_RE = re.compile(rb"\d+")
# `id gen R` in one shot (the R must be its own token); used for the
# backtracking indirect-ref probe so a failed probe costs one C-level match
_REF_RE = re.compile(
    rb"(\d+)(?:[\x00\t\n\x0c\r ]|%[^\r\n]*[\r\n])+(\d+)"
    rb"(?:[\x00\t\n\x0c\r ]|%[^\r\n]*[\r\n])+R"
    rb"(?![^\x00\t\n\x0c\r ()<>\[\]{}/%])"
)
# digit-start body token in ONE probe: `id gen R` ref, else the number
# itself (entered only when buf[pos] is a digit, so no sign/.-prefix
# alternative needed — those dispatch straight to parse_number). Fuses
# the old _try_parse_ref + parse_number pair (two C matches + two Python
# calls per numeric token) into a single C-level match.
_REF_OR_NUM_RE = re.compile(
    rb"(\d+)(?:[\x00\t\n\x0c\r ]|%[^\r\n]*[\r\n])+(\d+)"
    rb"(?:[\x00\t\n\x0c\r ]|%[^\r\n]*[\r\n])+R"
    rb"(?![^\x00\t\n\x0c\r ()<>\[\]{}/%])"
    rb"|\d+\.?\d*"
)
# `id gen obj` header in one shot
_INDOBJ_RE = re.compile(
    rb"(?:[\x00\t\n\x0c\r ]|%[^\r\n]*[\r\n])*(\d+)"
    rb"(?:[\x00\t\n\x0c\r ]|%[^\r\n]*[\r\n])+(\d+)"
    rb"(?:[\x00\t\n\x0c\r ]|%[^\r\n]*[\r\n])+obj"
    rb"(?![^\x00\t\n\x0c\r ()<>\[\]{}/%])"
)
# run of regular characters (not whitespace, not delimiter)
_REG_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")
# dict-body step: ws/comments, then either the ``>>`` close or a ``/key``.
# The prefix must be ATOMIC (possessive on 3.11+, lookahead+backref
# otherwise): backtracking could shorten a %-comment and extract a
# phantom key/close from inside the comment text when the next real
# token matches neither alternative.


def _atomic_ws_prefix() -> bytes:
    atom = rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)"
    try:
        re.compile(atom + b"*+")
        return atom + b"*+"
    except re.error:  # pragma: no cover — Python < 3.11
        return b"(?=(?P<dws>" + atom + b"*))(?P=dws)"


_DICT_KEY_RE = re.compile(
    _atomic_ws_prefix()
    + rb"(?:(?P<close>>>)|/(?P<key>[^\x00\t\n\x0c\r ()<>\[\]{}/%]*))"
)
_HEX_RE = re.compile(rb"[0-9a-fA-F]")
_EOL_RE = re.compile(rb"\r\n|\n|\r")

_STR_ESCAPES = {
    ord("n"): b"\n",
    ord("r"): b"\r",
    ord("t"): b"\t",
    ord("b"): b"\b",
    ord("f"): b"\x0c",
    ord("("): b"(",
    ord(")"): b")",
    ord("\\"): b"\\",
}


# -- object model -------------------------------------------------------------


class Name(str):
    """A PDF name (``/Foo``) — distinct from text strings (object.h:20)."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover
        return f"/{str(self)}"


class Ref:
    """Indirect reference ``(object_id, generation)`` (object.h:56-60)."""

    __slots__ = ("obj_id", "gen")

    def __init__(self, obj_id: int, gen: int) -> None:
        self.obj_id = obj_id
        self.gen = gen

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, Ref)
            and other.obj_id == self.obj_id
            and other.gen == self.gen
        )

    def __hash__(self) -> int:
        return hash((self.obj_id, self.gen))

    def __repr__(self) -> str:  # pragma: no cover
        return f"Ref({self.obj_id},{self.gen})"


class Stream:
    """A stream object: dict + raw (still-encoded) bytes (object.h:49-54).

    Decoding is lazy — ``decoded(resolver)`` runs the filter chain once and
    memoizes, mirroring the reference's decode-at-parse but keeping giant
    unused streams (embedded font programs) cheap.
    """

    __slots__ = ("dict", "raw", "_decoded")

    def __init__(self, d: dict, raw: bytes) -> None:
        self.dict = d
        self.raw = raw
        self._decoded: Optional[bytes] = None

    def decoded(self, resolver=None) -> bytes:
        if self._decoded is None:
            from pdf_spark.core.filters import decode_stream

            self._decoded = decode_stream(self.dict, self.raw, resolver)
        return self._decoded

    def __repr__(self) -> str:  # pragma: no cover
        return f"Stream({self.dict!r}, {len(self.raw)}B)"


class IndirectObject:
    """``id gen obj … endobj`` wrapper (object.c:851-926)."""

    __slots__ = ("obj_id", "gen", "value")

    def __init__(self, obj_id: int, gen: int, value: Any) -> None:
        self.obj_id = obj_id
        self.gen = gen
        self.value = value


# sentinel distinct from None-the-python-object so "key absent" != "null"
PDF_NULL = None


# -- parser -------------------------------------------------------------------


_NAME_CACHE: dict[bytes, Name] = {}


def hex_body_to_bytes(body: bytes) -> bytes:
    """Shared hex-string decode core: strip PDF whitespace, pad an odd
    trailing digit as the high nibble (object.c:536), bytes.fromhex. Used
    by the object parser, the content scanner, and ASCIIHexDecode."""
    compact = body.translate(None, WHITESPACE)
    if len(compact) % 2:
        compact += b"0"
    return bytes.fromhex(compact.decode("ascii"))


def decode_name_bytes(raw: bytes) -> Name:
    """Decode a name token body (after ``/``) with ``#xx`` escapes
    (object.c:554-651); shared by the recursive parser and the
    content-stream scanner. Decoded names are interned in a bounded
    module-level cache — the same few names (Type, Page, Font, ...) occur
    in every document of a batch."""
    cached = _NAME_CACHE.get(raw)
    if cached is not None:
        return cached
    if b"#" not in raw:
        # latin-1, matching the #xx escape path below: bytes 0x80-0xFF are
        # regular characters per PDF 32000-1 §7.3.5, and /Fo\xe9 must decode
        # the same as /Fo#E9
        name = Name(raw.decode("latin-1"))
        if len(_NAME_CACHE) < 4096:
            _NAME_CACHE[raw] = name
        return name
    out = bytearray()
    i = 0
    while i < len(raw):
        if raw[i] == 0x23:  # '#'
            pair = raw[i + 1 : i + 3]
            if len(pair) != 2 or not (
                _HEX_RE.match(pair[0:1]) and _HEX_RE.match(pair[1:2])
            ):
                raise PdfError(NAME_BAD_CHAR_CODE, f"bad #xx escape {pair!r}")
            out.append(int(pair, 16))
            i += 3
        else:
            out.append(raw[i])
            i += 1
    try:
        return Name(out.decode("latin-1"))
    except UnicodeDecodeError:  # pragma: no cover — latin-1 total
        raise PdfError(NAME_BAD_CHAR_CODE, "undecodable name") from None


class ObjectParser:
    """Cursor + recursive-descent COS parser over one in-memory document.

    ``resolver`` (optional) is consulted only to resolve an indirect
    ``/Length`` when slicing stream bytes (object.c:787-800 resolves Length
    through the trailer's resolver).
    """

    __slots__ = ("buf", "pos", "resolver", "content")

    def __init__(self, buf: bytes, pos: int = 0, resolver=None, content: bool = False):
        self.buf = buf
        self.pos = pos
        self.resolver = resolver
        # content-stream operand mode: numbers never start indirect refs
        # (object.c:136-186 is the no-resolver operand variant)
        self.content = content

    # -- cursor helpers --

    def skip_ws(self) -> None:
        buf, pos = self.buf, self.pos
        if pos < len(buf) and buf[pos] in _WS_OR_PCT:
            self.pos = _WS_RE.match(buf, pos).end()

    def at_end(self) -> bool:
        self.skip_ws()
        return self.pos >= len(self.buf)

    def peek(self) -> int:
        if self.pos >= len(self.buf):
            raise PdfError(INVALID_OBJECT, "unexpected EOF")
        return self.buf[self.pos]

    def expect(self, token: bytes) -> None:
        if not self.buf.startswith(token, self.pos):
            raise PdfError(
                INVALID_OBJECT,
                f"expected {token!r} at offset {self.pos}",
            )
        self.pos += len(token)

    def expect_keyword(self, kw: bytes) -> None:
        """Expect a keyword followed by a non-regular char (or EOF)."""
        self.expect(kw)
        if self.pos < len(self.buf):
            c = self.buf[self.pos]
            if c not in WHITESPACE and c not in DELIMITERS:
                raise PdfError(INVALID_OBJECT, f"keyword {kw!r} not delimited")

    # -- object dispatch (object.c:65-134) --

    def parse_object(self) -> Any:
        # inlined skip_ws/peek + dispatch ordered by corpus frequency
        # (numbers/refs and names dominate body objects)
        buf, pos = self.buf, self.pos
        if pos < len(buf) and buf[pos] in _WS_OR_PCT:
            pos = self.pos = _WS_RE.match(buf, pos).end()
        if pos >= len(buf):
            raise PdfError(INVALID_OBJECT, "unexpected EOF")
        c = buf[pos]
        if 0x30 <= c <= 0x39:  # digit
            if self.content:
                return self.parse_number()
            m = _REF_OR_NUM_RE.match(buf, pos)
            self.pos = m.end()
            if m.group(1) is not None:
                return Ref(int(m.group(1)), int(m.group(2)))
            tok = m.group()
            if b"." in tok:
                return float(tok)
            v = int(tok)
            # reference clamps to i32 with overflow error (object.c:288-294)
            if not (-2147483648 <= v <= 2147483647):
                raise PdfError(INVALID_OBJECT, f"integer out of i32 range: {v}")
            return v
        if c == 0x2F:  # /
            return self.parse_name()
        if c == 0x3C:  # <
            if buf.startswith(b"<<", pos):
                d = self.parse_dict()
                return self._maybe_stream(d)
            return self.parse_hex_string()
        if c == 0x28:  # (
            return self.parse_string_literal()
        if c == 0x5B:  # [
            return self.parse_array()
        if c in (0x2B, 0x2D, 0x2E):  # + - .
            return self.parse_number()
        if c == 0x74:  # t
            self.expect_keyword(b"true")
            return True
        if c == 0x66:  # f
            self.expect_keyword(b"false")
            return False
        if c == 0x6E:  # n
            self.expect_keyword(b"null")
            return PDF_NULL
        raise PdfError(INVALID_OBJECT, f"cannot parse object at byte {c:#x}")

    # -- numbers (object.c:226-346) --

    def parse_number(self):
        m = _NUM_RE.match(self.buf, self.pos)
        if not m:
            raise PdfError(INVALID_OBJECT, "malformed number")
        self.pos = m.end()
        tok = m.group()
        if b"." in tok:
            return float(tok)
        v = int(tok)
        # reference clamps to i32 with overflow error (object.c:288-294)
        if not (-2147483648 <= v <= 2147483647):
            raise PdfError(INVALID_OBJECT, f"integer out of i32 range: {v}")
        return v

    # -- indirect ref backtrack (object.c:94-114, 851-926) --

    def _try_parse_ref(self) -> Optional[Ref]:
        """Try ``id gen R``; on failure restore position (bounded backtrack).
        One compiled regex replaces the int/ws/int/ws/R probe chain."""
        m = _REF_RE.match(self.buf, self.pos)
        if m is None:
            return None
        self.pos = m.end()
        return Ref(int(m.group(1)), int(m.group(2)))

    def parse_indirect_object(self) -> IndirectObject:
        """``id gen obj <value> [stream] endobj`` at the current offset."""
        m = _INDOBJ_RE.match(self.buf, self.pos)
        if m is None:
            # re-run the verbose path for the precise error message
            self.skip_ws()
            if not _INT_RE.match(self.buf, self.pos):
                raise PdfError(INVALID_OBJECT, "indirect object: missing id")
            raise PdfError(INVALID_OBJECT, "indirect object: malformed header")
        self.pos = m.end()
        value = self.parse_object()
        self.skip_ws()
        # endobj is optional-lenient in many real files; the reference expects
        # it (object.c:905-916) — we require it too, but only when present the
        # next token must be exactly `endobj`.
        if self.buf.startswith(b"endobj", self.pos):
            self.expect_keyword(b"endobj")
        else:
            raise PdfError(INVALID_OBJECT, "indirect object: missing endobj")
        return IndirectObject(int(m.group(1)), int(m.group(2)), value)

    # -- strings (object.c:348-467) --

    def parse_string_literal(self) -> bytes:
        self.expect(b"(")
        buf = self.buf
        n = len(buf)
        out = bytearray()
        depth = 1
        p = self.pos
        while True:
            if p >= n:
                raise PdfError(UNBALANCED_STR, "string never closed")
            c = buf[p]
            if c == 0x5C:  # backslash
                if p + 1 >= n:
                    raise PdfError(UNBALANCED_STR, "escape at EOF")
                e = buf[p + 1]
                rep = _STR_ESCAPES.get(e)
                if rep is not None:
                    out += rep
                    p += 2
                elif 0x30 <= e <= 0x37:
                    # octal escape \d{1,3} — PDF spec 7.3.4.2.
                    # DIVERGENCE: reference panics on octal (object.c:451).
                    q = p + 1
                    val = 0
                    while q < n and q < p + 4 and 0x30 <= buf[q] <= 0x37:
                        val = (val << 3) | (buf[q] - 0x30)
                        q += 1
                    out.append(val & 0xFF)
                    p = q
                elif e in (0x0A, 0x0D):
                    # line continuation: backslash-EOL dropped (spec 7.3.4.2)
                    p += 2
                    if e == 0x0D and p < n and buf[p] == 0x0A:
                        p += 1
                else:
                    # unknown escape: backslash ignored (spec behavior)
                    out.append(e)
                    p += 2
            elif c == 0x28:  # (
                depth += 1
                out.append(c)
                p += 1
            elif c == 0x29:  # )
                depth -= 1
                if depth == 0:
                    p += 1
                    break
                out.append(c)
                p += 1
            else:
                # fast path: copy a run of plain chars
                q = p
                while q < n and buf[q] not in (0x28, 0x29, 0x5C):
                    q += 1
                out += buf[p:q]
                p = q
        self.pos = p
        return bytes(out)

    def parse_hex_string(self) -> bytes:
        """``<...>`` hex pairs; whitespace skipped; odd trailing = high nibble
        (object.c:484-552)."""
        self.expect(b"<")
        buf = self.buf
        end = buf.find(b">", self.pos)
        if end < 0:
            raise PdfError(UNBALANCED_STR, "hex string never closed")
        body = buf[self.pos : end]
        self.pos = end + 1
        try:
            return hex_body_to_bytes(body)
        except (ValueError, UnicodeDecodeError) as exc:
            raise PdfError(INVALID_OBJECT, f"bad hex string: {exc}") from None

    # -- names (object.c:554-651) --

    def parse_name(self) -> Name:
        buf, pos = self.buf, self.pos
        if not buf.startswith(b"/", pos):
            raise PdfError(INVALID_OBJECT, f"expected b'/' at offset {pos}")
        m = _REG_RE.match(buf, pos + 1)
        if m is None:
            self.pos = pos + 1
            return decode_name_bytes(b"")
        self.pos = m.end()
        return decode_name_bytes(m.group())

    # -- array/dict (object.c:653-773) --

    def parse_array(self) -> list:
        self.expect(b"[")
        out = []
        buf = self.buf
        n = len(buf)
        while True:
            pos = self.pos
            if pos < n and buf[pos] in _WS_OR_PCT:
                pos = self.pos = _WS_RE.match(buf, pos).end()
            if pos >= n:
                raise PdfError(INVALID_OBJECT, "unexpected EOF")
            if buf[pos] == 0x5D:  # ]
                self.pos = pos + 1
                return out
            out.append(self.parse_object())

    def parse_dict(self) -> dict:
        self.expect(b"<<")
        out: dict = {}
        buf = self.buf
        key_match = _DICT_KEY_RE.match
        while True:
            # one match consumes ws/comments plus either the >> close or
            # the next /key name (was skip_ws + startswith + peek + expect)
            m = key_match(buf, self.pos)
            if m is None:
                self.skip_ws()
                if self.pos >= len(buf):
                    raise PdfError(INVALID_OBJECT, "unexpected EOF")
                raise PdfError(INVALID_OBJECT, "dict key must be a name")
            self.pos = m.end()
            if m.group("close") is not None:
                return out
            key = decode_name_bytes(m.group("key"))
            value = self.parse_object()
            # duplicate keys: FIRST wins (linear-scan lookup, object.c:929-945)
            if key not in out:
                out[key] = value

    # -- streams (object.c:775-849) --

    def _maybe_stream(self, d: dict):
        saved = self.pos
        self.skip_ws()
        if not self.buf.startswith(b"stream", self.pos):
            self.pos = saved
            return d
        self.pos += len(b"stream")
        m = _EOL_RE.match(self.buf, self.pos)
        if not m:
            raise PdfError(INVALID_OBJECT, "stream keyword not followed by EOL")
        self.pos = m.end()
        length = d.get("Length")
        if isinstance(length, Ref):
            if self.resolver is None:
                raise PdfError(MISSING_KEY, "indirect /Length without resolver")
            length = self.resolver.resolve(length)
        if not isinstance(length, int) or length < 0:
            raise PdfError(INCORRECT_TYPE, f"bad stream /Length: {length!r}")
        if self.pos + length > len(self.buf):
            raise PdfError(INVALID_OBJECT, "stream Length past EOF")
        raw = self.buf[self.pos : self.pos + length]
        self.pos += length
        self.skip_ws()
        self.expect_keyword(b"endstream")
        return Stream(d, raw)


def parse_object_at(buf: bytes, pos: int, resolver=None) -> IndirectObject:
    """Parse the indirect object at a byte offset (xref-entry target)."""
    return ObjectParser(buf, pos, resolver).parse_indirect_object()
