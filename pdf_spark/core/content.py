"""Content-stream tokenizer: operand loop -> operator dispatch.

Mirrors ``pdf_deserde_content_stream`` (/root/reference/libs/pdf/src/
content_stream/stream.c:17-110): parse operands until an operator token,
look the operator up in the token table (operator.c:89-506), then typecheck
into a canonical op (operation.c:515-806). ``BX``/``EX`` compatibility
sections swallow unknown operators (stream.c:79-97). ``Tj`` is canonicalized
into a one-element ``TJ`` (operation.c:706-715).

Operator support classes (SURVEY.md §2.2):

- parsed + executed by our interpreter: the text set ``BT ET Tc Tw Tz TL Tf
  Tr Ts Td TD Tm T* Tj TJ ' "`` plus state ``q Q cm gs`` and ``Do``.
  EXTENSION: ``Tz Tr Ts ' "`` are implemented per spec — the reference
  deserializes ``Tz`` but panics executing it and panics parsing the others
  (operator.h:153-157,196-211); a 100TB extraction engine needs them.
- parsed + ignored (no effect on text): path/paint/clip/color/shading ops.
- warn-skip class (matching the reference): ``d BDC EMC``.
- error class: ``BI ID EI`` inline images (reference panics; we raise
  UNSUPPORTED_OPERATOR -> error row), unknown tokens outside BX/EX.
"""

from __future__ import annotations

from typing import Any, List, Tuple

from pdf_spark.core.errors import UNSUPPORTED_OPERATOR, PdfError
from pdf_spark.core.objects import ObjectParser

# full 73-operator token set (operator.h:3-306)
OPERATORS = frozenset(
    """w J j M d ri i gs q Q cm m l c v y h re S s f F f* B B* b b* n W W*
    BT ET Tc Tw Tz TL Tf Tr Ts Td TD Tm T* Tj TJ ' " d0 d1 CS cs SC SCN sc
    scn G g RG rg K k sh BI ID EI Do MP DP BMC BDC EMC BX EX""".split()
)

# ops with no bearing on extracted text: operands validated loosely, dropped
IGNORED = frozenset(
    """w J j M i ri m l c v y h re S s f F f* B B* b b* n W W* CS cs SC SCN
    sc scn G g RG rg K k sh d0 d1 MP DP BMC BDC EMC d gs""".split()
)

# inline images can't be tokenized without decoding — reference class: panic
ERROR_OPS = frozenset(("BI", "ID", "EI"))

Op = Tuple[str, List[Any]]


def parse_content_stream(data: bytes) -> List[Op]:
    """Tokenize one decoded content stream into ``[(operator, operands)]``."""
    p = ObjectParser(data, content=True)
    ops: List[Op] = []
    operands: List[Any] = []
    in_compat = 0  # BX/EX nesting
    n = len(data)
    while True:
        p.skip_ws()
        if p.pos >= n:
            break
        c = data[p.pos]
        # operand start bytes: ( < / [ digit + - . or keyword true/false/null
        if (
            c in b"(</["
            or 0x30 <= c <= 0x39
            or c in b"+-."
            or data.startswith(b"true", p.pos)
            or data.startswith(b"false", p.pos)
            or data.startswith(b"null", p.pos)
        ):
            operands.append(p.parse_object())
            continue
        # operator token: run of regular chars, or ' / " singletons
        if c in b"'\"":
            tok = chr(c)
            p.pos += 1
        else:
            start = p.pos
            while p.pos < n and data[p.pos] not in b"\x00\t\n\x0c\r ()<>[]{}/%":
                p.pos += 1
            if p.pos == start:
                raise PdfError(
                    UNSUPPORTED_OPERATOR, f"stray byte {c:#x} in content stream"
                )
            tok = data[start : p.pos].decode("latin-1")
        if tok == "BX":
            in_compat += 1
            operands = []
            continue
        if tok == "EX":
            in_compat = max(0, in_compat - 1)
            operands = []
            continue
        if tok not in OPERATORS:
            if in_compat:
                operands = []  # swallowed inside BX/EX (stream.c:79-97)
                continue
            raise PdfError(UNSUPPORTED_OPERATOR, f"unknown operator {tok!r}")
        if tok in ERROR_OPS:
            raise PdfError(UNSUPPORTED_OPERATOR, f"inline image op {tok!r}")
        if tok in IGNORED:
            operands = []
            continue
        # canonicalize Tj -> one-element TJ (operation.c:706-715)
        if tok == "Tj":
            ops.append(("TJ", [[operands[-1] if operands else b""]]))
        else:
            ops.append((tok, operands))
        operands = []
    return ops
