"""RTF text extraction — the legacy word-processor tier of a crawl.

RTF (public Microsoft spec, 1987-2008 revisions) is a brace-grouped
control-word stream. The text-extraction subset:

- groups ``{`` ``}`` carry inherited state (the ``\\ucN`` skip count);
- control words ``\\word[-]N`` with an optional numeric parameter and
  one optional trailing space eaten (spec tokenization);
- destinations whose CONTENT is not document text are skipped
  wholesale with brace matching: ``fonttbl colortbl stylesheet info
  pict header footer`` and every ``{\\*\\...}`` (the spec's
  ignore-if-unknown form);
- text controls: ``\\par``/``\\line`` → newline, ``\\tab`` → TAB,
  ``\\~`` → space, ``\\emdash``/``\\endash`` → dashes, and the literal
  escapes ``\\{`` ``\\}`` ``\\\\``;
- encoded characters: ``\\'hh`` hex bytes decoded as windows-1252 (the
  overwhelmingly dominant ``\\ansi`` charset on the web), ``\\uN``
  signed 16-bit Unicode with the current group's ``\\ucN`` fallback
  characters skipped (fallback may itself be a ``\\'hh``).

Bounded (``TOKEN_CAP``), report-don't-raise; ``is_rtf=0`` for payloads
without the ``{\\rtf`` magic.

Reference parity note: the C reference (someone13574/pdf) has no RTF
surface — net-new in the E183/E184/E185 document-tier tradition.
"""

from __future__ import annotations

import re

__all__ = ["rtf_text", "TOKEN_CAP"]

TOKEN_CAP = 200_000  # control-word bomb

_TOKEN = re.compile(
    rb"\\'([0-9a-fA-F]{2})"  # hex byte
    rb"|\\([a-zA-Z]{1,32})(-?\d{1,10})? ?"  # control word [param] [space]
    rb"|\\([^a-zA-Z])"  # control symbol
    rb"|([{}])"  # group delimiters
    rb"|([^\\{}]+)"  # plain text run
)

_SKIP_DESTS = frozenset(
    b"fonttbl colortbl stylesheet info pict header footer "
    b"headerl headerr headerf footerl footerr footerf "
    b"ftnsep ftnsepc aftnsep themedata datastore".split()
)

_TEXT_CONTROLS = {
    b"par": "\n",
    b"line": "\n",
    b"tab": "\t",
    b"emdash": "—",
    b"endash": "–",
    b"lquote": "‘",
    b"rquote": "’",
    b"ldblquote": "“",
    b"rdblquote": "”",
    b"bullet": "•",
}


def rtf_text(data: bytes) -> dict:
    """RTF bytes → visible text + paragraph count (report-don't-raise)."""
    if not data.startswith(b"{\\rtf"):
        return {"is_rtf": 0, "text": None, "n_pars": None}
    out: list[str] = []
    n_pars = 0
    uc_stack = [1]
    skip_depth = 0  # brace depth inside a skipped destination, 0 = live
    pending_uc_skip = 0
    star_pending = False  # just entered a group whose first word is \*
    group_open = False  # the previous token was '{'
    for n, m in enumerate(_TOKEN.finditer(data)):
        if n >= TOKEN_CAP:
            break
        hexb, word, param, symbol, brace, text = m.groups()
        if brace == b"{":
            if skip_depth:
                skip_depth += 1
            else:
                uc_stack.append(uc_stack[-1])
                group_open = True
                star_pending = False
            continue
        if brace == b"}":
            if skip_depth:
                skip_depth -= 1
            elif len(uc_stack) > 1:
                uc_stack.pop()
            group_open = False
            continue
        if skip_depth:
            continue
        was_open, group_open = group_open, False
        if symbol is not None:
            if symbol == b"*" and was_open:
                star_pending = True  # {\*\dest ...}: decide on next word
                group_open = True  # keep the just-opened flag alive
                continue
            if symbol in (b"{", b"}", b"\\"):
                out.append(symbol.decode("ascii"))
            elif symbol == b"~":
                out.append(" ")
            # other control symbols (formatting) are silent
            continue
        if word is not None:
            if star_pending:
                star_pending = False
                if word not in _TEXT_CONTROLS:  # unknown starred dest
                    skip_depth = 1
                    continue
            if was_open and word in _SKIP_DESTS:
                skip_depth = 1
                continue
            if word == b"uc":
                uc_stack[-1] = int(param or 1)
            elif word == b"u":
                cp = int(param or 0)
                if cp < 0:
                    cp += 65536
                out.append(chr(cp))
                pending_uc_skip = uc_stack[-1]
            elif word in _TEXT_CONTROLS:
                if word == b"par":
                    n_pars += 1
                out.append(_TEXT_CONTROLS[word])
            # all other control words are formatting: silent
            continue
        if hexb is not None:
            if pending_uc_skip:
                pending_uc_skip -= 1
                continue
            out.append(bytes([int(hexb, 16)]).decode("cp1252", "replace"))
            continue
        if text is not None:
            run = text.replace(b"\r", b"").replace(b"\n", b"")
            if pending_uc_skip:
                take = min(pending_uc_skip, len(run))
                run = run[take:]
                pending_uc_skip -= take
            if run:
                out.append(run.decode("cp1252", "replace"))
    return {
        "is_rtf": 1,
        "text": "".join(out).strip("\n"),
        "n_pars": n_pars,
    }
