"""Markdown SOURCE extraction — the README/docs-site tier of a crawl.

Raw ``.md`` payloads (GitHub READMEs, docs repos, static-site sources)
are prose wearing light markup; the training-data contract is the
inverse of qx24/qx28 (which RENDER to markdown): strip the markup back
OFF deterministically, keep the prose, and count the structure that
routes the document (headings, code fences, links, images).

Scope (the CommonMark core that survives on real READMEs):

- ATX headings ``# .. ######`` and setext underlines (``===`` → h1,
  ``---`` → h2, under a non-blank line);
- fenced code blocks (``` or ~~~): EXCLUDED from prose (code poisons
  language models' prose slices; it is its own corpus tier), counted,
  first fence's info string kept as the dominant language;
- inline markup stripped innermost-first: images → alt text, links →
  anchor text, inline code → its content, bold/italic wrappers off;
- list bullets / ordered-item numbers / blockquote markers stripped,
  the item text kept;
- thematic breaks and blank lines dropped.

Pure text processing — no tags, no container — so there is no
``is_md`` gate: every text payload routes through and the structure
counts ARE the classifier signal.
"""

from __future__ import annotations

import re

__all__ = ["md_structure"]

_ATX = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_SETEXT = re.compile(r"^(={3,}|-{3,})\s*$")
_FENCE = re.compile(r"^(```|~~~)\s*(\S*)")
_THEMATIC = re.compile(r"^\s*((\*\s*){3,}|(-\s*){3,}|(_\s*){3,})$")
_BULLET = re.compile(r"^\s*(?:[-*+]|\d{1,9}\.)\s+")
_QUOTE = re.compile(r"^>\s?")

_IMG = re.compile(r"!\[([^\]]*)\]\(([^)]*)\)")
_LINK = re.compile(r"\[([^\]]*)\]\(([^)]*)\)")
_CODE = re.compile(r"`([^`]*)`")
_BOLD = re.compile(r"\*\*([^*]+)\*\*|__([^_]+)__")
_ITAL = re.compile(r"\*([^*]+)\*|_([^_]+)_")


def _strip_inline(line: str) -> tuple[str, int, int]:
    """→ (clean line, n_links, n_images). Innermost-first order."""
    n_images = len(_IMG.findall(line))
    line = _IMG.sub(lambda m: m.group(1), line)
    n_links = len(_LINK.findall(line))
    line = _LINK.sub(lambda m: m.group(1), line)
    line = _CODE.sub(lambda m: m.group(1), line)
    line = _BOLD.sub(lambda m: m.group(1) or m.group(2), line)
    line = _ITAL.sub(lambda m: m.group(1) or m.group(2), line)
    return line, n_links, n_images


def md_structure(text: str) -> dict:
    """Markdown source → stripped prose + structure counts."""
    lines = text.split("\n")
    prose: list[str] = []
    title = None
    n_head = n_code = n_links = n_images = 0
    code_lang = None
    fence = None  # open fence marker, None = prose mode
    for idx, raw in enumerate(lines):
        line = raw.rstrip("\r")
        fm = _FENCE.match(line)
        if fence is not None:
            if fm and fm.group(1) == fence:
                fence = None
            continue  # code content excluded from prose
        if fm:
            fence = fm.group(1)
            n_code += 1
            if code_lang is None and fm.group(2):
                code_lang = fm.group(2).lower()
            continue
        am = _ATX.match(line)
        if am:
            n_head += 1
            head, _, _ = _strip_inline(am.group(2))
            if title is None:
                title = head
            prose.append(head)
            continue
        if (
            _SETEXT.match(line)
            and prose
            and idx > 0
            and lines[idx - 1].strip()
            and not _THEMATIC.match(lines[idx - 1])
        ):
            # the PREVIOUS kept line was actually a heading
            n_head += 1
            if title is None:
                title = prose[-1]
            continue
        if _THEMATIC.match(line) or not line.strip():
            continue
        line = _QUOTE.sub("", line)
        line = _BULLET.sub("", line)
        clean, nl, ni = _strip_inline(line)
        n_links += nl
        n_images += ni
        if clean.strip():
            prose.append(clean.strip())
    return {
        "title": title,
        "n_headings": n_head,
        "n_code_blocks": n_code,
        "code_lang": code_lang,
        "n_links": n_links,
        "n_images": n_images,
        "prose": "\n".join(prose),
    }
