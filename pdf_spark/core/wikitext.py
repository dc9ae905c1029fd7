"""MediaWiki wikitext strip — the encyclopedia-dump corpus tier.

Wiki dumps are a foundational training corpus and ship as wikitext, not
HTML; the public markup (MediaWiki help pages) needs brace- and
bracket-aware stripping that regexes alone get wrong on NESTED
constructs. Stage order:

1. HTML comments ``<!-- -->`` out;
2. ``<ref ...>…</ref>`` citations out (counted), self-closing
   ``<ref name=x/>`` too — reference bodies are citations, not prose;
3. templates ``{{…}}`` dropped with DEPTH-aware brace matching
   (infoboxes nest templates several levels deep; only TOP-LEVEL
   templates count);
4. tables ``{| … |}`` dropped (nested tables handled by the same
   depth counter);
5. ``[[File:…]]``/``[[Image:…]]`` dropped whole — their captions
   contain nested ``[[links]]``, so the scan must bracket-match, not
   lazy-regex;
6. internal links ``[[target|text]]`` → text, ``[[target]]`` → target
   (counted); external ``[url text]`` → text, bare ``[url]`` → ""
   (counted);
7. headings ``== X ==`` → X (counted); ``'''``/``''`` emphasis
   apostrophe runs removed; list markers ``*#:;`` and magic words
   ``__TOC__`` stripped; blank runs collapse.

Remaining inline HTML tags are dropped tag-only (content kept).
"""

from __future__ import annotations

import re

__all__ = ["wikitext_strip"]

_COMMENT = re.compile(r"<!--.*?-->", re.S)
_REF = re.compile(r"<ref(?:\s[^>]*)?>.*?</ref>|<ref(?:\s[^>]*)?/>", re.S)
_HEADING = re.compile(r"^(={2,6})\s*(.*?)\s*\1\s*$")
_EXT_LINK = re.compile(r"\[(https?://[^\s\]]+)(?:\s+([^\]]*))?\]")
_MAGIC = re.compile(r"__[A-Z]+__")
_TAG = re.compile(r"<[a-zA-Z/][^>]*>")
_APOS = re.compile(r"''+")
_LIST = re.compile(r"^[*#:;]+\s*")


def _drop_delimited(text: str, open_s: str, close_s: str) -> tuple[str, int]:
    """Remove depth-matched spans; return (cleaned, top-level count)."""
    out: list[str] = []
    depth = 0
    count = 0
    i, n = 0, len(text)
    while i < n:
        if text.startswith(open_s, i):
            if depth == 0:
                count += 1
            depth += 1
            i += len(open_s)
        elif depth and text.startswith(close_s, i):
            depth -= 1
            i += len(close_s)
        elif depth:
            i += 1
        else:
            out.append(text[i])
            i += 1
    return "".join(out), count


def _strip_links(text: str) -> tuple[str, int, int]:
    """Bracket-matched [[...]] handling → (text, n_internal, n_files)."""
    out: list[str] = []
    n_int = n_file = 0
    i, n = 0, len(text)
    while i < n:
        if text.startswith("[[", i):
            # find the MATCHING ]] (captions nest [[links]])
            depth = 1
            j = i + 2
            while j < n and depth:
                if text.startswith("[[", j):
                    depth += 1
                    j += 2
                elif text.startswith("]]", j):
                    depth -= 1
                    j += 2
                else:
                    j += 1
            inner = text[i + 2 : j - 2]
            head = inner.split("|", 1)[0].strip().lower()
            if head.startswith(("file:", "image:", "category:")):
                n_file += 1  # dropped whole (incl. nested caption links)
            else:
                n_int += 1
                parts = inner.rsplit("|", 1)
                shown = parts[-1] if len(parts) > 1 else inner
                sub, extra_int, extra_file = _strip_links(shown)
                n_int += extra_int
                n_file += extra_file
                out.append(sub)
            i = j
        else:
            out.append(text[i])
            i += 1
    return "".join(out), n_int, n_file


def wikitext_strip(src: str) -> dict:
    """Wikitext → prose + structure counts."""
    text = _COMMENT.sub("", src)
    n_refs = len(_REF.findall(text))
    text = _REF.sub("", text)
    text, n_templates = _drop_delimited(text, "{{", "}}")
    text, _tables = _drop_delimited(text, "{|", "|}")
    text, n_internal, _files = _strip_links(text)
    n_external = 0

    def ext(m: re.Match) -> str:
        nonlocal n_external
        n_external += 1
        return m.group(2) or ""

    text = _EXT_LINK.sub(ext, text)
    text = _MAGIC.sub("", text)
    text = _TAG.sub("", text)
    text = _APOS.sub("", text)
    n_sections = 0
    lines: list[str] = []
    for raw in text.split("\n"):
        line = raw.strip()
        hm = _HEADING.match(line)
        if hm:
            n_sections += 1
            line = hm.group(2)
        else:
            line = _LIST.sub("", line)
        line = re.sub(r"[ \t]+", " ", line).strip()
        if line:
            lines.append(line)
    return {
        "text": "\n".join(lines),
        "n_sections": n_sections,
        "n_templates": n_templates,
        "n_internal_links": n_internal,
        "n_external_links": n_external,
        "n_refs": n_refs,
    }
