"""Subtitle / caption parsing (SRT + WebVTT) — the text half of an
audio/video training pair.

Crawled AV corpora align speech to text through sidecar caption files;
the pipeline tier that matters at 10^12 blobs is a cheap deterministic
cue parse: how much SPEECH TIME a caption file covers, how many cues,
how dense the speech is over the captioned span — that is what gates
which videos are worth a (costly) audio decode + alignment pass.

Formats (both public, line-oriented text):

- SubRip (.srt): blocks of ``index`` / ``HH:MM:SS,mmm --> HH:MM:SS,mmm``
  / text lines, separated by blank lines.
- WebVTT (W3C): a ``WEBVTT`` magic line, then cue blocks whose timestamp
  line uses ``.`` for the millisecond separator, allows the hour field
  to be omitted, and may carry cue settings after the arrow; optional
  cue identifiers precede the timestamp line; NOTE/STYLE/REGION blocks
  are skipped.

Every number is integer milliseconds — no float anywhere — so the audit
is engine-exact. Malformed cue blocks are SKIPPED (a half-broken caption
file still routes its parseable cues; bomb-capped at ``CUE_CAP``).

Reference parity note: the reference engine (someone13574/pdf) has no
caption surface at all — net-new, like the E126+ media formats.
"""

from __future__ import annotations

import re

__all__ = ["parse_cues", "subtitle_meta", "CUE_CAP"]

CUE_CAP = 10_000  # adversarial cue-count bomb

# SRT: comma millis, hours required. VTT: dot millis, hours optional,
# optional settings after the end stamp.
_TS_RE = re.compile(
    r"(?:(\d{1,2}):)?(\d{1,2}):(\d{2})[,.](\d{3})"
)
_ARROW_RE = re.compile(
    r"^\s*((?:\d{1,2}:)?\d{1,2}:\d{2}[,.]\d{3})\s*-->\s*"
    r"((?:\d{1,2}:)?\d{1,2}:\d{2}[,.]\d{3})(?:\s+(.*))?$"
)
_VTT_MAGIC = re.compile(r"^﻿?WEBVTT(?:[ \t].*)?$")
_TAG_RE = re.compile(r"<[^>]*>")  # VTT inline tags (<i>, <c.yellow>, ...)


def _ts_ms(stamp: str) -> int | None:
    m = _TS_RE.fullmatch(stamp.strip())
    if m is None:
        return None
    hh = int(m.group(1)) if m.group(1) else 0
    mm, ss, mmm = int(m.group(2)), int(m.group(3)), int(m.group(4))
    if ss >= 60:
        return None
    return ((hh * 60 + mm) * 60 + ss) * 1000 + mmm


def parse_cues(data: bytes) -> tuple[str | None, list]:
    """``(format, cues)`` where format is ``"srt"`` / ``"vtt"`` / None
    and each cue is ``(start_ms, end_ms, text)`` with inline VTT tags
    stripped and text whitespace-normalized. Cues with end <= start or
    unparseable stamps are skipped; parse stops at ``CUE_CAP``."""
    try:
        text = data.decode("utf-8", "replace")
    except AttributeError:  # str already
        text = data
    lines = text.splitlines()
    fmt = None
    i = 0
    if lines and _VTT_MAGIC.match(lines[0]):
        fmt = "vtt"
        i = 1
    cues: list = []
    n = len(lines)
    while i < n and len(cues) < CUE_CAP:
        # skip blank separators
        while i < n and not lines[i].strip():
            i += 1
        if i >= n:
            break
        block_head = lines[i].strip()
        # VTT structural blocks are skipped wholesale
        if fmt == "vtt" and block_head.split(" ")[0] in (
            "NOTE", "STYLE", "REGION",
        ):
            while i < n and lines[i].strip():
                i += 1
            continue
        m = _ARROW_RE.match(lines[i])
        if m is None:
            # optional cue id / SRT index line, then the arrow line
            i += 1
            if i < n:
                m = _ARROW_RE.match(lines[i])
        if m is None:
            # malformed block: skip to the next blank line
            while i < n and lines[i].strip():
                i += 1
            continue
        start, end = _ts_ms(m.group(1)), _ts_ms(m.group(2))
        i += 1
        body: list[str] = []
        while i < n and lines[i].strip():
            body.append(lines[i])
            i += 1
        if fmt is None:
            # first parseable arrow line decides: comma millis = SRT
            fmt = "srt" if "," in m.group(1) else "vtt"
        if start is None or end is None or end <= start:
            continue
        cue_text = " ".join(_TAG_RE.sub("", " ".join(body)).split())
        cues.append((start, end, cue_text))
    return fmt, cues


def subtitle_meta(data: bytes) -> dict:
    """Caption routing metadata, integer-ms exact::

        {fmt, n_cues, speech_ms, span_ms, n_chars, density_milli}

    ``speech_ms`` sums cue durations (overlaps counted as authored —
    simultaneous speakers ARE more speech), ``span_ms`` = last end -
    first start, ``density_milli`` = floor(1000 * speech / span).
    Non-caption payloads -> ``{"fmt": None, ...}`` with NULL-ish
    fields (routing decision, not an error)."""
    fmt, cues = parse_cues(data)
    if fmt is None or not cues:
        return {
            "fmt": None, "n_cues": None, "speech_ms": None,
            "span_ms": None, "n_chars": None, "density_milli": None,
        }
    speech = sum(e - s for s, e, _t in cues)
    span = max(e for _s, e, _t in cues) - min(s for s, _e, _t in cues)
    chars = sum(len(t) for _s, _e, t in cues)
    return {
        "fmt": fmt,
        "n_cues": len(cues),
        "speech_ms": speech,
        "span_ms": span,
        "n_chars": chars,
        "density_milli": (1000 * speech) // span if span else 1000,
    }
