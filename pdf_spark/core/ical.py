"""iCalendar (RFC 5545) event extraction — the events/schedule tier.

Public calendars (.ics) are a structured crawl payload with their own
framing rules that break naive line parsers:

- LINE UNFOLDING first: a CRLF (or bare LF) followed by one space or
  tab continues the previous line — SUMMARY lines in the wild are
  almost always folded;
- property parameters (``DTSTART;TZID=...:...``) split on the FIRST
  colon, parameters on ``;`` before it;
- TEXT value unescaping per §3.3.11: ``\\n`` → newline, ``\\,`` ``\\;``
  ``\\\\`` → literal;
- ``VEVENT`` blocks between BEGIN/END; DTSTART/DTEND in the basic
  ``YYYYMMDDTHHMMSS[Z]`` and all-day ``YYYYMMDD`` forms, parsed to
  integer minutes-since-epoch-day arithmetic kept EXACT (no datetime
  library, no timezone math — TZID routing is a downstream concern);
- event cap against calendar bombs.

Outputs: event count, first event's summary, total scheduled minutes
(sum of DTEND-DTSTART over events carrying both), RRULE presence.
"""

from __future__ import annotations

import re

__all__ = ["ical_events", "EVENT_CAP"]

EVENT_CAP = 10_000

_DT = re.compile(r"^(\d{8})(?:T(\d{2})(\d{2})(\d{2})Z?)?$")
_ESC = re.compile(r"\\([nN,;\\])")


def _unfold(text: str) -> list[str]:
    lines: list[str] = []
    for raw in text.split("\n"):
        raw = raw.rstrip("\r")
        if raw[:1] in (" ", "\t") and lines:
            lines[-1] += raw[1:]
        else:
            lines.append(raw)
    return lines


def _unescape(value: str) -> str:
    return _ESC.sub(
        lambda m: "\n" if m.group(1) in "nN" else m.group(1), value
    )


def _minutes(value: str) -> int | None:
    """Datetime value → integer minutes since day 0 (proleptic days
    counted as ymd-ordinal arithmetic: exactness matters, wall-clock
    correctness across calendars does not — only DIFFERENCES are used)."""
    m = _DT.match(value.strip())
    if not m:
        return None
    ymd = m.group(1)
    y, mo, d = int(ymd[:4]), int(ymd[4:6]), int(ymd[6:8])
    # days via the standard civil-from-ymd integer algorithm
    yy = y - (mo <= 2)
    era = yy // 400
    yoe = yy - era * 400
    doy = (153 * (mo + (-3 if mo > 2 else 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    days = era * 146097 + doe
    mins = days * 1440
    if m.group(2):
        mins += int(m.group(2)) * 60 + int(m.group(3))
    return mins


def ical_events(data: bytes) -> dict:
    """Wire bytes → event inventory (report-don't-raise)."""
    null = {
        "is_ical": 0,
        "n_events": None,
        "first_summary": None,
        "total_minutes": None,
        "has_rrule": None,
    }
    try:
        text = data.decode("utf-8")
    except UnicodeDecodeError:
        return null
    lines = _unfold(text)
    if not any(ln.strip().upper() == "BEGIN:VCALENDAR" for ln in lines[:5]):
        return null
    n_events = 0
    first_summary = None
    total = 0
    has_rrule = 0
    cur: dict[str, str] | None = None
    for ln in lines:
        if not ln:
            continue
        head, _, value = ln.partition(":")
        name = head.split(";", 1)[0].upper()
        if name == "BEGIN" and value.strip().upper() == "VEVENT":
            cur = {}
            continue
        if name == "END" and value.strip().upper() == "VEVENT":
            if cur is not None and n_events < EVENT_CAP:
                n_events += 1
                if first_summary is None and "SUMMARY" in cur:
                    first_summary = _unescape(cur["SUMMARY"])
                if "RRULE" in cur:
                    has_rrule = 1
                s, e = cur.get("DTSTART"), cur.get("DTEND")
                if s is not None and e is not None:
                    sm, em = _minutes(s), _minutes(e)
                    if sm is not None and em is not None and em >= sm:
                        total += em - sm
            cur = None
            continue
        if cur is not None:
            cur.setdefault(name, value)
    return {
        "is_ical": 1,
        "n_events": n_events,
        "first_summary": first_summary,
        "total_minutes": total,
        "has_rrule": has_rrule,
    }
