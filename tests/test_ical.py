"""core/ical.py — RFC 5545 framing: unfolding, escapes, durations."""

from pdf_spark.core.ical import ical_events


def _cal(body: str) -> bytes:
    return f"BEGIN:VCALENDAR\r\nVERSION:2.0\r\n{body}END:VCALENDAR\r\n".encode()


def test_basic_event_duration_and_summary():
    data = _cal(
        "BEGIN:VEVENT\r\n"
        "SUMMARY:Team sync\r\n"
        "DTSTART:20260820T090000Z\r\n"
        "DTEND:20260820T103000Z\r\n"
        "END:VEVENT\r\n"
    )
    m = ical_events(data)
    assert m["is_ical"] == 1 and m["n_events"] == 1
    assert m["first_summary"] == "Team sync"
    assert m["total_minutes"] == 90
    assert m["has_rrule"] == 0


def test_folded_line_and_text_escapes():
    data = _cal(
        "BEGIN:VEVENT\r\n"
        "SUMMARY:Part one\\, part \r\n"
        " two\\nline\r\n"
        "END:VEVENT\r\n"
    )
    m = ical_events(data)
    assert m["first_summary"] == "Part one, part two\nline"


def test_allday_event_params_and_rrule():
    data = _cal(
        "BEGIN:VEVENT\r\n"
        "DTSTART;VALUE=DATE:20260820\r\n"
        "DTEND;VALUE=DATE:20260822\r\n"
        "RRULE:FREQ=WEEKLY\r\n"
        "END:VEVENT\r\n"
        "BEGIN:VEVENT\r\n"
        "SUMMARY:Second\r\n"
        "END:VEVENT\r\n"
    )
    m = ical_events(data)
    assert m["n_events"] == 2
    assert m["total_minutes"] == 2 * 1440  # two all-day days
    assert m["has_rrule"] == 1
    assert m["first_summary"] == "Second"  # first event had none


def test_cross_month_duration_exact():
    data = _cal(
        "BEGIN:VEVENT\r\n"
        "DTSTART:20260131T230000Z\r\n"
        "DTEND:20260201T010000Z\r\n"
        "END:VEVENT\r\n"
    )
    assert ical_events(data)["total_minutes"] == 120


def test_not_ical():
    assert ical_events(b"PLAIN TEXT")["is_ical"] == 0
    assert ical_events(b"\xff\xfe\x00binary")["is_ical"] == 0
