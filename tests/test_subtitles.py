"""Unit tests for core/subtitles.py (SRT + WebVTT cue parse)."""

from pdf_spark.core.subtitles import parse_cues, subtitle_meta


def test_srt_basic_and_tag_strip():
    srt = (
        b"1\n00:00:01,000 --> 00:00:02,500\nHello there\n\n"
        b"2\n00:00:03,000 --> 00:00:04,000\n<i>World</i>\n"
    )
    fmt, cues = parse_cues(srt)
    assert fmt == "srt"
    assert cues == [(1000, 2500, "Hello there"), (3000, 4000, "World")]
    m = subtitle_meta(srt)
    assert (m["speech_ms"], m["span_ms"], m["density_milli"]) == (
        2500, 3000, 833,
    )


def test_vtt_hourless_settings_note_and_id():
    vtt = (
        b"WEBVTT\n\n"
        b"NOTE this comment\nspans lines\n\n"
        b"STYLE\n::cue { color: red }\n\n"
        b"intro\n00:01.000 --> 00:02.000 align:start\nFirst cue\n\n"
        b"01:00:05.000 --> 01:00:06.250\n<c.yellow>Second</c> cue\n"
    )
    fmt, cues = parse_cues(vtt)
    assert fmt == "vtt"
    assert cues[0] == (1000, 2000, "First cue")
    assert cues[1] == (3605000, 3606250, "Second cue")


def test_malformed_blocks_skipped_and_rejects():
    bad = (
        b"1\n00:00:01,000 --> 00:00:02,000\nok\n\n"
        b"2\ngarbage --> stamps\nskipped\n\n"
        b"3\n00:00:03,000 --> 00:00:02,000\nend before start\n\n"
        b"4\n00:00:05,000 --> 00:00:05,500\nok2\n"
    )
    fmt, cues = parse_cues(bad)
    assert fmt == "srt" and len(cues) == 2
    # non-captions route out with NULL fields
    assert subtitle_meta(b"<html>x</html>")["fmt"] is None
    assert subtitle_meta(b"")["fmt"] is None
    # multi-line cue text joins with single spaces
    two = b"1\n00:00:00,000 --> 00:00:01,000\nline one\nline two\n"
    assert parse_cues(two)[1][0][2] == "line one line two"
