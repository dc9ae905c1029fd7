"""core/rtf.py — control-word stream extraction, spec-vector style."""

from pdf_spark.core.rtf import rtf_text


def test_plain_paragraphs():
    m = rtf_text(rb"{\rtf1\ansi Hello world.\par Second para.}")
    assert m["is_rtf"] == 1
    assert m["text"] == "Hello world.\nSecond para."
    assert m["n_pars"] == 1


def test_hex_and_unicode_escapes_with_uc_fallback():
    # \u8364 is EURO SIGN, then '?' — the '?' is the uc1 fallback and must be skipped;
    # \'e9 is windows-1252 é.
    m = rtf_text(rb"{\rtf1 Caf\'e9\tab X\u8364?Y}")
    assert m["text"] == "Café\tX€Y"


def test_uc0_means_no_fallback_skip():
    m = rtf_text(rb"{\rtf1\uc0 A\u233 B}")
    assert m["text"] == "AéB"


def test_negative_unicode_param_wraps_16bit():
    # \u-10179 == 0xD83D... surrogates aside, spec says add 65536.
    assert rtf_text(rb"{\rtf1\uc0 \u-1536 }")["text"] == chr(64000)


def test_destination_groups_skipped_with_nesting():
    data = (
        rb"{\rtf1{\fonttbl{\f0 Times New Roman;}{\f1 Arial;}}"
        rb"{\stylesheet{\s1 Heading;}}"
        rb"{\*\generator Acme Writer 9;}"
        rb"{\info{\title secret}}"
        rb"Visible text\par}"
    )
    m = rtf_text(data)
    assert m["text"] == "Visible text"
    assert m["n_pars"] == 1


def test_literal_escapes_and_special_chars():
    m = rtf_text(rb"{\rtf1 a\{b\}c\\d\~e\emdash f}")
    assert m["text"] == "a{b}c\\d e—f"


def test_starred_known_control_not_skipped():
    # {\*\par} would be odd but a starred group whose word is a text
    # control should still emit (ignore-if-unknown applies to unknown).
    m = rtf_text(rb"{\rtf1 x{\*\unknowndest {nested {deep}}}y}")
    assert m["text"] == "xy"


def test_not_rtf():
    m = rtf_text(b"plain text, no magic")
    assert m["is_rtf"] == 0 and m["text"] is None


def test_crlf_inside_stream_ignored():
    m = rtf_text(b"{\\rtf1 one\r\ntwo\\par\r\nthree}")
    assert m["text"] == "onetwo\nthree"
