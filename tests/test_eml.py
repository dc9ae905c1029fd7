"""core/eml.py — MIME extraction vs hand-built wire bytes (RFC vectors)."""

import base64

from pdf_spark.core.eml import eml_text, parse_headers


def test_simple_plain_crlf():
    data = (
        b"From: Ann <ann@News.Example.ORG>\r\n"
        b"Subject: Weekly update\r\n"
        b"Content-Type: text/plain; charset=utf-8\r\n"
        b"\r\n"
        b"Line one\r\nLine two\r\n"
    )
    m = eml_text(data)
    assert m["is_email"] == 1
    assert m["subject"] == "Weekly update"
    assert m["from_domain"] == "news.example.org"
    assert m["body_kind"] == "plain"
    assert m["body_text"] == "Line one\nLine two"
    assert m["n_parts"] == 1


def test_folded_header_and_rfc2047_subject():
    b64 = base64.b64encode("Re: offre café".encode()).decode()
    data = (
        f"Subject: =?utf-8?B?{b64}?=\n"
        "From: x@a.example\n"
        "X-Long: first\n\tcontinued\n"
        "\n"
        "body\n"
    ).encode()
    m = eml_text(data)
    assert m["subject"] == "Re: offre café"
    hdrs = parse_headers(data.split(b"\n\n")[0].decode())
    assert hdrs["x-long"] == "first continued"


def test_rfc2047_q_words_adjacent_whitespace_dropped():
    data = (
        b"Subject: =?utf-8?Q?Caf=C3=A9_one?= =?utf-8?Q?_two?=\n"
        b"From: y@b.example\n\nbody\n"
    )
    assert eml_text(data)["subject"] == "Café one two"


def test_multipart_alternative_prefers_plain():
    data = (
        b"From: a@c.example\n"
        b"Subject: s\n"
        b'Content-Type: multipart/alternative; boundary="BB"\n'
        b"\n"
        b"preamble ignored\n"
        b"--BB\n"
        b"Content-Type: text/html\n\n<p>Html ver</p>\n"
        b"--BB\n"
        b"Content-Type: text/plain\n"
        b"Content-Transfer-Encoding: quoted-printable\n\n"
        b"Caf=C3=A9 deal=\ns\n"
        b"--BB--\n"
    )
    m = eml_text(data)
    assert m["n_parts"] == 2
    assert m["body_kind"] == "plain"
    assert m["body_text"] == "Café deals"


def test_html_only_falls_back_to_stripped_html():
    data = (
        b"From: a@d.example\nSubject: s\n"
        b"Content-Type: text/html; charset=utf-8\n\n"
        b"<html><body><h1>Head</h1><p>Para</p></body></html>\n"
    )
    m = eml_text(data)
    assert m["body_kind"] == "html"
    assert m["body_text"] == "Head\nPara"


def test_base64_body_and_nested_multipart():
    inner = (
        b"Content-Type: text/plain\n"
        b"Content-Transfer-Encoding: base64\n\n"
        + base64.b64encode(b"Encoded note") + b"\n"
    )
    data = (
        b"From: a@e.example\nSubject: s\n"
        b'Content-Type: multipart/mixed; boundary="OUT"\n\n'
        b"--OUT\n"
        b'Content-Type: multipart/alternative; boundary="IN"\n\n'
        b"--IN\n" + inner + b"--IN--\n"
        b"--OUT--\n"
    )
    m = eml_text(data)
    assert m["body_text"] == "Encoded note" and m["n_parts"] == 1


def test_not_email_routes_nulls():
    for blob in (b"\x89PNG binary", b"no headers here just text"):
        m = eml_text(blob)
        assert m["is_email"] == 0 and m["body_text"] is None


def test_strip_reply_thread():
    from pdf_spark.core.eml import strip_reply

    t = (
        "Thanks!\n\nOn Tue, Ann wrote:\n> old one\n> old two\n\n"
        "My reply.\n-- \nBob\nexample.org\n"
    )
    r = strip_reply(t)
    assert r["clean_text"] == "Thanks!\n\nMy reply."
    assert r["n_quoted_lines"] == 2
    assert r["has_signature"] == 1 and r["has_attribution"] == 1


def test_strip_reply_wrote_line_kept_without_quote():
    from pdf_spark.core.eml import strip_reply

    r = strip_reply("He wrote:\nactual prose\nmore")
    assert r["clean_text"] == "He wrote:\nactual prose\nmore"
    assert r["has_attribution"] == 0


def test_strip_reply_nested_quotes_and_sig_only():
    from pdf_spark.core.eml import strip_reply

    r = strip_reply("Keep\n>> deep\n> shallow\n-- \nsig line\nmore sig")
    assert r["clean_text"] == "Keep"
    assert r["n_quoted_lines"] == 2 and r["has_signature"] == 1
