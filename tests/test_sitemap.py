"""Sitemap parser (core/sitemap.py)."""

import gzip
import random

from pdf_spark.core.sitemap import MAX_ENTRIES, parse_sitemap

SM = (b'<?xml version="1.0" encoding="UTF-8"?>\n'
      b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
      b"<url><loc>https://ex.com/a?x=1&amp;y=2</loc>"
      b"<lastmod>2024-01-05</lastmod></url>\n"
      b"<url><loc> https://ex.com/b </loc></url>\n"
      b"<url><lastmod>2024-01-01</lastmod></url>\n"  # no loc: skipped
      b"</urlset>")


def test_urlset():
    kind, entries = parse_sitemap(SM)
    assert kind == "urlset"
    assert entries == [
        ("https://ex.com/a?x=1&y=2", "2024-01-05"),
        ("https://ex.com/b", None),
    ]


def test_gzip_wrapped():
    assert parse_sitemap(gzip.compress(SM, mtime=0)) == parse_sitemap(SM)


def test_index():
    idx = (b"<sitemapindex><sitemap>"
           b"<loc>https://ex.com/s1.xml.gz</loc>"
           b"<lastmod>2024-02-02</lastmod></sitemap></sitemapindex>")
    assert parse_sitemap(idx) == (
        "index", [("https://ex.com/s1.xml.gz", "2024-02-02")]
    )


def test_not_a_sitemap():
    assert parse_sitemap(b"<html><body>nope</body></html>") == ("", [])
    assert parse_sitemap(b"") == ("", [])
    assert parse_sitemap(b"\x1f\x8btruncated gzip") == ("", [])


def test_entry_cap():
    body = b"<url><loc>https://e/x</loc></url>" * (MAX_ENTRIES + 10)
    kind, entries = parse_sitemap(b"<urlset>" + body + b"</urlset>")
    assert kind == "urlset" and len(entries) == MAX_ENTRIES


def test_fuzz_never_raises():
    rng = random.Random(99)
    for _ in range(300):
        buf = bytearray(SM)
        for _ in range(rng.randint(1, 10)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        a = parse_sitemap(bytes(buf))
        assert a == parse_sitemap(bytes(buf))  # deterministic, no raise


# --- RSS / Atom feeds ----------------------------------------------------------

RSS = (b'<?xml version="1.0"?><rss version="2.0"><channel>'
       b"<title>Site</title><link>https://ex.com</link>"
       b"<item><title><![CDATA[Post & One]]></title>"
       b"<link>https://ex.com/p1?a=1&amp;b=2</link></item>"
       b"<item><link> https://ex.com/p2 </link></item>"
       b"<item><title>no link, skipped</title></item>"
       b"</channel></rss>")

ATOM = (b'<feed xmlns="http://www.w3.org/2005/Atom"><title>F</title>'
        b'<link href="https://ex.com/"/>'
        b'<entry><title>A1</title>'
        b'<link rel="alternate" href="https://ex.com/a1"/></entry>'
        b"<entry><link href='https://ex.com/a2'/></entry></feed>")


def test_rss():
    from pdf_spark.core.sitemap import parse_feed

    assert parse_feed(RSS) == ("rss", [
        ("https://ex.com/p1?a=1&b=2", "Post & One"),
        ("https://ex.com/p2", None),
    ])


def test_atom():
    from pdf_spark.core.sitemap import parse_feed

    assert parse_feed(ATOM) == ("atom", [
        ("https://ex.com/a1", "A1"),
        ("https://ex.com/a2", None),
    ])


def test_feed_gzip_and_rejects():
    from pdf_spark.core.sitemap import parse_feed

    assert parse_feed(gzip.compress(RSS, mtime=0)) == parse_feed(RSS)
    assert parse_feed(b"<html>nope</html>") == ("", [])
    assert parse_feed(SM) == ("", [])  # sitemaps are not feeds


def test_feed_fuzz_never_raises():
    from pdf_spark.core.sitemap import parse_feed

    rng = random.Random(1212)
    for _ in range(300):
        buf = bytearray(RSS if rng.random() < 0.5 else ATOM)
        for _ in range(rng.randint(1, 10)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        assert parse_feed(bytes(buf)) == parse_feed(bytes(buf))
