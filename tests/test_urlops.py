"""Declarative URL canonicalization (functions/urlops.py)."""

import pytest

from pdf_spark.functions.urlops import (
    canonicalize_url,
    host_of,
    registrable_domain,
)

CASES = [
    # (raw, canonical, host, registrable domain)
    ("HTTPS://WWW.Example.COM:443/A/B?utm_source=x&id=7#frag",
     "https://www.example.com/A/B?id=7", "www.example.com", "example.com"),
    ("http://user:pw@Host.Example.ORG:80/p?a=1&b=2",
     "http://host.example.org/p?a=1&b=2", "host.example.org", "example.org"),
    ("https://Example.Net", "https://example.net/", "example.net", "example.net"),
    ("http://h.example.com:8080/x", "http://h.example.com:8080/x",
     "h.example.com", "example.com"),
    ("https://e.co.uk/p?gclid=1&fbclid=2&utm_medium=m", "https://e.co.uk/p",
     "e.co.uk", "e.co.uk"),
    ("https://news.bbc.co.uk/x", "https://news.bbc.co.uk/x",
     "news.bbc.co.uk", "bbc.co.uk"),
    ("  https://t.example.com/x#f  ", "https://t.example.com/x",
     "t.example.com", "example.com"),
    # schemeless / relative / garbage: total function, trimmed passthrough
    ("relative/path?q=1", "relative/path?q=1", "", ""),
    ("mailto:x@example.com", "mailto:x@example.com", "", ""),
    ("", "", "", ""),
    # keeps non-tracking param order; strips only the tracking ones
    ("https://a.de/p?z=1&utm_a=2&y=3&mc_eid=4&x=5",
     "https://a.de/p?z=1&y=3&x=5", "a.de", "a.de"),
    # localhost / single-label host
    ("http://localhost:8000/x", "http://localhost:8000/x",
     "localhost", "localhost"),
]


@pytest.fixture(scope="module")
def url_df(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, *_) in enumerate(CASES)], ["i", "raw"]
    )
    h = host_of("raw")
    rows = (
        df.select(
            "i",
            canonicalize_url("raw").alias("canon"),
            h.alias("host"),
            registrable_domain(h).alias("dom"),
        )
        .orderBy("i")
        .collect()
    )
    return rows


def test_canonicalize(url_df):
    for row, (raw, canon, _, _) in zip(url_df, CASES):
        assert row["canon"] == canon, raw


def test_host(url_df):
    for row, (raw, _, host, _) in zip(url_df, CASES):
        assert row["host"] == host, raw


def test_registrable_domain(url_df):
    for row, (raw, _, _, dom) in zip(url_df, CASES):
        assert row["dom"] == dom, raw


def test_idempotent(spark):
    df = spark.createDataFrame([(raw,) for raw, *_ in CASES], ["raw"])
    once = df.select(canonicalize_url("raw").alias("u"))
    twice = once.select(canonicalize_url("u").alias("u"))
    assert [r["u"] for r in once.collect()] == [r["u"] for r in twice.collect()]


def test_no_python_udf_in_plan(spark):
    df = spark.createDataFrame([("https://x.example/a",)], ["raw"])
    out = df.select(canonicalize_url("raw"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


RESOLVE_CASES = [
    # (base, href, resolved) — RFC 3986 §5.4 reference-resolution shapes
    ("https://h.org/a/b/c.html", "d.html", "https://h.org/a/b/d.html"),
    ("https://h.org/a/b/c.html", "./d.html", "https://h.org/a/b/d.html"),
    ("https://h.org/a/b/c.html", "../d", "https://h.org/a/d"),
    ("https://h.org/a/b/c.html", "../../d", "https://h.org/d"),
    # over-root .. clamps at / (§5.4.2 abnormal examples)
    ("https://h.org/a/b/c.html", "../../../../d", "https://h.org/d"),
    ("https://h.org/a/b/c.html", "/rooted?q=1", "https://h.org/rooted?q=1"),
    ("https://h.org/a/b/c.html", "//cdn.net/z", "https://cdn.net/z"),
    ("https://h.org/a/b/c.html", "http://x.y/p#f", "http://x.y/p"),
    ("https://h.org/a/b/c.html", "?q=2", "https://h.org/a/b/c.html?q=2"),
    ("https://h.org/a/b/c.html", "", "https://h.org/a/b/c.html"),
    ("https://h.org/a/b/c.html", "#top", "https://h.org/a/b/c.html"),
    ("https://h.org/a/b/c.html", "mailto:u@v", "mailto:u@v"),
    # authority-only base: merge happens onto the implicit root path
    ("https://h.org", "x/y", "https://h.org/x/y"),
    ("https://h.org", "?q", "https://h.org/?q"),
    # dotted mixes; trailing /. and /..
    ("https://h.org/a/b/", "./x/./y/../z", "https://h.org/a/b/x/z"),
    ("https://h.org/a/b/c", "..", "https://h.org/a/"),
    ("https://h.org/a/b/c", ".", "https://h.org/a/b/"),
    # dots inside ordinary segment names must NOT collapse
    ("https://h.org/v1.2/lib/", "x.min.js", "https://h.org/v1.2/lib/x.min.js"),
    ("https://h.org/a/", "..b/c", "https://h.org/a/..b/c"),
    # schemeless base: total-function passthrough of the href
    ("page.html", "x/y", "x/y"),
]


def test_resolve_url_cases(spark):
    from pdf_spark.functions.urlops import resolve_url

    df = spark.createDataFrame(
        [(i, b, h) for i, (b, h, _) in enumerate(RESOLVE_CASES)],
        ["i", "base", "href"],
    )
    rows = (
        df.select("i", resolve_url("base", "href").alias("r"))
        .orderBy("i")
        .collect()
    )
    for row, (b, h, want) in zip(rows, RESOLVE_CASES):
        assert row["r"] == want, (b, h, row["r"], want)


def test_resolve_url_stays_jvm_side(spark):
    from pdf_spark.functions.urlops import resolve_url

    df = spark.createDataFrame([("https://x.example/a/", "b/c")], ["b", "h"])
    out = df.select(resolve_url("b", "h"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
