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
