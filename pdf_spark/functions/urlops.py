"""URL canonicalization — declarative, JVM-side, zero Python per row.

Every crawl pipeline dedups and joins on a canonical URL key (SURT-style
normalisation; cf. the Common-Crawl index's url canonicalizer). At 10^12
rows this runs inside whole-stage codegen as pure Catalyst expressions —
a Python UDF here would be the single hottest regression in the engine,
so everything below is built from `pyspark.sql.functions` only.

Normalisation rules (the widely-agreed-safe subset):

- scheme and host lowercased; userinfo dropped
- default port stripped (``http:80``, ``https:443``); others kept
- fragment removed
- empty path -> ``/``
- tracking params removed (``utm_*``, ``gclid``, ``fbclid``,
  ``msclkid``, ``mc_eid``, ``igshid``); remaining params keep their
  order (reordering is NOT safe in general); ``?`` dropped if the query
  empties
- inputs with no ``scheme://`` (relative/garbage) pass through trimmed —
  canonicalization must be total, never raise

``registrable_domain`` approximates the public-suffix cut with the
common two-level suffixes; production would broadcast the full public
PSL as a lookup table — the expression shape (split + element_at) is the
same.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?.*$"

_TRACKING_RE = "^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|igshid)="

# common two-level public suffixes (approximate PSL cut)
_TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "co.kr", "or.kr", "go.kr", "ac.kr",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.sg", "com.hk",
    "co.za", "co.nz", "co.id", "co.th", "com.my", "com.ph", "com.vn",
    "com.pl", "com.ru", "com.ua", "co.il", "com.sa", "com.eg",
)


def _strip_fragment(url: Column) -> Column:
    return F.regexp_replace(F.trim(url), "#.*$", "")


def canonicalize_url(url) -> Column:
    """Canonical form of a URL column (see module docstring for rules)."""
    u = _strip_fragment(F.col(url) if isinstance(url, str) else url)
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    authority = F.regexp_extract(u, _URL_RE, 2)
    path = F.regexp_extract(u, _URL_RE, 3)
    query = F.regexp_extract(u, _URL_RE, 4)

    host = F.lower(F.regexp_extract(authority, r"^(?:[^@]*@)?([^:]*)", 1))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    port_part = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))

    path_part = F.when(path == "", F.lit("/")).otherwise(path)

    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    q = F.array_join(kept, "&")
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))

    return F.when(
        scheme == "", u  # schemeless: pass through trimmed/defragmented
    ).otherwise(F.concat(scheme, F.lit("://"), host, port_part, path_part, q_part))


def host_of(url) -> Column:
    """Lowercased host of a URL column ('' when schemeless)."""
    u = _strip_fragment(F.col(url) if isinstance(url, str) else url)
    authority = F.regexp_extract(u, _URL_RE, 2)
    return F.lower(F.regexp_extract(authority, r"^(?:[^@]*@)?([^:]*)", 1))


def registrable_domain(host) -> Column:
    """Approximate registrable domain (eTLD+1) of a host column."""
    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(".", F.element_at(parts, -3), last2)
    is_two_level = last2.isin(*_TWO_LEVEL_SUFFIXES)
    return (
        F.when(n <= 1, h)
        .when((n >= 3) & is_two_level, last3)
        .otherwise(last2)
    )


def surt_key(url) -> Column:
    """SURT form of a URL column — the Common-Crawl CDX index's sort key.

    ``https://www.Example.org/a/b?x=1`` -> ``org,example)/a/b?x=1``:
    host lowercased, leading ``www.`` dropped, labels reversed and
    comma-joined, ``)`` separator, path+query appended verbatim (empty
    path -> ``/``). Scheme, port and fragment never participate (ports
    are non-canonical in the CDX key; fragments never reach the index).
    Like everything in this module it is a single codegen'd Catalyst
    projection — no Python per row.
    """
    u = _strip_fragment(F.col(url) if isinstance(url, str) else url)
    authority = F.regexp_extract(u, _URL_RE, 2)
    host = F.lower(F.regexp_extract(authority, r"^(?:[^@]*@)?([^:]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_extract(u, _URL_RE, 3)
    query = F.regexp_extract(u, _URL_RE, 4)
    path_part = F.when(path == "", F.lit("/")).otherwise(path)
    q_part = F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query))
    return F.when(host == "", u).otherwise(
        F.concat(rev, F.lit(")"), path_part, q_part)
    )


_DOT_DEPTH = 8  # bounded ../-collapse passes (max nesting depth handled)

# "one path segment that is not '.' or '..'" WITHOUT lookahead — the
# pattern must stay inside the RE2 subset so the DuckDB oracle can run the
# character-identical regex (RE2 has no lookarounds; Java does, but a
# mirrored oracle beats a cleverer pattern)
_SEG = r"(?:[^/.][^/]*|\.[^/.][^/]*|\.\.[^/]+)"


def resolve_url(base, href) -> Column:
    """RFC 3986 §5 reference resolution — the frontier op that turns a
    page's raw ``<a href>`` values into absolute crawl targets. Pure
    Catalyst expressions (codegen'd; zero Python per row): at 10^12 link
    rows this is the hottest projection in frontier construction.

    Branches (§5.2.2): absolute href kept; ``//authority`` adopts the base
    scheme; ``/rooted`` replaces the path; ``?query`` replaces the query;
    empty href = the (defragmented) base; anything else merges onto the
    base path's directory. Dot segments are then collapsed (§5.2.4) by
    bounded regex passes: ``/./`` drops, ``/seg/../`` contracts
    (``_DOT_DEPTH`` nesting levels — deeper chains stay partially
    collapsed, documented), leading ``/../`` clamps to ``/``. Fragments
    are stripped on both inputs (crawl frontiers never keep them);
    schemeless bases pass the href through trimmed — resolution is total,
    never raises."""
    b = _strip_fragment(F.col(base) if isinstance(base, str) else base)
    h = _strip_fragment(F.col(href) if isinstance(href, str) else href)
    scheme = F.lower(F.regexp_extract(b, _URL_RE, 1))
    authority = F.regexp_extract(b, _URL_RE, 2)
    bpath = F.regexp_extract(b, _URL_RE, 3)
    root = F.concat(scheme, F.lit("://"), authority)
    # base-path directory: up to and including the last '/'; '/' when the
    # base path is empty (an authority's implicit root, §5.2.3)
    bdir = F.regexp_replace(bpath, "[^/]*$", "")
    bdir = F.when(bdir == "", F.lit("/")).otherwise(bdir)
    resolved = (
        F.when(scheme == "", F.trim(h))
        .when(h == "", b)
        .when(h.rlike("^[A-Za-z][A-Za-z0-9+.\\-]*:"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(root, h))
        .when(
            h.startswith("?"),
            F.concat(
                root,
                F.when(bpath == "", F.lit("/")).otherwise(bpath),
                h,
            ),
        )
        .otherwise(F.concat(root, bdir, h))
    )
    # dot-segment removal on the path component only
    pre = F.regexp_extract(resolved, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1)
    rest = F.substring(resolved, F.length(pre) + F.lit(1), F.lit(1 << 20))
    path = F.regexp_extract(rest, r"^([^?#]*)", 1)
    query = F.substring(rest, F.length(path) + F.lit(1), F.lit(1 << 20))
    for _ in range(2):  # '/./' passes (non-overlapping matches need two)
        path = F.regexp_replace(path, r"/\.(/)", "$1")
    path = F.regexp_replace(path, r"/\.$", "/")
    for _ in range(_DOT_DEPTH):
        # literal '/' (not a backreference): at end-of-path the RFC keeps
        # the trailing slash ('/a/b/..' -> '/a/', §5.2.4 step 2C)
        path = F.regexp_replace(path, "/" + _SEG + r"/\.\.(/|$)", "/")
    path = F.regexp_replace(path, r"^(/\.\.)+(/|$)", "/")
    return F.when(pre == "", resolved).otherwise(F.concat(pre, path, query))


# --- driver-contract query -----------------------------------------------------

QUERIES = {}
ORACLE = {}


def _qt20(spark, sf):
    """Canonicalize six deterministic messy-URL classes (userinfo, default
    and non-default ports, mixed-case scheme/host, tracking params,
    fragments, whitespace, schemeless passthrough) built from doc_id —
    entirely declarative, so the whole query is one codegen'd projection.
    The oracle CONSTRUCTS the expected canonical form per class rather
    than reimplementing the algorithm."""
    from pdf_spark.functions.tables import load

    docs = load(spark, sf, "documents").select("doc_id")
    i = F.col("doc_id")
    s = i.cast("string")
    messy = (
        F.when(i % 6 == 0, F.concat(F.lit("HTTPS://WWW.Example.COM:443/Doc/"), s,
                                    F.lit("?utm_source=feed&id="), s, F.lit("#sec")))
        .when(i % 6 == 1, F.concat(F.lit("http://user:pw@News.example.CO.UK:80/a//b?x="), s,
                                   F.lit("&utm_campaign=c&y=2")))
        .when(i % 6 == 2, F.lit("https://Example.Org"))
        .when(i % 6 == 3, F.concat(F.lit("HTTP://blog.example.com.au:8080/p"), s,
                                   F.lit("?fbclid=abc")))
        .when(i % 6 == 4, F.concat(F.lit("  https://example.net/x"), s,
                                   F.lit("?utm_source=a&utm_medium=b#f  ")))
        .otherwise(F.concat(F.lit("mailto:someone"), s, F.lit("@example.com")))
    )
    host = host_of(messy)
    return docs.select(
        "doc_id",
        canonicalize_url(messy).alias("url_canon"),
        host.alias("host"),
        registrable_domain(host).alias("domain"),
    )


QUERIES["qt20_url_canonicalize"] = _qt20
ORACLE["qt20_url_canonicalize"] = """
SELECT doc_id,
       CASE doc_id % 6
         WHEN 0 THEN 'https://www.example.com/Doc/' || doc_id || '?id=' || doc_id
         WHEN 1 THEN 'http://news.example.co.uk/a//b?x=' || doc_id || '&y=2'
         WHEN 2 THEN 'https://example.org/'
         WHEN 3 THEN 'http://blog.example.com.au:8080/p' || doc_id
         WHEN 4 THEN 'https://example.net/x' || doc_id
         ELSE 'mailto:someone' || doc_id || '@example.com'
       END AS url_canon,
       CASE doc_id % 6
         WHEN 0 THEN 'www.example.com'
         WHEN 1 THEN 'news.example.co.uk'
         WHEN 2 THEN 'example.org'
         WHEN 3 THEN 'blog.example.com.au'
         WHEN 4 THEN 'example.net'
         ELSE ''
       END AS host,
       CASE doc_id % 6
         WHEN 0 THEN 'example.com'
         WHEN 1 THEN 'example.co.uk'
         WHEN 2 THEN 'example.org'
         WHEN 3 THEN 'example.com.au'
         WHEN 4 THEN 'example.net'
         ELSE ''
       END AS domain
FROM documents
"""


def _qt28(spark, sf):
    """SURT keys + CDX-J index parse (the Common-Crawl index format).

    Each doc synthesizes one CDX-J line — ``<surt-urlkey> <14-digit
    timestamp> <json>`` — from a deterministic URL class, then the query
    PARSES it back: urlkey split, timestamp field, JSON payload fields
    via ``get_json_object`` (JVM JsonPath inside codegen — Python never
    touches the JSON). The oracle constructs every expected value
    arithmetically, so the SURT computation, the line split and the JSON
    access are all independently checked. Shape at 10^12 rows: one
    narrow codegen'd projection, zero exchanges.
    """
    from pdf_spark.functions.tables import load

    docs = load(spark, sf, "documents").select("doc_id", "n_chars")
    i = F.col("doc_id")
    s = i.cast("string")
    url = (
        F.when(i % 4 == 0, F.concat(F.lit("https://www.site"), (i % 7).cast("string"),
                                    F.lit(".example.com/page/"), s))
        .when(i % 4 == 1, F.concat(F.lit("http://Archive.example.ORG/item?id="), s,
                                   F.lit("&ref=x")))
        .when(i % 4 == 2, F.concat(F.lit("https://cdn.example.net:8443/asset/"), s,
                                   F.lit(".js")))
        .otherwise(F.lit("https://example.io"))
    )
    ts = (F.lit(20240101000000) + i).cast("string")
    mime = F.when(i % 2 == 0, F.lit("text/html")).otherwise(F.lit("application/pdf"))
    status = F.when(i % 5 == 0, F.lit("404")).otherwise(F.lit("200"))
    payload = F.concat(
        F.lit('{"url":"'), url,
        F.lit('","mime":"'), mime,
        F.lit('","status":"'), status,
        F.lit('","length":"'), F.col("n_chars").cast("string"),
        F.lit('"}'),
    )
    line = F.concat(surt_key(url), F.lit(" "), ts, F.lit(" "), payload)

    cdx = docs.select("doc_id", line.alias("cdx_line"))
    parts = F.split(F.col("cdx_line"), " ", 3)
    return cdx.select(
        "doc_id",
        F.element_at(parts, 1).alias("urlkey"),
        F.element_at(parts, 2).alias("cdx_ts"),
        F.get_json_object(F.element_at(parts, 3), "$.mime").alias("mime"),
        F.get_json_object(F.element_at(parts, 3), "$.status")
            .cast("bigint").alias("status"),
        F.get_json_object(F.element_at(parts, 3), "$.length")
            .cast("bigint").alias("content_length"),
        F.get_json_object(F.element_at(parts, 3), "$.url").alias("url"),
    )


QUERIES["qt28_surt_cdx_index"] = _qt28
ORACLE["qt28_surt_cdx_index"] = """
SELECT doc_id,
       CASE doc_id % 4
         WHEN 0 THEN 'com,example,site' || (doc_id % 7) || ')/page/' || doc_id
         WHEN 1 THEN 'org,example,archive)/item?id=' || doc_id || '&ref=x'
         WHEN 2 THEN 'net,example,cdn)/asset/' || doc_id || '.js'
         ELSE 'io,example)/'
       END AS urlkey,
       CAST(20240101000000 + doc_id AS VARCHAR) AS cdx_ts,
       CASE WHEN doc_id % 2 = 0 THEN 'text/html' ELSE 'application/pdf' END AS mime,
       CAST(CASE WHEN doc_id % 5 = 0 THEN 404 ELSE 200 END AS BIGINT) AS status,
       CAST(n_chars AS BIGINT) AS content_length,
       CASE doc_id % 4
         WHEN 0 THEN 'https://www.site' || (doc_id % 7) || '.example.com/page/' || doc_id
         WHEN 1 THEN 'http://Archive.example.ORG/item?id=' || doc_id || '&ref=x'
         WHEN 2 THEN 'https://cdn.example.net:8443/asset/' || doc_id || '.js'
         ELSE 'https://example.io'
       END AS url
FROM documents
"""


def _qt41(spark, sf):
    """Domain-tier filtering (the RefinedWeb/CCNet URL-filter stage): build
    five deterministic host classes from doc_id, cut each to its
    registrable domain (approximate-PSL, [[registrable_domain]]), and
    LEFT-join a broadcast blocklist of bad registrable domains — the
    production shape where the blocklist (UT1/adult lists, ~1M domains)
    is dimension-sized and the page table is 10^12 rows: blocklist
    broadcast, fact side never shuffles. Output is the per-domain audit
    (docs seen / docs blocked), one map-side-combined groupBy on a
    5-value key. The oracle CONSTRUCTS the expected domains and counts
    arithmetically per class, so it verifies the canonicalize -> host ->
    registrable-domain chain end to end without reimplementing it."""
    from pyspark.sql import functions as F

    from pdf_spark.functions.tables import load

    docs = load(spark, sf, "documents").select("doc_id")
    i = F.col("doc_id")
    s = i.cast("string")
    url = (
        F.when(i % 5 == 0, F.concat(F.lit("https://ads.TRACKER-NET.com/px?id="), s))
        .when(i % 5 == 1, F.concat(F.lit("HTTPS://www.News.example.CO.UK:443/a/"), s))
        .when(i % 5 == 2, F.concat(F.lit("http://blog.example.org/p"), s))
        .when(i % 5 == 3, F.concat(F.lit("http://SPAM-FARM.net/l"), s, F.lit("#x")))
        .otherwise(F.concat(F.lit("https://shop.example.com.au:8080/i"), s))
    )
    dom = registrable_domain(host_of(canonicalize_url(url)))
    block = spark.createDataFrame(
        [("tracker-net.com",), ("spam-farm.net",)], "bad_domain string"
    )
    joined = docs.select(dom.alias("domain")).join(
        F.broadcast(block), F.col("domain") == F.col("bad_domain"), "left"
    )
    return joined.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count("bad_domain").cast("bigint").alias("n_blocked"),
    )


QUERIES["qt41_domain_blocklist"] = _qt41
ORACLE["qt41_domain_blocklist"] = """
WITH cls AS (SELECT CAST(doc_id % 5 AS INT) AS c FROM documents)
SELECT CASE c
         WHEN 0 THEN 'tracker-net.com'
         WHEN 1 THEN 'example.co.uk'
         WHEN 2 THEN 'example.org'
         WHEN 3 THEN 'spam-farm.net'
         ELSE 'example.com.au'
       END AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(CASE WHEN c IN (0, 3) THEN COUNT(*) ELSE 0 END AS BIGINT) AS n_blocked
FROM cls GROUP BY c
"""


def _qt52(spark, sf):
    """RFC 3986 reference resolution over ten deterministic href classes
    per page (the frontier-construction op downstream of qx08's raw
    ``<a href>`` mining): plain relative, single/over-root ``..`` chains,
    ``.``-segment mixes, rooted, protocol-relative, absolute-with-
    fragment, query-only, empty, and non-http schemes. Entirely
    declarative — base, href and resolution are ONE codegen'd projection
    (posexplode of a 10-literal array is the only generator). The oracle
    CONSTRUCTS each expected absolute URL per class rather than mirroring
    the algorithm."""
    from pdf_spark.functions.tables import load

    docs = load(spark, sf, "documents").select("doc_id")
    i = F.col("doc_id")
    base = F.concat(
        F.lit("https://ex"), (i % 5).cast("string"),
        F.lit(".org/d"), (i % 3).cast("string"), F.lit("/sub/page.html"),
    )
    hrefs = F.array(
        F.concat(F.lit("img"), (i % 4).cast("string"), F.lit("/x.png")),
        F.lit("../up.html"),
        F.lit("../../../deep.html"),
        F.lit("/rooted/y?k=2"),
        F.lit("//cdn.other.net/z.js"),
        F.lit("https://abs.example.com/a#frag"),
        F.concat(F.lit("?q="), (i % 9).cast("string")),
        F.lit("./here/./a/../b.html"),
        F.lit(""),
        F.lit("mailto:someone@example.com"),
    )
    return (
        docs.select("doc_id", F.posexplode(hrefs).alias("case_no", "href"))
        .select(
            "doc_id",
            F.col("case_no").cast("long").alias("case_no"),
            resolve_url(base, F.col("href")).alias("resolved"),
        )
    )


QUERIES["qt52_link_resolution"] = _qt52
ORACLE["qt52_link_resolution"] = """
WITH cases AS (
  SELECT doc_id, i AS case_no,
         'https://ex' || (doc_id % 5) || '.org' AS root,
         '/d' || (doc_id % 3) || '/sub/' AS dir
  FROM documents, LATERAL UNNEST(generate_series(0, 9)) AS t(i)
)
SELECT doc_id, CAST(case_no AS BIGINT) AS case_no,
       CASE case_no
         WHEN 0 THEN root || dir || 'img' || (doc_id % 4) || '/x.png'
         WHEN 1 THEN root || '/d' || (doc_id % 3) || '/up.html'
         WHEN 2 THEN root || '/deep.html'
         WHEN 3 THEN root || '/rooted/y?k=2'
         WHEN 4 THEN 'https://cdn.other.net/z.js'
         WHEN 5 THEN 'https://abs.example.com/a'
         WHEN 6 THEN root || dir || 'page.html?q=' || (doc_id % 9)
         WHEN 7 THEN root || dir || 'here/b.html'
         WHEN 8 THEN root || dir || 'page.html'
         ELSE 'mailto:someone@example.com'
       END AS resolved
FROM cases
"""


def _qt63(spark, sf):
    """PII-in-URL scrub (E166) — URLs leak identity the text-side qt26
    mask never sees: unsubscribe links carry the subscriber's EMAIL in
    the path, session TOKENS ride query params, click-to-call links
    embed PHONE numbers; corpora shipping raw URLs ship the PII. Four
    deterministic classes (email-in-path / 32-hex session token /
    phone-in-query / clean) built from doc_id; the scrub is a chain of
    three JVM-codegen'd regexp_replace stages and each had_* flag is
    derived by comparing the stage output to its input (no second regex
    pass). The oracle CONSTRUCTS the expected masked form per class —
    the qt20 discipline, so no cross-engine regex semantics are ever
    load-bearing."""
    from pdf_spark.functions.tables import load

    docs = load(spark, sf, "documents").select("doc_id")
    i = F.col("doc_id")
    s = i.cast("string")
    host = F.concat(F.lit("https://h"), (i % 7).cast("string"),
                    F.lit(".example.com"))
    url = (
        F.when(i % 4 == 0, F.concat(host, F.lit("/unsubscribe/user"), s,
                                    F.lit("@mail"), (i % 5).cast("string"),
                                    F.lit(".com/confirm")))
        .when(i % 4 == 1, F.concat(host, F.lit("/account?session="),
                                   F.md5(s)))
        .when(i % 4 == 2, F.concat(host, F.lit("/call?tel=555-0"),
                                   (100 + i % 900).cast("string")))
        .otherwise(F.concat(host, F.lit("/article/"), s))
    )
    st1 = F.regexp_replace(
        url, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"
    )
    st2 = F.regexp_replace(st1, r"[0-9a-f]{32}", "[TOKEN]")
    st3 = F.regexp_replace(st2, r"[0-9]{3}-[0-9]{4}", "[PHONE]")
    return docs.select(
        "doc_id",
        st3.alias("url_scrubbed"),
        (st1 != url).cast("int").alias("had_email"),
        (st2 != st1).cast("int").alias("had_token"),
        (st3 != st2).cast("int").alias("had_phone"),
    )


QUERIES["qt63_url_pii_scrub"] = _qt63
ORACLE["qt63_url_pii_scrub"] = """
WITH v AS (
  SELECT doc_id,
         'https://h' || (doc_id % 7) || '.example.com' AS host
  FROM documents
)
SELECT doc_id,
       CASE doc_id % 4
         WHEN 0 THEN host || '/unsubscribe/[EMAIL]/confirm'
         WHEN 1 THEN host || '/account?session=[TOKEN]'
         WHEN 2 THEN host || '/call?tel=[PHONE]'
         ELSE host || '/article/' || doc_id
       END AS url_scrubbed,
       CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS INTEGER)
           AS had_email,
       CAST(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END AS INTEGER)
           AS had_token,
       CAST(CASE WHEN doc_id % 4 = 2 THEN 1 ELSE 0 END AS INTEGER)
           AS had_phone
FROM v
"""
