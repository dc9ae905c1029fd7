"""robots.txt evaluator (core/robots.py, RFC 9309)."""

import random

from pdf_spark.core.robots import allowed_mask, is_allowed, parse_robots

ROBOTS = b"""
# example
User-agent: googlebot
Disallow: /private/
Allow: /private/ok.html

User-agent: *
Disallow: /tmp/
Disallow: /*.pdf$
Allow: /tmp/public*
"""


def test_group_selection():
    g = parse_robots(ROBOTS)
    assert len(g) == 2
    # specific group beats '*' and groups are NOT merged
    assert is_allowed(g, "Googlebot/2.1", "/private/x") is False
    assert is_allowed(g, "Googlebot/2.1", "/private/ok.html") is True
    assert is_allowed(g, "Googlebot/2.1", "/tmp/x") is True
    assert is_allowed(g, "otherbot", "/tmp/x") is False


def test_longest_match_and_wildcards():
    g = parse_robots(ROBOTS)
    assert is_allowed(g, "otherbot", "/tmp/public/x") is True  # longer Allow
    assert is_allowed(g, "otherbot", "/doc.pdf") is False  # $ anchor
    assert is_allowed(g, "otherbot", "/doc.pdfx") is True
    assert is_allowed(g, "otherbot", "/anything") is True


def test_allow_wins_ties():
    g = parse_robots(b"User-agent: *\nDisallow: /a/b\nAllow: /a/b\n")
    assert is_allowed(g, "x", "/a/b/c") is True


def test_multi_agent_group_and_case():
    g = parse_robots(b"User-Agent: AgentA\nuser-agent: agentb\nDISALLOW: /\n")
    assert is_allowed(g, "AGENTB/2", "/x") is False
    assert is_allowed(g, "agenta", "/x") is False
    assert is_allowed(g, "agentc", "/x") is True  # no '*' group


def test_empty_and_garbage():
    assert is_allowed(parse_robots(b""), "x", "/a") is True
    assert is_allowed(parse_robots(b"\xff\xfe junk\n::\nDisallow /x"), "x", "/a") is True
    # empty Disallow matches nothing (allow-all idiom)
    g = parse_robots(b"User-agent: *\nDisallow:\n")
    assert is_allowed(g, "x", "/anything") is True


def test_directive_ends_agent_run():
    # a second User-agent AFTER rules starts a NEW group
    g = parse_robots(
        b"User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n"
    )
    assert is_allowed(g, "a", "/x1") is False
    assert is_allowed(g, "a", "/y1") is True
    assert is_allowed(g, "b", "/y1") is False


def test_fuzz_never_raises():
    rng = random.Random(777)
    for _ in range(300):
        buf = bytearray(ROBOTS)
        for _ in range(rng.randint(1, 12)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        g = parse_robots(bytes(buf))
        a = [is_allowed(g, "googlebot", "/private/x") for _ in range(2)]
        assert a[0] == a[1]  # deterministic
        allowed_mask(bytes(buf), "x", ["/a", "/b"])


def test_adversarial_wildcards_linear():
    """A hostile rule packing hundreds of '*' must match in O(path) —
    the matcher is greedy segment placement, not a backtracking regex."""
    import time

    from pdf_spark.core.robots import _pattern_matches as pm

    assert pm("/a*b*c", "/aXbYc") and not pm("/a*b*c", "/acb")
    assert pm("/a*b$", "/aXYb") and not pm("/a*b$", "/aXbY")
    assert not pm("/ab*b$", "/ab") and pm("/ab*b$", "/abb")
    hostile = "/" + "*a" * 200 + "$"
    path = "/" + "a" * 500 + "b"  # fails only at the anchor
    t0 = time.perf_counter()
    for _ in range(100):
        assert pm(hostile, path) is False
    assert time.perf_counter() - t0 < 1.0


class TestCrawlDelay:
    def test_agent_group_wins_over_star(self):
        from pdf_spark.core.robots import crawl_delay_for

        r = (b"User-agent: trainbot\nCrawl-delay: 3\nDisallow: /x\n\n"
             b"User-agent: *\nCrawl-delay: 60\n")
        assert crawl_delay_for(r, "trainbot/1.0") == 3.0
        assert crawl_delay_for(r, "otherbot") == 60.0

    def test_no_delay_is_none(self):
        from pdf_spark.core.robots import crawl_delay_for

        assert crawl_delay_for(b"User-agent: *\nDisallow: /\n", "bot") is None

    def test_invalid_values_ignored(self):
        from pdf_spark.core.robots import crawl_delay_for

        assert crawl_delay_for(b"User-agent: a\nCrawl-delay: -5\n", "a") is None
        assert crawl_delay_for(b"User-agent: a\nCrawl-delay: soon\n", "a") is None

    def test_fractional_kept(self):
        from pdf_spark.core.robots import crawl_delay_for

        assert crawl_delay_for(b"User-agent: a\nCrawl-delay: 0.5\n", "a") == 0.5

    def test_longest_token_match(self):
        from pdf_spark.core.robots import crawl_delay_for

        r = (b"User-agent: train\nCrawl-delay: 9\n\n"
             b"User-agent: trainbot\nCrawl-delay: 2\n")
        assert crawl_delay_for(r, "trainbot/1.0") == 2.0

    def test_shared_group_boundaries_with_rules_parser(self):
        # a directive line ends the user-agent run exactly as in
        # parse_robots: the second UA opens a NEW group
        from pdf_spark.core.robots import crawl_delay_for

        r = (b"User-agent: a\nDisallow: /x\nUser-agent: b\nCrawl-delay: 7\n")
        assert crawl_delay_for(r, "a") is None
        assert crawl_delay_for(r, "b") == 7.0
