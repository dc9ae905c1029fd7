"""robots.txt parsing + rule evaluation (RFC 9309).

Crawl pipelines evaluate politeness *offline* too: given an archived
robots.txt per host, which of the captured URLs were crawlable? This
module is that evaluator — a pure function of (robots bytes, agent,
path), matching the REP as specified in RFC 9309 (the Google
robots.txt parser semantics):

- groups: consecutive ``User-agent`` lines share the following rules;
  the group whose agent token is the LONGEST match for the client agent
  applies (``*`` matches all, specific beats ``*``).
- rules: ``Allow`` / ``Disallow`` path patterns with ``*`` wildcards and
  a ``$`` end anchor; percent-encoding compared literally.
- decision: the longest-pattern matching rule wins; on a tie Allow wins;
  no match or empty pattern -> allowed.

The reference engine has no crawl-side code; this is net-new, public-spec
capability like the WARC connector. Never raises; garbage lines are
skipped per the RFC's error tolerance.
"""

from __future__ import annotations

import re
from typing import Iterable, Optional

_LINE_RE = re.compile(rb"^\s*([A-Za-z\-]+)\s*:\s*(.*?)\s*$")


def parse_robots(data: bytes) -> list:
    """robots.txt bytes -> list of (agents, rules) groups, where agents is
    a list of lowercased user-agent tokens and rules is a list of
    (is_allow, pattern) in file order. Comments (#) and junk lines are
    dropped; an empty line does NOT end a group (RFC 9309 §2.2.1 —
    only a new User-agent line after rules starts a new group)."""
    groups: list = []
    agents: list = []
    rules: list = []
    in_rules = False
    for raw in data.split(b"\n"):
        hash_at = raw.find(b"#")
        if hash_at != -1:
            raw = raw[:hash_at]
        m = _LINE_RE.match(raw)
        if m is None:
            continue
        key = m.group(1).lower()
        val = m.group(2)
        if key == b"user-agent":
            if in_rules:
                if agents:
                    groups.append((agents, rules))
                agents, rules, in_rules = [], [], False
            agents.append(val.lower().decode("utf-8", "replace"))
        elif key in (b"allow", b"disallow"):
            in_rules = True
            rules.append(
                (key == b"allow", val.decode("utf-8", "replace"))
            )
        elif key in (b"sitemap", b"crawl-delay"):
            in_rules = True  # a directive ends the user-agent run too
    if agents:
        groups.append((agents, rules))
    return groups


def _select_group(groups: list, agent: str) -> Optional[list]:
    """Longest-token agent match; '*' is the fallback (RFC 9309 §2.2.1)."""
    agent = agent.lower()
    best_len = -1
    best_rules: Optional[list] = None
    star_rules: Optional[list] = None
    for agents, rules in groups:
        for tok in agents:
            if tok == "*":
                if star_rules is None:
                    star_rules = rules
            elif tok and tok in agent and len(tok) > best_len:
                best_len = len(tok)
                best_rules = rules
    return best_rules if best_rules is not None else star_rules


def _pattern_matches(pattern: str, path: str) -> bool:
    """'*' wildcard + '$' end anchor, literal otherwise (RFC 9309 §2.2.3).

    Linear greedy segment matching (not a backtracking regex): a hostile
    robots.txt packing hundreds of '*' into one rule must cost O(path),
    never exponential. Greedy leftmost placement of each literal segment
    is complete for this glob dialect because trailing input is free."""
    if "*" not in pattern and not pattern.endswith("$"):
        return path.startswith(pattern)
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    segs = pattern.split("*")
    if not path.startswith(segs[0]):
        return False
    pos = len(segs[0])
    if len(segs) == 1:
        return path[pos:] == "" if anchored else True
    last = segs[-1]
    # the anchored tail claims the end of the path; middles must fit
    # strictly before it
    limit = len(path) - len(last) if anchored else len(path)
    if anchored and (limit < pos or not path.endswith(last)):
        return False
    for seg in segs[1:-1] if anchored else segs[1:]:
        if not seg:
            continue
        hit = path.find(seg, pos, limit if anchored else len(path))
        if hit == -1 or (anchored and hit + len(seg) > limit):
            return False
        pos = hit + len(seg)
    return True


def is_allowed(groups: list, agent: str, path: str) -> bool:
    """Longest-match decision for one (agent, path); default allowed."""
    rules = _select_group(groups, agent)
    if not rules:
        return True
    best_len = -1
    best_allow = True
    for is_allow, pattern in rules:
        if not pattern:
            continue  # empty Disallow == allow everything, matches nothing
        if _pattern_matches(pattern, path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and is_allow and not best_allow):
                best_len = plen
                best_allow = is_allow
    return best_allow


def allowed_mask(
    data: bytes, agent: str, paths: Iterable[str]
) -> list:
    """Vector form for batch evaluation: one parse, many paths."""
    groups = parse_robots(data)
    return [is_allowed(groups, agent, p) for p in paths]


def parse_crawl_delays(data: bytes) -> list:
    """robots.txt bytes -> list of (agents, delay_seconds) groups.

    Crawl-delay is an extension directive (outside RFC 9309's grammar
    but honored by Bing/Yandex and emitted by a large fraction of real
    robots files); group boundaries follow the same rules as
    parse_robots. Non-numeric / negative values are ignored; fractional
    seconds are kept (some CDNs emit '0.5')."""
    groups: list = []
    agents: list = []
    delay = None
    in_rules = False
    for raw in data.split(b"\n"):
        hash_at = raw.find(b"#")
        if hash_at != -1:
            raw = raw[:hash_at]
        m = _LINE_RE.match(raw)
        if m is None:
            continue
        key = m.group(1).lower()
        val = m.group(2)
        if key == b"user-agent":
            if in_rules:
                if agents:
                    groups.append((agents, delay))
                agents, delay, in_rules = [], None, False
            agents.append(val.lower().decode("utf-8", "replace"))
        elif key == b"crawl-delay":
            in_rules = True
            try:
                d = float(val.decode("ascii", "replace").strip())
                if d >= 0:
                    delay = d
            except ValueError:
                pass
        elif key in (b"allow", b"disallow", b"sitemap"):
            in_rules = True
    if agents:
        groups.append((agents, delay))
    return groups


def crawl_delay_for(data: bytes, agent: str) -> Optional[float]:
    """The effective Crawl-delay for `agent`: longest-token agent match
    with '*' fallback (same group selection as the Allow/Disallow path);
    None when the selected group (or the whole file) sets no delay."""
    agent = agent.lower()
    best_len = -1
    best: Optional[float] = None
    star: Optional[float] = None
    saw_star = False
    for agents, delay in parse_crawl_delays(data):
        for tok in agents:
            if tok == "*":
                if not saw_star:
                    star = delay
                    saw_star = True
            elif tok and tok in agent and len(tok) > best_len:
                best_len = len(tok)
                best = delay
    return best if best_len >= 0 else star
