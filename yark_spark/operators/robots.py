"""robots.txt (RFC 9309) engine from scratch (round 12): group
parsing (stacked ``User-agent`` lines, case-insensitive product
tokens, ``*`` fallback group), ``Allow``/``Disallow`` rules with the
REP wildcard grammar (``*`` spans any octets, ``$`` anchors the end),
comment stripping, and the RFC's precedence algorithm — the MOST
SPECIFIC (longest) matching rule wins, with ``Allow`` beating
``Disallow`` on ties; no matching rule means allowed — nothing
imported.

Every responsible crawl pipeline runs this filter FIRST: Common Crawl
honors robots at fetch time, and dataset builders re-check it at
curation time when a domain's policy changed after the crawl (the
"robots revocation" pass). A training-data engine that ingests WARC
(q_warc_scan) but cannot evaluate the policy that governs those
fetches is missing the gatekeeper op of the family.

Wildcard semantics, pinned by tests: ``Disallow: /t`` is a prefix
rule; ``Disallow: /*/private`` floats over any first segment;
``Allow: /public$`` matches exactly ``/public`` and nothing longer;
an empty ``Disallow:`` matches nothing (the classic allow-all
idiom). Specificity = the rule path's character length, wildcards
included (the Googlebot/RFC reference behavior).

Oracle recipe: rule matching IS SQL-expressible — each rule becomes a
LIKE pattern (``*`` → ``%``, ``$`` drops the trailing ``%``), and the
RFC precedence is one ``max_by`` over (length, is_allow). The Spark
side runs this Python engine over a broadcast-sized policy and must
hash-match DuckDB's independent LIKE-based re-derivation per URL.
Grammar/precedence vectors live in tests/test_robots.py.
"""

from __future__ import annotations

import re

__all__ = ["parse_robots", "rules_for_agent", "robots_decision"]


def parse_robots(text: str) -> list[tuple[list[str], list[tuple[bool, str]]]]:
    """Parse robots.txt into groups: (user_agents, [(is_allow, path)]).
    Stacked User-agent lines share one rule list; unknown directives
    and comments are skipped (the RFC requires tolerant parsing)."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    collecting_agents = True
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not collecting_agents:
                if agents:
                    groups.append((agents, rules))
                agents, rules = [], []
                collecting_agents = True
            agents.append(value.lower())
        elif field in ("allow", "disallow"):
            collecting_agents = False
            if agents:
                rules.append((field == "allow", value))
        # sitemap/crawl-delay/unknown: ignored
    if agents:
        groups.append((agents, rules))
    return groups


def rules_for_agent(
    groups: list[tuple[list[str], list[tuple[bool, str]]]], agent: str
) -> list[tuple[bool, str]]:
    """Select the group per RFC 9309: the longest product-token match
    wins; the ``*`` group is the fallback; no group → no rules."""
    agent = agent.lower()
    best_len, best_rules = -1, []
    star_rules = None
    for agents, rules in groups:
        for ua in agents:
            if ua == "*":
                if star_rules is None:
                    star_rules = rules
            elif ua in agent or agent in ua:
                if len(ua) > best_len:
                    best_len, best_rules = len(ua), rules
    if best_len >= 0:
        return best_rules
    return star_rules if star_rules is not None else []


def _rule_regex(path: str) -> re.Pattern:
    anchored = path.endswith("$")
    body = path[:-1] if anchored else path
    pattern = "".join(".*" if c == "*" else re.escape(c) for c in body)
    return re.compile("^" + pattern + ("$" if anchored else ""))


def robots_decision(
    rules: list[tuple[bool, str]], url_path: str
) -> tuple[bool, str | None]:
    """Apply RFC 9309 precedence: longest matching rule wins, Allow
    beats Disallow on ties; empty-path rules match nothing; no match →
    allowed. Returns (allowed, matched_rule_or_None)."""
    best: tuple[int, bool, str] | None = None
    for is_allow, path in rules:
        if not path:
            continue  # "Disallow:" (empty) — the allow-all idiom
        if _rule_regex(path).match(url_path):
            key = (len(path), is_allow)
            if best is None or key > (best[0], best[1]):
                best = (len(path), is_allow, path)
    if best is None:
        return True, None
    return best[1], best[2]
