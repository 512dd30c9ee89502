"""robots.txt engine tests (round 12): RFC 9309 group selection
(stacked agents, longest product-token match, * fallback), wildcard
and anchor grammar, the longest-match / allow-wins-ties precedence,
empty-Disallow idiom, tolerant parsing, and the published REP
examples."""

from yark_spark.operators.robots import (
    parse_robots,
    robots_decision,
    rules_for_agent,
)

POLICY = """\
# fixture
User-agent: trainbot
Disallow: /t
Allow: /table/
Disallow: /*/key
Disallow: /small$
Allow:

User-agent: gptbot
User-agent: ccbot
Disallow: /

User-agent: *
Disallow: /private
"""


def _rules(agent="trainbot"):
    return rules_for_agent(parse_robots(POLICY), agent)


def test_group_selection():
    assert _rules("TrainBot/1.0")[0] == (False, "/t")
    # stacked agents share one rule list
    assert _rules("GPTBot") == [(False, "/")]
    assert _rules("CCBot/2.0") == [(False, "/")]
    # unknown agent falls back to *
    assert _rules("randombot") == [(False, "/private")]


def test_prefix_and_longest_match():
    r = _rules()
    assert robots_decision(r, "/the/row") == (False, "/t")
    # /table/ (len 7) beats /t (len 2) — allow wins by specificity
    assert robots_decision(r, "/table/row") == (True, "/table/")
    # /table/ (7) also beats /*/key (6)
    assert robots_decision(r, "/table/key") == (True, "/table/")


def test_wildcard_spans_octets():
    assert robots_decision(_rules(), "/value/key") == (False, "/*/key")
    assert robots_decision(_rules(), "/a/b/key") == (False, "/*/key")


def test_dollar_anchor_exact():
    r = _rules()
    assert robots_decision(r, "/small") == (False, "/small$")
    assert robots_decision(r, "/small/row") == (True, None)  # anchor blocks longer


def test_allow_beats_disallow_on_tie():
    rules = [(False, "/page"), (True, "/page")]
    assert robots_decision(rules, "/page/x") == (True, "/page")


def test_empty_disallow_is_allow_all():
    assert robots_decision([(False, "")], "/anything") == (True, None)


def test_no_match_is_allowed():
    assert robots_decision(_rules(), "/zeta/row") == (True, None)


def test_tolerant_parsing():
    g = parse_robots(
        "Sitemap: https://x/s.xml\nUser-agent: a\nCrawl-delay: 5\n"
        "Disallow: /x # trailing comment\nnonsense line\n"
    )
    assert rules_for_agent(g, "a") == [(False, "/x")]


def test_rfc_wildcard_examples():
    # shapes from the REP documentation: /fish*, /*.php, /*.php$
    rules = [(False, "/fish*"), (False, "/*.php$")]
    assert robots_decision(rules, "/fish.html") == (False, "/fish*")
    assert robots_decision(rules, "/fishheads/yummy.html") == (False, "/fish*")
    assert robots_decision(rules, "/index.php") == (False, "/*.php$")
    assert robots_decision(rules, "/index.php?x=1") == (True, None)  # $ blocks query
    assert robots_decision(rules, "/Fish.asp") == (True, None)  # case-sensitive


def test_longest_agent_token_wins():
    g = parse_robots(
        "User-agent: bot\nDisallow: /a\n\nUser-agent: trainbot\nDisallow: /b\n"
    )
    assert rules_for_agent(g, "trainbot") == [(False, "/b")]


def test_rfc_groups_with_same_agent_combine():
    """RFC 9309 §2.2.1: multiple groups addressed to the same agent
    MUST combine (review finding: only the first was used)."""
    g = parse_robots(
        "User-agent: trainbot\nDisallow: /a\n\n"
        "User-agent: trainbot\nDisallow: /b\n"
    )
    rules = rules_for_agent(g, "trainbot")
    assert robots_decision(rules, "/a/x") == (False, "/a")
    assert robots_decision(rules, "/b/x") == (False, "/b")


def test_substring_match_is_one_directional():
    """'bot' must NOT capture the 'gptbot' group (review finding: the
    reverse substring test let short agents steal named groups)."""
    g = parse_robots(
        "User-agent: gptbot\nDisallow: /\n\nUser-agent: *\nDisallow: /private\n"
    )
    assert rules_for_agent(g, "bot") == [(False, "/private")]
    # and a longer agent string still matches its named group
    assert rules_for_agent(g, "gptbot/1.2 (+https://x)") == [(False, "/")]
