"""robots.txt parser + crawl-derived cache: parsing semantics on
handcrafted bodies, and the fixtures round-trip — the cache built from
the pages table must be decision-equivalent to the declared fixture
rules for every path shape the corpus contains."""

from __future__ import annotations

from crawlspark.fixtures import robots_rows
from crawlspark.robots import parse_robots_txt, robots_rows_from_pages
from crawlspark.simulator import robots_decision

SAMPLE = """\
# comment line
User-agent: googlebot
Disallow: /private/

User-agent: *
Disallow: /apply/
Allow: /apply/ok/
Crawl-delay: 2.5

User-agent: evilbot
Disallow: /
"""


def test_star_group_selected():
    rules, delay = parse_robots_txt(SAMPLE, agent="crawlspark")
    assert (False, "/apply/") in rules
    assert (True, "/apply/ok/") in rules
    assert (True, "/") in rules  # implicit backstop
    assert (False, "/private/") not in rules  # googlebot group not ours
    assert delay == 2.5


def test_exact_agent_overrides_star():
    rules, delay = parse_robots_txt(SAMPLE, agent="googlebot-images")
    assert (False, "/private/") in rules
    assert delay is None


def test_empty_disallow_means_allow_all():
    rules, _ = parse_robots_txt("User-agent: *\nDisallow:\n")
    assert rules == [(True, "/")]


def test_shared_agent_lines():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x/\n"
    rules, _ = parse_robots_txt(txt, agent="b")
    assert (False, "/x/") in rules


def test_none_and_garbage():
    assert parse_robots_txt(None) == ([(True, "/")], None)
    rules, delay = parse_robots_txt("not a robots file at all")
    assert rules == [(True, "/")] and delay is None


def test_cache_from_pages_round_trips_fixture(spark, tiny_pages):
    derived = {r["host"]: r for r in robots_rows_from_pages(tiny_pages)}
    declared = {r["host"]: r for r in robots_rows(42, "tiny")}
    assert set(derived) == set(declared)
    probe_paths = [
        "/", "/job/123", "/apply/9", "/apply/", "/private/x",
        "/data-engineer-jobs/in-All-Sydney-NSW?page=2", "/page/3?id=3",
    ]
    for host, dec in declared.items():
        der = derived[host]
        # decision-equivalence on every corpus path shape
        for p in probe_paths:
            assert robots_decision(der["rules"], p) == robots_decision(
                dec["rules"], p
            ), (host, p)
        # crawl_delay survives the round trip
        assert der["crawl_delay"] == dec["crawl_delay"]
