"""Tests for robots.txt politeness (operators/robots.py)."""

from __future__ import annotations

from wine_label_ocr_spark.operators.robots import (
    parse_robots, parse_robots_rules, robots_allowed)

R1 = "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
R2 = "User-agent: badbot\nDisallow: /\n\nUser-agent: *\nDisallow: /tmp/\n"


def test_parse_robots_groups_and_rules():
    assert parse_robots(R1) == [(False, "/private/"), (True, "/private/ok")]
    # exact agent outranks *; agent match is case-insensitive
    assert parse_robots(R2) == [(False, "/tmp/")]
    assert parse_robots(R2, agent="BadBot") == [(False, "/")]
    # stacked user-agent lines share one group; unmatched agent -> []
    r3 = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots(r3, "b") == [(False, "/x")]
    assert parse_robots(r3, "z") == []
    # empty Disallow is void; trailing * stripped; other wildcards dropped
    assert parse_robots("User-agent: *\nDisallow:\n") == []
    assert parse_robots(
        "User-agent: *\nDisallow: /a*\nDisallow: /b$\nDisallow: /c*d\n"
    ) == [(False, "/a")]
    # comments and junk lines tolerated
    assert parse_robots("# note\nUser-agent: * # inline\nDisallow: /q\nnoise\n") \
        == [(False, "/q")]
    assert parse_robots("") == [] and parse_robots(None) == []


def test_robots_allowed_longest_match(spark):
    robots = spark.createDataFrame(
        [("h0.com", R1), ("h1.com", "User-agent: *\nDisallow: /\n"),
         ("h2.com", ""), ("h3.com", R2)],
        "host string, robots_txt string")
    rules = parse_robots_rules(robots)
    urls = spark.createDataFrame(
        [("https://h0.com/public/x",), ("https://h0.com/private/x",),
         ("https://h0.com/private/ok/x",), ("https://H1.com/any",),
         ("https://h2.com/x",), ("https://h3.com/tmp/z",),
         ("https://h3.com/fine",), ("https://norobots.com/y",),
         ("notaurl",)],
        "url string")
    got = {r["url"]: r["allowed"]
           for r in robots_allowed(urls, rules).collect()}
    assert got == {
        "https://h0.com/public/x": True,
        "https://h0.com/private/x": False,       # /private/ disallow
        "https://h0.com/private/ok/x": True,     # longer Allow wins
        "https://H1.com/any": False,             # host case-insensitive
        "https://h2.com/x": True,                # empty robots
        "https://h3.com/tmp/z": False,
        "https://h3.com/fine": True,
        "https://norobots.com/y": True,          # no robots row
        "notaurl": True,                         # non-URL rows pass
    }
