"""robots.txt compliance (round 11 — operators/robots.py): RFC 9309
parsing (groups, shadowing, merging), pattern translation
(wildcards, anchors, metachars), longest-match verdicts, and
agreement with urllib.robotparser exactly where urllib implements
the spec (it ignores * and $ and uses first-match — the divergent
cases are asserted against hand-derived RFC behavior instead)."""

from __future__ import annotations

import urllib.robotparser

import pytest
from pyspark.sql import functions as F

from top_produce_etl_spark.operators.robots import (
    parse_robots,
    robots_allowed,
)

TXT = """# demo
User-agent: *
Disallow: /private/
Allow: /private/pub
Disallow: /tmp*.log
Disallow: /exact$
Crawl-delay: 5

User-agent: otherbot
User-agent: trainingbot
Disallow: /no-ai/
Allow: /
"""


def _verdicts(spark, agent, paths, txt=TXT):
    robots = spark.createDataFrame(
        [("d", txt)], "domain string, robots_txt string"
    )
    rules = parse_robots(robots, agent=agent)
    urls = spark.createDataFrame(
        [(i, "d", p) for i, p in enumerate(paths)],
        "doc_id int, domain string, path string",
    )
    return {
        r["path"]: r["allowed"]
        for r in robots_allowed(urls, rules).collect()
    }


def test_specific_group_shadows_star(spark):
    """trainingbot has its own (stacked-UA) group: the * group's
    rules must NOT apply — urllib agrees on this."""
    paths = ["/", "/private/x", "/no-ai/page", "/tmp1.log"]
    got = _verdicts(spark, "trainingbot", paths)
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(TXT.splitlines())
    for p in paths:
        assert got[p] == rp.can_fetch("trainingbot", p), p


def test_star_group_rfc_semantics(spark):
    """An agent with no specific group gets the * group under RFC
    9309: longest-match-wins (allow /private/pub overrides
    disallow /private/), * wildcards and $ anchors live."""
    got = _verdicts(
        spark,
        "somebot",
        [
            "/", "/private/x", "/private/pub/ok", "/private/pubx",
            "/tmp1.log", "/tmp.txt", "/xtmp2.log",
            "/exact", "/exact2",
        ],
    )
    assert got["/"] is True
    assert got["/private/x"] is False
    assert got["/private/pub/ok"] is True  # longest match wins
    assert got["/private/pubx"] is True  # prefix, not segment, match
    assert got["/tmp1.log"] is False  # * wildcard
    assert got["/tmp.txt"] is True
    assert got["/xtmp2.log"] is True  # pattern anchored at start
    assert got["/exact"] is False  # $ anchor
    assert got["/exact2"] is True


def test_metachars_literal_and_junk_lines(spark):
    txt = (
        "User-agent: *\n"
        "badline\n"
        "Disallow:\n"  # empty value -> no restriction
        "Disallow: /a+b(c)/\n"
        "Allow: /a+b(c)/ok\n"
    )
    got = _verdicts(
        spark, "x", ["/a+b(c)/d", "/a+b(c)/ok2", "/apb"], txt=txt
    )
    assert got["/a+b(c)/d"] is False
    assert got["/a+b(c)/ok2"] is True
    assert got["/apb"] is True  # '+' is literal, not regex


def test_no_rules_everything_allowed(spark):
    got = _verdicts(spark, "x", ["/anything"], txt="# empty\n")
    assert got["/anything"] is True


def test_robots_filter_yaml_op(spark):
    """The declarative gate keeps exactly the allowed URLs."""
    from top_produce_etl_spark.operators.robots import (
        synthesize_robots_corpus,
    )
    from top_produce_etl_spark.plans.builder import build_pipeline

    docs = spark.range(100).selectExpr("id AS doc_id")
    robots, urls = synthesize_robots_corpus(docs)
    spec = {
        "source": "urls",
        "ops": [
            {
                "op": "robots_filter",
                "robots_table": "robots",
                "agent": "trainingbot",
            }
        ],
    }
    got = build_pipeline(
        spark, spec, {"urls": urls, "robots": robots}
    )
    assert set(got.columns) == {"doc_id", "domain", "path"}
    kept = {r["doc_id"] for r in got.collect()}
    # handwritten
    from top_produce_etl_spark.operators.robots import (
        parse_robots,
        robots_allowed,
    )

    hand = {
        r["doc_id"]
        for r in robots_allowed(
            urls, parse_robots(robots, agent="trainingbot")
        ).collect()
        if r["allowed"]
    }
    assert kept == hand and 0 < len(kept) < 100
