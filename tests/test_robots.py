"""RFC 9309 robots.txt: kernel parse/match semantics + Spark gate."""

from __future__ import annotations

from intelligent_document_processing_on_aws_spark.kernels.robots import (
    is_allowed,
    parse_robots,
    pattern_to_like,
    rules_for_agent,
)
from intelligent_document_processing_on_aws_spark.operators.robots import (
    parse_robots_rules,
    robots_gate,
    url_path,
)

ROBOTS = """\
# comment line
User-agent: fetchbot
User-agent: newsbot
Disallow: /private
Allow: /private/ok*

User-agent: *
Disallow: /tmp/*.bak$
Disallow:
Sitemap: https://example.com/s.xml
"""


def test_parse_groups_and_agent_selection():
    groups = parse_robots(ROBOTS)
    assert [g["agents"] for g in groups] == [
        ["fetchbot", "newsbot"], ["*"]]
    # exact agent group suppresses the * group; case-insensitive
    assert rules_for_agent(groups, "FetchBot") == [
        (False, "/private"), (True, "/private/ok*")]
    assert rules_for_agent(groups, "otherbot") == [
        (False, "/tmp/*.bak$")]
    # empty Disallow forbids nothing (dropped at parse)
    assert all(p for _, p in rules_for_agent(groups, "otherbot"))


def test_longest_match_precedence_and_anchor():
    groups = parse_robots(ROBOTS)
    r = rules_for_agent(groups, "fetchbot")
    assert is_allowed(r, "/private/x") == (False, 8)
    assert is_allowed(r, "/private/okay") == (True, 12)  # allow is longer
    assert is_allowed(r, "/public") == (True, 0)
    star = rules_for_agent(groups, "*")
    assert is_allowed(star, "/tmp/a.bak") == (False, 11)
    assert is_allowed(star, "/tmp/a.bakx") == (True, 0)  # $ anchor
    # tie on length -> Allow wins (RFC 9309 §2.2.2)
    tied = [(False, "/p/a"), (True, "/p/b")]
    assert is_allowed([(False, "/p"), (True, "/p")], "/p/x") == (True, 2)
    assert is_allowed(tied, "/p/b") == (True, 4)


def test_pattern_to_like_escapes_like_metachars():
    assert pattern_to_like("/a*b$") == "/a%b"
    assert pattern_to_like("/a") == "/a%"
    assert pattern_to_like("/100%_x") == "/100\\%\\_x%"


def test_url_path_extraction(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("https://h.example/a/b?q=1#f",),
         ("http://h.example",),
         ("https://h.example/?x",)],
        "url string",
    )
    got = [r["p"] for r in df.select(
        url_path(F.col("url")).alias("p")).collect()]
    assert got == ["/a/b", "/", "/"]


def test_robots_gate_end_to_end(spark):
    robots = spark.createDataFrame(
        [("h.example", ROBOTS), ("empty.example", "")],
        "host string, robots_txt string",
    )
    rules = parse_robots_rules(robots, agent="fetchbot")
    urls = spark.createDataFrame(
        [(1, "https://h.example/private/x?id=1", "h.example"),
         (2, "https://h.example/private/okay", "h.example"),
         (3, "https://h.example/public", "h.example"),
         (4, "https://empty.example/anything", "empty.example"),
         (5, "https://norobots.example/x", "norobots.example")],
        "doc_id long, url string, host string",
    )
    got = {r["doc_id"]: (r["allowed"], r["matched_len"])
           for r in robots_gate(urls, rules).collect()}
    assert got == {
        1: (False, 8),
        2: (True, 12),
        3: (True, 0),
        4: (True, 0),   # robots file with no rules for the agent
        5: (True, 0),   # host absent from the robots table
    }
    # plan: matching is native LIKE — the only Python stage is the parse
    plan = robots_gate(urls, rules)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") == 1


def test_crawl_delay_parsing_and_agent_resolution():
    from intelligent_document_processing_on_aws_spark.kernels.robots import (
        crawl_delay_for_agent,
        parse_robots,
    )

    robots = """
User-agent: fetchbot
Crawl-delay: 2.5
Disallow: /x

User-agent: *
Crawl-delay: 10
Crawl-delay: 99
Disallow: /y

User-agent: nodelay
Disallow: /z
"""
    groups = parse_robots(robots)
    assert crawl_delay_for_agent(groups, "FetchBot") == 2.5
    # first valid value per group wins
    assert crawl_delay_for_agent(groups, "randombot") == 10.0
    # exact group without a delay does NOT fall back to *
    assert crawl_delay_for_agent(groups, "nodelay") is None
    # invalid values ignored
    g2 = parse_robots("User-agent: *\nCrawl-delay: soon\nDisallow: /a")
    assert crawl_delay_for_agent(g2, "anybot") is None
    # negative ignored
    g3 = parse_robots("User-agent: *\nCrawl-delay: -5")
    assert crawl_delay_for_agent(g3, "anybot") is None
