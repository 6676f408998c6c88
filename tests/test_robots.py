"""robots.txt parser + admission: RFC 9309 cases — group attribution,
consecutive agent headers, longest-match, Allow-beats-Disallow ties,
specific-agent override, comments, empty Disallow."""

from __future__ import annotations

TXT = """\
# global policy
User-agent: *
Disallow: /tmp/
Allow: /tmp/ok/
Disallow:

User-agent: greedybot
User-agent: otherbot
Disallow: /

User-agent: niceBot
Allow: /
Disallow: /secret/
"""


def _rules(spark):
    from ultraviolet_spark.operators.robots import parse_robots

    df = spark.createDataFrame([("h.com", TXT)],
                               "host string, robots_txt string")
    return parse_robots(df)


def test_parse_groups_and_edges(spark):
    rules = {(r["agent"], r["directive"], r["path"])
             for r in _rules(spark).collect()}
    assert rules == {
        ("*", "disallow", "/tmp/"),
        ("*", "allow", "/tmp/ok/"),
        # consecutive headers share the block
        ("greedybot", "disallow", "/"),
        ("otherbot", "disallow", "/"),
        # agent names lowercased
        ("nicebot", "allow", "/"),
        ("nicebot", "disallow", "/secret/"),
    }   # the empty Disallow and the comment produce no rows


def _allowed(spark, urls, agent):
    from ultraviolet_spark.operators.robots import is_allowed

    u = spark.createDataFrame([(x,) for x in urls], "url string")
    return {r["url"]: r["allowed"] for r in
            is_allowed(u, _rules(spark), agent=agent).collect()}


def test_default_agent_longest_match(spark):
    got = _allowed(spark, [
        "https://h.com/tmp/file",      # disallowed
        "https://h.com/tmp/ok/file",   # allow overrides (longer)
        "https://h.com/other",         # no rule matches
        "https://h.com",               # bare host -> path '/'
        "https://nobots.org/x",        # host without robots.txt
    ], "*")
    assert got == {
        "https://h.com/tmp/file": False,
        "https://h.com/tmp/ok/file": True,
        "https://h.com/other": True,
        "https://h.com": True,
        "https://nobots.org/x": True,
    }


def test_specific_agent_group_excludes_star(spark):
    # greedybot has its own group -> '*' rules do NOT apply
    got = _allowed(spark, ["https://h.com/tmp/ok/file",
                           "https://h.com/anything"], "GreedyBot")
    assert got == {"https://h.com/tmp/ok/file": False,
                   "https://h.com/anything": False}
    # nicebot: Allow '/' (len 1) loses to Disallow '/secret/' (len 8)
    got = _allowed(spark, ["https://h.com/secret/x",
                           "https://h.com/open"], "nicebot")
    assert got == {"https://h.com/secret/x": False,
                   "https://h.com/open": True}


def test_allow_beats_disallow_on_tie(spark):
    from ultraviolet_spark.operators.robots import is_allowed, parse_robots

    txt = "User-agent: *\nDisallow: /a/\nAllow: /a/\n"
    rules = parse_robots(spark.createDataFrame(
        [("t.com", txt)], "host string, robots_txt string"))
    u = spark.createDataFrame([("https://t.com/a/x",)], "url string")
    assert is_allowed(u, rules).first()["allowed"] is True


def test_is_allowed_never_shuffles_url_side(spark):
    """The 10^12-URL shape: every Exchange in the plan partitions on
    RULES-side columns (host/agent bookkeeping); the URL side must flow
    scan -> broadcast-join -> project with no hashpartitioning on any
    of its columns."""
    import re

    from pyspark.sql import functions as F

    from ultraviolet_spark.operators.robots import is_allowed

    urls = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://h.com/p/"), F.col("id")).alias("url"))
    rules = spark.createDataFrame(
        [("h.com", "*", "disallow", "/private/", 1)],
        "host string, agent string, directive string, path string,"
        " line_no int")
    plan = (is_allowed(urls, rules)
            ._jdf.queryExecution().executedPlan().toString())
    for part in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "doc_id" not in part and "url" not in part \
            and "__path" not in part, part
