"""Crawl-frontier composition: literal mini-web where every verdict
column is hand-computable."""

from __future__ import annotations

import datetime as dt


def test_build_frontier_literal(spark):
    from ultraviolet_spark.operators.frontier import build_frontier
    from ultraviolet_spark.operators.robots import parse_robots
    from ultraviolet_spark.sources.cdx import cdx_lines, parse_cdx

    robots = spark.createDataFrame(
        [("good.com", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string")
    urls = spark.createDataFrame([
        (1, "https://good.com/new"),        # fresh -> frontier
        (2, "https://good.com/private/x"),  # robots-denied
        (3, "https://bad.org/anything"),    # blocklisted
        (4, "https://good.com/seen"),       # already crawled
        (5, "https://norules.net/x"),       # no robots, no block -> in
    ], "id long, url string")
    bl = spark.createDataFrame([("bad.org",)], "domain string")
    cdx = parse_cdx(cdx_lines(spark.createDataFrame(
        [("https://good.com/seen", dt.datetime(2026, 1, 1))],
        "url string, warc_ts timestamp")))

    rows = {r["id"]: (r["allowed"], r["blocked_domain"],
                      r["already_crawled"], r["frontier"]) for r in
            build_frontier(urls, parse_robots(robots), bl, cdx).collect()}
    assert rows == {
        1: (True, False, False, True),
        2: (False, False, False, False),
        3: (True, True, False, False),
        4: (True, False, True, False),
        5: (True, False, False, True),
    }
