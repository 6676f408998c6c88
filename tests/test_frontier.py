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


# ------------------------------------------------------- politeness schedule

def test_politeness_schedule_invariants(spark):
    from ultraviolet_spark.operators.frontier import politeness_schedule

    rows = [("https://h%d.com/p/%d" % (i % 3, i), "h%d.com" % (i % 3))
            for i in range(30)]
    df = spark.createDataFrame(rows, "url string, host string")
    out = politeness_schedule(df, crawl_delay_s=7, workers=4).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    for host, rs in by_host.items():
        workers = {r["worker"] for r in rs}
        assert len(workers) == 1            # one host -> one worker
        assert 0 <= workers.pop() < 4
        seqs = sorted(r["fetch_seq"] for r in rs)
        assert seqs == list(range(len(rs)))  # contiguous 0-based queue
        for r in rs:
            assert r["fetch_offset_s"] == r["fetch_seq"] * 7


def test_politeness_schedule_per_host_delay_and_determinism(spark):
    from ultraviolet_spark.operators.frontier import politeness_schedule

    rows = [("https://a.com/%d" % i, "a.com", 2) for i in range(5)] + \
           [("https://b.com/%d" % i, "b.com", 10) for i in range(5)]
    df = spark.createDataFrame(rows, "url string, host string, cd long")
    out = politeness_schedule(df, delay_col="cd", workers=8)
    got = {(r["url"]): (r["fetch_seq"], r["fetch_offset_s"])
           for r in out.collect()}
    again = {(r["url"]): (r["fetch_seq"], r["fetch_offset_s"])
             for r in politeness_schedule(df.repartition(5), delay_col="cd",
                                          workers=8).collect()}
    assert got == again                     # deterministic, partition-free
    for url, (seq, off) in got.items():
        assert off == seq * (2 if "a.com" in url else 10)


# ---------------------------------------------------- crawl budget

def test_crawl_budget_sums_exactly_and_is_proportional(spark):
    from ultraviolet_spark.operators.frontier import crawl_budget
    rows = [("a", 70), ("b", 20), ("c", 7), ("d", 3)]
    df = spark.createDataFrame(rows, "domain string, n_pages long")
    got = {r["domain"]: r["slots"]
           for r in crawl_budget(df, budget=10).collect()}
    assert sum(got.values()) == 10
    assert got == {"a": 7, "b": 2, "c": 1, "d": 0}


def test_crawl_budget_largest_remainder_tiebreak(spark):
    from ultraviolet_spark.operators.frontier import crawl_budget
    # 3 equal domains, 2 slots: equal remainders -> smaller key wins
    df = spark.createDataFrame([("x", 1), ("y", 1), ("z", 1)],
                               "domain string, n_pages long")
    got = {r["domain"]: r["slots"]
           for r in crawl_budget(df, budget=2).collect()}
    assert sum(got.values()) == 2
    assert got == {"x": 1, "y": 1, "z": 0}


def test_crawl_budget_total_always_exact(spark):
    from ultraviolet_spark.operators.frontier import crawl_budget
    rows = [(f"d{i}", (i * 37) % 100 + 1) for i in range(50)]
    df = spark.createDataFrame(rows, "domain string, n_pages long")
    for b in (0, 1, 99, 1000):
        assert (crawl_budget(df, budget=b)
                .agg({"slots": "sum"}).first()[0]) == b


# ---------------------------------------------------- rendezvous

def test_rendezvous_minimal_disruption(spark):
    from ultraviolet_spark.operators.frontier import rendezvous_assign
    hosts = spark.createDataFrame([(f"host{i}.example",) for i in range(300)],
                                  "host string")
    a5 = {r["host"]: r["worker"]
          for r in rendezvous_assign(hosts, n_workers=5).collect()}
    a6 = {r["host"]: r["worker"]
          for r in rendezvous_assign(hosts, n_workers=6).collect()}
    moved = {h for h in a5 if a5[h] != a6[h]}
    # every move must target the NEW worker (5), never reshuffle old ones
    assert all(a6[h] == 5 for h in moved)
    # expected fraction 1/6 = 0.167 of 300 = 50; generous band
    assert 20 <= len(moved) <= 90, len(moved)
    # balance: each of 6 workers gets a reasonable share
    from collections import Counter
    c = Counter(a6.values())
    assert set(c) == set(range(6))
    assert min(c.values()) > 20
