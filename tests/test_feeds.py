"""parse_feed: both dialects on hand documents, the Atom href-attribute
trap, RFC 822 date variants (wrong weekday, single-digit day, numeric
offsets), junk XML tolerance, RSS round-trip via build_rss."""

from __future__ import annotations

import datetime as dt

from ultraviolet_spark.sources.feeds import build_rss, parse_feed

RSS = ('<?xml version="1.0"?><rss version="2.0"><channel><title>t</title>'
       '<item><title>A</title><link>https://x.org/a</link>'
       # weekday is WRONG on purpose (Jan 1 2024 was a Monday) — a
       # parser that verifies it loses the row
       '<pubDate>Fri, 01 Jan 2024 12:00:00 GMT</pubDate><guid>g1</guid>'
       '</item>'
       '<item><title>B</title><link>https://x.org/b</link>'
       '<pubDate>Tue, 2 Jan 2024 01:02:03 +0000</pubDate><guid>g2</guid>'
       '</item></channel></rss>')

ATOM = ('<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
        '<title>f</title>'
        '<entry><title>C</title><link href="https://y.org/c"/>'
        '<published>2024-01-03T04:05:06Z</published><id>i1</id></entry>'
        '<entry><title>D</title><link href="https://y.org/d"/>'
        '<updated>2024-01-04T00:00:00+02:00</updated><id>i2</id></entry>'
        '</feed>')


def _parse(spark, rows):
    df = spark.createDataFrame(rows, "host string, feed_xml string")
    return sorted(map(tuple, parse_feed(df).collect()))


def test_both_dialects_unified(spark):
    got = _parse(spark, [("x.org", RSS), ("y.org", ATOM),
                         ("z.org", "<junk")])
    assert got == [
        ("x.org", "https://x.org/a", "A",
         dt.datetime(2024, 1, 1, 12, 0), "g1", "rss"),
        ("x.org", "https://x.org/b", "B",
         dt.datetime(2024, 1, 2, 1, 2, 3), "g2", "rss"),
        ("y.org", "https://y.org/c", "C",
         dt.datetime(2024, 1, 3, 4, 5, 6), "i1", "atom"),
        # +02:00 normalizes to UTC (session tz)
        ("y.org", "https://y.org/d", "D",
         dt.datetime(2024, 1, 3, 22, 0), "i2", "atom"),
    ]


def test_junk_xml_yields_zero_rows_not_failure(spark):
    assert _parse(spark, [("z.org", "<not really xml")]) == []
    assert _parse(spark, [("z.org", "")]) == []


def test_rss_roundtrip(spark):
    df = spark.createDataFrame(
        [("h1", "https://h1/a", "TA", dt.datetime(2024, 2, 1, 8, 0)),
         ("h1", "https://h1/b", "TB", dt.datetime(2024, 2, 2, 9, 30)),
         ("h2", "https://h2/c", "TC", dt.datetime(2024, 2, 3, 10, 15))],
        "host string, entry_url string, title string, "
        "published timestamp")
    feeds = build_rss(df)
    back = parse_feed(feeds)
    got = sorted((r.host, r.entry_url, r.title, r.published)
                 for r in back.collect())
    want = sorted(map(tuple, df.collect()))
    assert got == want


def test_pure_catalyst(spark):
    df = spark.createDataFrame([("x", RSS)], "host string, feed_xml string")
    out = parse_feed(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
