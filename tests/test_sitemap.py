"""Sitemap source: urlset/sitemapindex parsing, W3C-date handling,
malformed-XML tolerance, writer roundtrip."""

from __future__ import annotations

import datetime as dt


def test_parse_sitemap_fields_and_junk(spark):
    from ultraviolet_spark.sources.sitemap import parse_sitemap

    xml = ('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
           '<url><loc>https://a.org/1</loc><lastmod>2026-01-02</lastmod>'
           '<changefreq>daily</changefreq><priority>0.8</priority></url>'
           '<url><loc>https://a.org/2</loc>'
           '<lastmod>2026-03-04T05:06:07Z</lastmod></url>'
           '<url><loc>https://a.org/3</loc>'
           '<lastmod>not a date</lastmod></url>'
           '</urlset>')
    df = spark.createDataFrame(
        [("a.org", xml), ("junk.org", "<unclosed"), ("empty.org", "")],
        "host string, sitemap_xml string")
    rows = {r["loc"]: r for r in parse_sitemap(df).collect()}
    assert set(rows) == {"https://a.org/1", "https://a.org/2",
                         "https://a.org/3"}   # junk hosts -> 0 rows
    r1 = rows["https://a.org/1"]
    assert r1["lastmod"] == dt.datetime(2026, 1, 2)
    assert (r1["changefreq"], r1["priority"]) == ("daily", 0.8)
    assert rows["https://a.org/2"]["lastmod"] == dt.datetime(
        2026, 3, 4, 5, 6, 7)
    assert rows["https://a.org/3"]["lastmod"] is None


def test_parse_sitemap_index(spark):
    from ultraviolet_spark.sources.sitemap import parse_sitemap_index

    xml = ('<sitemapindex><sitemap><loc>https://a.org/s1.xml</loc>'
           '<lastmod>2026-02-03T01:02:03Z</lastmod></sitemap>'
           '<sitemap><loc>https://a.org/s2.xml</loc></sitemap>'
           '</sitemapindex>')
    df = spark.createDataFrame([("a.org", xml)],
                               "host string, sitemap_xml string")
    rows = {r["child_loc"]: r["lastmod"] for r in
            parse_sitemap_index(df).collect()}
    assert rows == {"https://a.org/s1.xml": dt.datetime(2026, 2, 3, 1, 2, 3),
                    "https://a.org/s2.xml": None}


def test_build_parse_roundtrip(spark):
    from ultraviolet_spark.sources.sitemap import build_sitemap, parse_sitemap

    urls = spark.createDataFrame(
        [("h.com", "https://h.com/b", dt.date(2026, 1, 2)),
         ("h.com", "https://h.com/a", dt.date(2026, 1, 1)),
         ("g.com", "https://g.com/x", dt.date(2026, 2, 2))],
        "host string, loc string, lm date")
    sm = build_sitemap(urls, lastmod_col="lm")
    assert sm.count() == 2   # one document per host
    back = {(r["host"], r["loc"]): r["lastmod"] for r in
            parse_sitemap(sm).collect()}
    assert back == {
        ("h.com", "https://h.com/a"): dt.datetime(2026, 1, 1),
        ("h.com", "https://h.com/b"): dt.datetime(2026, 1, 2),
        ("g.com", "https://g.com/x"): dt.datetime(2026, 2, 2),
    }
