"""parse_sitemap / sitemap_index_locs edge cases."""
from __future__ import annotations

from ultraviolet_spark.operators.sitemap import (parse_sitemap,
                                                 sitemap_index_locs)


def test_parse_entries(spark):
    xml = """<?xml version="1.0" encoding="UTF-8"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>https://a.example/</loc>
           <lastmod>2024-01-05</lastmod>
           <changefreq>daily</changefreq><priority>0.8</priority></url>
      <url><loc>
           https://a.example/p?x=1&amp;y=2
           </loc></url>
      <url><lastmod>2024-02-02</lastmod></url>
    </urlset>"""
    df = spark.createDataFrame([(7, xml)], "doc_id long, xml string")
    rows = sorted(parse_sitemap(df).collect(), key=lambda r: r["entry_idx"])
    assert [r["loc"] for r in rows] == [
        "https://a.example/", "https://a.example/p?x=1&amp;y=2", None]
    assert [r["lastmod"] for r in rows] == ["2024-01-05", None, "2024-02-02"]
    assert [r["changefreq"] for r in rows] == ["daily", None, None]
    assert [r["priority"] for r in rows] == ["0.8", None, None]


def test_index_form(spark):
    xml = ("<sitemapindex><sitemap><loc>https://s/1.xml</loc>"
           "<lastmod>2024-03-01</lastmod></sitemap>"
           "<sitemap><loc>https://s/2.xml</loc></sitemap></sitemapindex>")
    df = spark.createDataFrame([(1, xml)], "doc_id long, xml string")
    rows = sorted(sitemap_index_locs(df).collect(),
                  key=lambda r: r["entry_idx"])
    assert [(r["loc"], r["lastmod"]) for r in rows] == [
        ("https://s/1.xml", "2024-03-01"), ("https://s/2.xml", None)]
    # an index document contains zero <url> entries
    assert parse_sitemap(df).count() == 0
