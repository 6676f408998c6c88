"""CDX(J) index source: SURT derivation, write→parse roundtrip through
real text files, prefix lookup, malformed-line tolerance."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_surt_key_cases(spark):
    from ultraviolet_spark.sources.cdx import surt_key

    cases = [
        ("https://WWW.Example.ORG/Path/X?q=1", "org,example)/path/x?q=1"),
        ("http://sub.site.co.uk/", "uk,co,site,sub)/"),
        ("https://nopath.com", "com,nopath)/"),
        ("plain.host/abc", "host,plain)/abc"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["k"] for r in df.select(surt_key("url").alias("k")).collect()]
    assert got == [w for _, w in cases]


def test_cdx_roundtrip_through_files(spark, tmp_path):
    from ultraviolet_spark.sources.cdx import cdx_lines, read_cdx

    pages = spark.createDataFrame(
        [("https://a.org/1", dt.datetime(2026, 1, 2, 3, 4, 5), 11, 0,
          "f.warc.gz"),
         ("https://b.net/x/y", dt.datetime(2026, 6, 7, 8, 9, 10), 22, 100,
          "f.warc.gz")],
        "url string, warc_ts timestamp, length long, offset long,"
        " filename string")
    out = str(tmp_path / "cdx")
    cdx_lines(pages).write.mode("overwrite").text(out)
    rows = {r["url"]: r for r in read_cdx(spark, out).collect()}
    a = rows["https://a.org/1"]
    assert a["urlkey"] == "org,a)/1"
    assert a["warc_ts"] == dt.datetime(2026, 1, 2, 3, 4, 5)
    assert (a["status"], a["mime"]) == (200, "text/html")
    assert (a["length"], a["offset"]) == (11, 0)
    assert rows["https://b.net/x/y"]["urlkey"] == "net,b)/x/y"


def test_parse_cdx_tolerates_junk(spark):
    from ultraviolet_spark.sources.cdx import parse_cdx

    lines = spark.createDataFrame(
        [('org,a)/1 20260101000000 {"url":"https://a.org/1",'
          '"status":"200"}',),
         ("org,b)/2 20260101000000 NOT-JSON",),
         ("truncated-line",)],
        "value string")
    rows = parse_cdx(lines).collect()
    assert len(rows) == 3
    ok = [r for r in rows if r["url"] == "https://a.org/1"]
    assert ok and ok[0]["status"] == 200
    junk = [r for r in rows if r["urlkey"] == "org,b)/2"]
    assert junk and junk[0]["url"] is None   # bad blob -> NULL fields


def test_cdx_prefix_lookup(spark):
    from ultraviolet_spark.sources.cdx import cdx_lines, parse_cdx
    from ultraviolet_spark.sources.cdx import cdx_prefix_lookup

    urls = ["https://www.site.org/a", "https://site.org/b",
            "https://other.org/a", "https://site.org.evil.com/x"]
    pages = spark.createDataFrame(
        [(u, dt.datetime(2026, 1, 1)) for u in urls],
        "url string, warc_ts timestamp")
    cdx = parse_cdx(cdx_lines(pages))
    got = {r["url"] for r in
           cdx_prefix_lookup(cdx, "site.org/").collect()}
    # www. folds into the same SURT key; the evil.com suffix-spoof
    # sorts elsewhere (org,site vs com,evil,org,site)
    assert got == {"https://www.site.org/a", "https://site.org/b"}


def test_parse_cdx_bad_timestamp_is_null(spark):
    from ultraviolet_spark.sources.cdx import parse_cdx

    lines = spark.createDataFrame(
        [('org,a)/1 NOTATIME {"url":"https://a.org/1"}',)], "value string")
    r = parse_cdx(lines).first()
    assert r["warc_ts"] is None and r["url"] == "https://a.org/1"
