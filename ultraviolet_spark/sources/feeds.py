"""RSS 2.0 / Atom 1.0 feed parsing — the OTHER crawl-seed discovery
channel next to sitemaps (sources/sitemap.py): feeds surface NEW urls
with publish timestamps hours before a sitemap regenerates, so a
freshness-oriented frontier tails feeds first.

Both dialects land in ONE output shape (host, entry_url, title,
published, guid, dialect) so the frontier composition can union feed
seeds with sitemap seeds without caring which convention a site picked:

* RSS 2.0: ``<rss><channel><item>`` with ``link`` / ``title`` /
  ``pubDate`` (RFC 822 dates, e.g. ``Mon, 01 Jan 2024 00:00:00 GMT``
  — the day-of-week token is IGNORED by the parser, per the HTTP-date
  lesson: feeds in the wild get it wrong) / ``guid``.
* Atom 1.0: ``<feed><entry>`` with ``<link href=".."/>`` (an
  ATTRIBUTE, not text — the classic Atom-parsing trap) / ``title`` /
  ``updated``+``published`` (ISO 8601) / ``id``.

Parsing is Spark 4 native ``from_xml`` (Catalyst, JVM-side, no UDF);
malformed XML yields zero rows for that document instead of failing
the scan.  Scale: pure scan-stage transform — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RSS_SCHEMA = T.StructType([
    T.StructField("channel", T.StructType([
        T.StructField("title", T.StringType()),
        T.StructField("item", T.ArrayType(T.StructType([
            T.StructField("title", T.StringType()),
            T.StructField("link", T.StringType()),
            T.StructField("pubDate", T.StringType()),
            T.StructField("guid", T.StringType()),
        ]))),
    ])),
])

ATOM_SCHEMA = T.StructType([
    T.StructField("title", T.StringType()),
    T.StructField("entry", T.ArrayType(T.StructType([
        T.StructField("title", T.StringType()),
        T.StructField("link", T.StructType([
            T.StructField("_href", T.StringType()),
        ])),
        T.StructField("published", T.StringType()),
        T.StructField("updated", T.StringType()),
        T.StructField("id", T.StringType()),
    ]))),
])


def _rfc822_ts(col):
    """RFC 822/1123 feed date → timestamp, IGNORING the day-of-week
    token (wrong in real feeds often enough that verifying it loses
    data): strip everything up to an optional comma."""
    rest = F.regexp_replace(col, r"^\s*[A-Za-z]{3},\s*", "")
    return F.coalesce(
        F.try_to_timestamp(rest, F.lit("dd MMM yyyy HH:mm:ss zzz")),
        F.try_to_timestamp(rest, F.lit("dd MMM yyyy HH:mm:ss XXXX")),
        F.try_to_timestamp(rest, F.lit("d MMM yyyy HH:mm:ss zzz")),
        F.try_to_timestamp(rest, F.lit("d MMM yyyy HH:mm:ss XXXX")))


def _iso_ts(col):
    return F.coalesce(
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ss")))


def parse_feed(df: DataFrame, *, xml_col: str = "feed_xml",
               host_col: str = "host") -> DataFrame:
    """``(host, entry_url, title, published, guid, dialect)`` — one
    row per item/entry, both dialects detected per document (an RSS
    document parses zero Atom entries and vice versa, so the union is
    disjoint by construction)."""
    rss = F.from_xml(F.col(xml_col), RSS_SCHEMA)
    atom = F.from_xml(F.col(xml_col), ATOM_SCHEMA)
    e = F.col("__e")
    rss_rows = (df
                .select(F.col(host_col).alias("host"),
                        F.explode(rss["channel"]["item"]).alias("__e"))
                .select("host",
                        e["link"].alias("entry_url"),
                        e["title"].alias("title"),
                        _rfc822_ts(e["pubDate"]).alias("published"),
                        e["guid"].alias("guid"),
                        F.lit("rss").alias("dialect")))
    atom_rows = (df
                 .select(F.col(host_col).alias("host"),
                         F.explode(atom["entry"]).alias("__e"))
                 .select("host",
                         e["link"]["_href"].alias("entry_url"),
                         e["title"].alias("title"),
                         _iso_ts(F.coalesce(e["published"],
                                            e["updated"]))
                          .alias("published"),
                         e["id"].alias("guid"),
                         F.lit("atom").alias("dialect")))
    return rss_rows.unionByName(atom_rows)


def build_rss(entries: DataFrame, *, host_col: str = "host",
              url_col: str = "entry_url", title_col: str = "title",
              ts_col: str = "published") -> DataFrame:
    """Inverse for round-trip tests: one RSS 2.0 document per host
    (items in url order — deterministic bytes)."""
    item = F.concat(
        F.lit("<item><title>"), F.col(title_col),
        F.lit("</title><link>"), F.col(url_col),
        F.lit("</link><pubDate>"),
        F.date_format(F.col(ts_col), "EEE, dd MMM yyyy HH:mm:ss 'GMT'"),
        F.lit("</pubDate><guid>"), F.col(url_col),
        F.lit("</guid></item>"))
    return (entries
            .groupBy(F.col(host_col).alias("host"))
            .agg(F.concat(
                F.lit('<?xml version="1.0"?><rss version="2.0">'
                      "<channel><title>feed</title>"),
                F.array_join(F.array_sort(F.collect_list(item)), ""),
                F.lit("</channel></rss>")).alias("feed_xml")))
