"""CDX(J) index source — Common Crawl's lookup sidecar for WARC.

Every crawl ships ``cdx-*.gz`` index files whose lines are

    <SURT urlkey> <14-digit timestamp> <JSON blob>

where the JSON carries url/mime/status/digest/length/offset/filename —
the (offset, length, filename) triple is the pointer into the ``.warc.gz``
member holding the record, and the SURT urlkey (scheme dropped, host
labels reversed and comma-joined, lowercased) is what makes the index
range-scannable per site: every page of ``example.org`` sorts together
under ``org,example)/...``.

Everything here is pure Catalyst: the line parse is one ``split`` with
limit 3 plus ``from_json``; SURT is string expressions.  At crawl scale
the index is ~10^3 sorted shards — ``read_cdx`` is a text scan with one
task per shard and zero shuffle, and a prefix lookup over a
range-partitioned layout (``plans/layout.py``) prunes to the shards
whose [min,max) urlkey range covers the prefix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CDX_JSON_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("digest", T.StringType()),
    T.StructField("length", T.StringType()),
    T.StructField("offset", T.StringType()),
    T.StructField("filename", T.StringType()),
])

CDX_SCHEMA = T.StructType([
    T.StructField("urlkey", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("url", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("digest", T.StringType()),
    T.StructField("length", T.LongType()),
    T.StructField("offset", T.LongType()),
    T.StructField("filename", T.StringType()),
])


def surt_key(url: Column | str) -> Column:
    """SURT urlkey of ``url``: scheme and leading ``www.`` dropped,
    host labels reversed and comma-joined, lowercased, ``)`` before the
    path, default path ``/``.  (Simplified SURT: no query-param
    canonicalization or port stripping — document before extending.)"""
    u = F.lower(F.col(url) if isinstance(url, str) else url)
    rest = F.regexp_replace(u, r"^https?://(www\.)?", "")
    hostp = F.regexp_extract(rest, r"^([^/]*)", 1)
    path = F.regexp_extract(rest, r"^[^/]*(/.*)?$", 1)
    rev = F.array_join(F.reverse(F.split(hostp, r"\.")), ",")
    return F.concat(rev, F.lit(")"),
                    F.when(path == "", F.lit("/")).otherwise(path))


def cdx_lines(pages: DataFrame, *, url_col: str = "url",
              ts_col: str = "warc_ts") -> DataFrame:
    """pages → one CDXJ line per record (deterministic writer for
    tests / synthetic crawls; real indexes arrive already written).
    Expects mime/status/digest/length/offset/filename columns when
    present; missing ones are filled with deterministic defaults."""
    cols = dict.fromkeys(
        ("mime", "status", "digest", "length", "offset", "filename"))
    defaults = {
        "mime": F.lit("text/html"), "status": F.lit("200"),
        "digest": F.md5(F.encode(F.col(url_col), "UTF-8")),
        "length": F.lit("0"), "offset": F.lit("0"),
        "filename": F.lit("synthetic.warc.gz"),
    }
    d = pages
    for c in cols:
        if c not in d.columns:
            d = d.withColumn(c, defaults[c])
        else:
            d = d.withColumn(c, F.col(c).cast("string"))
    blob = F.to_json(F.struct(
        F.col(url_col).alias("url"), "mime", "status", "digest",
        "length", "offset", "filename"))
    ts14 = F.date_format(F.col(ts_col), "yyyyMMddHHmmss")
    return d.select(F.concat_ws(
        " ", surt_key(url_col), ts14, blob).alias("value"))


def parse_cdx(lines: DataFrame, *, col: str = "value") -> DataFrame:
    """CDXJ lines → typed CDX rows (CDX_SCHEMA).  Malformed JSON blobs
    yield NULL fields rather than failing the scan (crawl indexes do
    contain junk lines)."""
    parts = F.split(F.col(col), " ", 3)
    # try_element_at: a truncated line (fewer than 3 fields) must yield
    # NULLs, not fail the scan
    blob = F.from_json(F.try_element_at(parts, F.lit(3)),
                       CDX_JSON_SCHEMA)
    return lines.select(
        F.try_element_at(parts, F.lit(1)).alias("urlkey"),
        F.try_to_timestamp(F.try_element_at(parts, F.lit(2)),
                           F.lit("yyyyMMddHHmmss")).alias("warc_ts"),
        blob["url"].alias("url"),
        blob["mime"].alias("mime"),
        blob["status"].cast("int").alias("status"),
        blob["digest"].alias("digest"),
        blob["length"].cast("long").alias("length"),
        blob["offset"].cast("long").alias("offset"),
        blob["filename"].alias("filename"))


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Text scan of ``cdx-*`` shards → typed rows.  One task per
    file split, zero shuffle."""
    return parse_cdx(spark.read.text(path))


def cdx_prefix_lookup(cdx: DataFrame, url_prefix: str) -> DataFrame:
    """All index rows whose urlkey starts with ``surt_key(prefix)`` —
    the per-site range scan SURT ordering exists for.  Over a
    range-partitioned/sorted layout this prunes to the covering
    shards; the filter itself is scan-stage."""
    import re as _re
    m = _re.match(r"^(https?://)?(www\.)?([^/]*)(/.*)?$",
                  url_prefix.lower())
    host, path = m.group(3), m.group(4) or "/"
    key = ",".join(reversed(host.split("."))) + ")" + path
    return cdx.filter(F.col("urlkey").startswith(key))
