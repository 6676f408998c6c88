"""Sitemap parsing (sitemaps.org XML) — the crawl-discovery input that
feeds the frontier alongside robots rules (operators/robots.py) and the
link graph (operators/urls.py).

Pure Catalyst: ``<url>`` blocks explode positionally, per-block child
tags extract with DOTALL non-greedy regex; a missing optional tag
(``lastmod``/``changefreq``/``priority``) surfaces as NULL (empty-match
→ ``nullif``), and values are whitespace-trimmed as real sitemaps
require.  ``sitemap_index_locs`` handles the two-level
``<sitemapindex>`` form (a sitemap of sitemaps) so a crawler can walk
the tree with two scans.  Scale: per-row scan-stage work only.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_SM_BLOCK = r"(?s)<sitemap>(.*?)</sitemap>"


def _tag(block: Column, tag: str) -> Column:
    # full-whitespace trim — F.trim strips only 0x20, but sitemap
    # generators pad values with newlines/tabs
    v = F.regexp_replace(
        F.regexp_extract(block, f"(?s)<{tag}>(.*?)</{tag}>", 1),
        r"^\s+|\s+$", "")
    return F.nullif(v, F.lit(""))


def parse_sitemap(df: DataFrame, *, xml_col: str = "xml",
                  id_col: str = "doc_id") -> DataFrame:
    """One row per ``<url>`` entry:
    ``(doc_id, entry_idx, loc, lastmod, changefreq, priority)`` —
    ``loc`` required by the spec (NULL here means a malformed entry the
    caller filters), the rest optional → NULL."""
    b = (df.select(F.col(id_col).alias("doc_id"),
                   F.posexplode(F.regexp_extract_all(
                       F.col(xml_col).cast("string"), F.lit(_URL_BLOCK),
                       F.lit(1))).alias("entry_idx", "__b")))
    return b.select(
        "doc_id", "entry_idx",
        _tag(F.col("__b"), "loc").alias("loc"),
        _tag(F.col("__b"), "lastmod").alias("lastmod"),
        _tag(F.col("__b"), "changefreq").alias("changefreq"),
        _tag(F.col("__b"), "priority").alias("priority"))


def sitemap_index_locs(df: DataFrame, *, xml_col: str = "xml",
                       id_col: str = "doc_id") -> DataFrame:
    """Child sitemap locations of a ``<sitemapindex>`` document:
    ``(doc_id, entry_idx, loc, lastmod)``."""
    b = (df.select(F.col(id_col).alias("doc_id"),
                   F.posexplode(F.regexp_extract_all(
                       F.col(xml_col).cast("string"), F.lit(_SM_BLOCK),
                       F.lit(1))).alias("entry_idx", "__b")))
    return b.select(
        "doc_id", "entry_idx",
        _tag(F.col("__b"), "loc").alias("loc"),
        _tag(F.col("__b"), "lastmod").alias("lastmod"))
