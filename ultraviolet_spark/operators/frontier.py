"""Crawl-frontier construction — the composition that turns the web
ops into a scheduler feed: candidate URLs (sitemap discovery, outlink
extraction) → robots.txt admission → blocklist policy → "have we
already crawled this?" anti-membership against the CDX index.

Scale shape: robots rules and blocklists are per-host/small →
broadcast (inside the composed ops); the only real shuffle is the
urlkey join against the crawl index, which is exactly the access
pattern SURT keys exist for — over a urlkey-range-partitioned CDX
layout (``plans/layout.py``) it prunes to the covering shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_frontier(urls: DataFrame, rules: DataFrame,
                   blocked_domains: DataFrame, cdx: DataFrame, *,
                   agent: str = "*", url_col: str = "url") -> DataFrame:
    """``urls`` + per-URL verdict columns:

    * ``allowed`` — robots.txt admission for ``agent`` (RFC 9309
      longest-match; hosts without rules allow everything),
    * ``blocked_domain`` / ``blocked_pattern`` — blocklist policy,
    * ``already_crawled`` — the URL's SURT key exists in ``cdx``,
    * ``frontier`` — the scheduler verdict: allowed, not blocked, not
      already crawled.

    All verdicts are kept (not filtered) so per-batch drop-rate
    metrics stay one groupBy away.
    """
    from ultraviolet_spark.operators.robots import is_allowed
    from ultraviolet_spark.operators.urls import blocklist_filter
    from ultraviolet_spark.sources.cdx import surt_key

    adm = is_allowed(urls, rules, agent=agent, url_col=url_col)
    fl = blocklist_filter(adm, blocked_domains, url_col=url_col)
    keyed = fl.withColumn("__urlkey", surt_key(url_col))
    crawled = (cdx.select(F.col("urlkey").alias("__urlkey"))
               .distinct()
               .withColumn("__crawled", F.lit(True)))
    out = (keyed.join(crawled, on="__urlkey", how="left")
           .withColumn("already_crawled",
                       F.col("__crawled").isNotNull()))
    return (out
            .withColumn("frontier",
                        F.col("allowed") & F.col("keep")
                        & ~F.col("already_crawled"))
            .select(*urls.columns, "allowed", "blocked_domain",
                    "blocked_pattern", "already_crawled", "frontier"))


def politeness_schedule(frontier: DataFrame, *, host_col: str = "host",
                        url_col: str = "url", crawl_delay_s: int = 5,
                        workers: int = 64,
                        delay_col: str | None = None) -> DataFrame:
    """Turn an admitted frontier into a POLITE fetch plan: every host
    is pinned to one worker (md5(host) % workers — per-host requests
    are serialized by construction, no cross-executor coordination),
    and within a host fetches are sequenced in deterministic
    md5-of-url order with ``fetch_offset_s = seq * delay`` spacing
    (per-host ``delay_col`` — e.g. robots.txt Crawl-delay — overrides
    the global default).

    Output: url, host, worker, fetch_seq (0-based), fetch_offset_s.

    Scale: one row_number window partitioned by host — the natural
    key (a host's queue must be ordered *somewhere*); hosts are
    hash-uniform across workers so no worker is hot unless one host
    dominates the frontier, which the per-host serialization makes
    irreducible anyway (politeness IS the bottleneck, by design).
    """
    from pyspark.sql import Window

    host = F.col(host_col)
    worker = (F.conv(F.substring(F.md5(F.encode(host.cast("string"),
                                                "UTF-8")), 1, 12), 16, 10)
              .cast("long") % workers).cast("int")
    w = (Window.partitionBy(host_col)
         .orderBy(F.md5(F.col(url_col).cast("string")), F.col(url_col)))
    seq = (F.row_number().over(w) - 1).cast("long")
    delay = (F.col(delay_col).cast("long") if delay_col
             else F.lit(int(crawl_delay_s)).cast("long"))
    return (frontier
            .withColumn("worker", worker)
            .withColumn("fetch_seq", seq)
            .withColumn("fetch_offset_s", seq * delay))
