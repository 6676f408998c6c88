"""Build the BASELINE input_hint `pages` table (url, warc_ts, html,
lang) deterministically from the driver's documents.parquet.

Every 3 consecutive doc_ids become 3 crawls of one url; html is the doc
text wrapped in a small template and encoded per-row in a rotating
encoding (utf-8 / utf-16le+BOM / utf-16be+BOM) so the flagship pipeline
exercises BOM sniffing + transcoding on driver-provided data.  All
encoding work is pandas ``.str.encode`` (C codec loop at array
granularity) inside ``mapInPandas`` — distributed, shuffle-free, and
scale-proportional to the input.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("lang", T.StringType()),
])

_BOM = {"utf-16-le": b"\xff\xfe", "utf-16-be": b"\xfe\xff"}


def pages_from_documents(spark: SparkSession, sf_dir: str,
                         crawls_per_url: int = 3,
                         replicate: int = 1,
                         text_repeat: int = 1,
                         shard: tuple[int, int] | None = None) -> DataFrame:
    """``replicate`` > 1 fans every doc out into that many distinct
    doc_ids (and hence distinct urls/crawls) — deterministic volume
    scaling for benchmarks; key cardinality scales with it, so no
    artificial hot keys.  ``text_repeat`` > 1 tiles the doc text to
    web-realistic page sizes (a ~500-char doc × 20 ≈ 10 KB html,
    matching the Common-Crawl average page) so per-page kernel work
    dominates per-row framework overhead, as it does in production."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # A single small parquet file scans as ONE partition and would
    # serialize the synth + downstream transcode stages; spread the RAW
    # docs to the session's parallelism BEFORE the volume-amplifying
    # tile/explode below, so amplification runs distributed (on a real
    # crawl the input is already thousands of files and this no-ops).
    target = spark.sparkContext.defaultParallelism * 2
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target, "doc_id")
    if text_repeat > 1:
        docs = docs.withColumn(
            "text", F.concat_ws(" ", F.array_repeat(F.col("text"), text_repeat)))
    if replicate > 1:
        docs = docs.withColumn(
            "__rep", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
        ).withColumn(
            "doc_id", F.col("doc_id") * replicate + F.col("__rep")
        ).drop("__rep")
    docs = docs.select(
        "doc_id", "text", "lang",
        (F.col("doc_id") / crawls_per_url).cast("long").alias("url_key"),
        F.pmod(F.col("doc_id"), F.lit(3)).cast("int").alias("enc_sel"),
    )
    if shard is not None:
        # url-bucket shard (i of k): disjoint url_key spaces per shard —
        # the engine's prescribed bucketed physical layout, where each
        # executor owns whole url buckets and the as-of/window shuffles
        # never cross executors
        i, k = shard
        docs = docs.filter(F.pmod(F.col("url_key"), F.lit(k)) == i)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            html_str = ("<html><head><title>doc</title></head><body><p>"
                        + pdf["text"] + "</p></body></html>")
            blobs = pd.Series([b""] * len(pdf), dtype=object)
            for sel, codec in ((0, "utf-8"), (1, "utf-16-le"), (2, "utf-16-be")):
                m = pdf["enc_sel"].to_numpy() == sel
                if not m.any():
                    continue
                enc = html_str[m].str.encode(codec)
                if codec in _BOM:
                    enc = _BOM[codec] + enc
                blobs[m] = enc.to_numpy()
            # deterministic crawl times: url start offset + per-crawl gap
            crawl_no = (pdf["doc_id"] % crawls_per_url).to_numpy()
            start_h = (pdf["url_key"] % 24).to_numpy()
            ts = (pd.Timestamp("2024-01-01")
                  + pd.to_timedelta(start_h, unit="h")
                  + pd.to_timedelta(crawl_no * 26, unit="h"))
            yield pd.DataFrame({
                "url": "https://docs.example/" + pdf["url_key"].astype(str),
                "warc_ts": ts,
                "html": blobs,
                "lang": pdf["lang"],
            })

    return docs.mapInPandas(gen, schema=PAGES_SCHEMA)


def materialize_pages_table(spark: SparkSession, sf_dir: str, *,
                            crawls_per_url: int = 3,
                            replicate: int = 1,
                            text_repeat: int = 1,
                            base_dir: str = "/tmp/uv_pages_cache") -> str:
    """Write the synthesized pages table to parquet once (idempotent per
    parameter set) and return its path.

    The north-rule job SHAPE is "compute point-in-time features over an
    (Iceberg) table of Common-Crawl-style pages" — the job *reads* the
    pages table; it does not synthesize it.  Benchmarks therefore time
    the engine pipeline over this materialized table (parquet standing
    in for Iceberg, same as plans/snapshots.py's fallback) and exclude
    input synthesis from the timed region.  Measured at local[4]/sf0.1/
    240k 10 KB pages: inline synthesis was ~55%% of the timed wall —
    none of it engine work (tile ×20 in the JVM, an extra Arrow round
    trip, pandas .str.encode), all of it competing with the engine for
    the same memory bus during scaling measurements.
    """
    # The table's FILE LAYOUT must not depend on who wrote it: a cache
    # materialized inside a local[1] leg used to come out as ONE part
    # file, capping every later reader's scan parallelism at
    # ~file_size/maxPartitionBytes splits (observed: the 4-core scaling
    # leg ran 2x slow because its input was a single 134 MB file written
    # by the 1-core leg).  Fix the file count explicitly — ~16 MB files
    # at the bench shape — and version the cache key so stale
    # single-file caches regenerate.
    n_files = 16
    key = (f"{os.path.basename(sf_dir.rstrip('/'))}"
           f"_c{crawls_per_url}_r{replicate}_t{text_repeat}_p{n_files}")
    path = os.path.join(base_dir, key)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        pages_from_documents(
            spark, sf_dir, crawls_per_url=crawls_per_url,
            replicate=replicate, text_repeat=text_repeat,
        ).repartition(n_files).write.mode("overwrite").parquet(path)
    return path
