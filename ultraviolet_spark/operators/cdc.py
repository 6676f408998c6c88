"""Content-defined chunking (FastCDC/Rabin family — Xia et al. 2016)
for byte-level dedup of binary columns.

Fixed-size chunking breaks under insertion: one added byte shifts every
later chunk boundary, so nothing dedups.  CDC cuts where a rolling hash
of the CONTENT hits a mask, so boundaries re-synchronize right after an
edit and identical byte runs produce identical chunks wherever they sit
— the property that dedups near-identical WARC payloads, re-crawled
pages and mirrored files at the sub-document level (the storage-side
complement to the token-level ExactSubstr pass in operators/corpus).

Spec (deterministic, engine-defined):

* gear table: ``G[b] = first 16 hex chars of md5(byte b)`` as uint64 —
  reproducible everywhere, no private seeds;
* rolling hash over a ``W=32``-byte window:
  ``h(i) = Σ_{j<W} G[buf[i-j]] << j  (mod 2^64)``;
* cut AFTER position i when ``h(i) & (avg_size-1) == 0``, subject to
  ``min_size``/``max_size`` (a cut is forced at max_size when no
  candidate lands in the window — the FastCDC normalization, greedy
  variant).

Vectorization: the windowed hash is W shifted vector adds over the
whole buffer (numpy uint64, natural mod-2^64 wraparound); candidate
positions come from one ``nonzero``; only the greedy min/max walk is a
Python loop, and it touches CANDIDATES (≈ n/avg_size), never bytes.
One Arrow batch of rows is chunked per UDF call via ``mapInPandas``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GEAR = np.array(
    [int(hashlib.md5(bytes([i])).hexdigest()[:16], 16) for i in range(256)],
    dtype=np.uint64)
_W = 32


def gear_boundaries(buf: bytes, *, min_size: int, avg_size: int,
                    max_size: int) -> list[int]:
    """Cut positions (exclusive ends) for one buffer, last == len(buf).
    ``avg_size`` must be a power of two (it is the hash mask)."""
    n = len(buf)
    if n == 0:
        return []
    if n <= min_size:
        return [n]
    a = np.frombuffer(buf, dtype=np.uint8)
    g = _GEAR[a]
    h = np.zeros(n, dtype=np.uint64)
    for j in range(_W):
        h[j:] += g[:n - j] << np.uint64(j)
    cand = np.nonzero((h & np.uint64(avg_size - 1)) == 0)[0]

    cuts: list[int] = []
    last, ci, nc = 0, 0, len(cand)
    while n - last > max_size:
        lo, hi = last + min_size, last + max_size
        while ci < nc and cand[ci] + 1 < lo:
            ci += 1
        if ci < nc and cand[ci] + 1 <= hi:
            cut = int(cand[ci]) + 1
        else:
            cut = hi
        cuts.append(cut)
        last = cut
    cuts.append(n)
    return cuts


def cdc_chunks(df: DataFrame, *, bin_col: str = "html",
               id_col: str = "doc_id", min_size: int = 256,
               avg_size: int = 1024, max_size: int = 4096) -> DataFrame:
    """``(id, chunk_no, offset, length, chunk_md5)`` — one row per
    content-defined chunk.  ``chunk_md5`` is the dedup key: a GROUP BY
    on it finds every repeated byte run across the corpus (one
    partial-aggregated shuffle of 16-byte keys — the same fleet shape
    as exact doc dedup, at sub-document granularity)."""
    if avg_size & (avg_size - 1):
        raise ValueError("avg_size must be a power of two")
    if not (0 < min_size <= avg_size <= max_size):
        raise ValueError("need 0 < min_size <= avg_size <= max_size")

    sub = df.select(F.col(id_col), F.col(bin_col))
    schema = (f"{id_col} {dict(sub.dtypes)[id_col]}, chunk_no int, "
              "offset long, length long, chunk_md5 string")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, offs, lens, digs = [], [], [], [], []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                if blob is None:
                    continue
                b = bytes(blob)
                prev = 0
                for no, cut in enumerate(gear_boundaries(
                        b, min_size=min_size, avg_size=avg_size,
                        max_size=max_size)):
                    ids.append(rid)
                    nos.append(no)
                    offs.append(prev)
                    lens.append(cut - prev)
                    digs.append(hashlib.md5(b[prev:cut]).hexdigest())
                    prev = cut
            if ids:      # an all-null batch yields nothing (empty
                         # lists would arrow-cast float64→large_string)
                yield pd.DataFrame({id_col: ids, "chunk_no": nos,
                                    "offset": offs, "length": lens,
                                    "chunk_md5": digs})

    return sub.mapInPandas(gen, schema)


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """One-row storage report over a ``cdc_chunks`` result:
    total vs distinct chunks/bytes and the dedup ratio (bytes stored
    after chunk-level dedup / raw bytes)."""
    per = (chunks.groupBy("chunk_md5")
           .agg(F.count("*").cast("long").alias("copies"),
                F.first("length").alias("length")))
    return per.agg(
        F.sum("copies").cast("long").alias("n_chunks"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum(F.col("copies") * F.col("length")).cast("long")
         .alias("bytes_total"),
        F.sum("length").cast("long").alias("bytes_distinct"),
        F.round(F.sum("length")
                / F.sum(F.col("copies") * F.col("length")), 6)
         .alias("dedup_ratio"))
