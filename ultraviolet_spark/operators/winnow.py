"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
SIGMOD — the MOSS algorithm).

Position-aware LOCAL fingerprinting: hash every character k-gram of the
normalized text, slide a window of ``w`` consecutive k-gram hashes, and
in each window select the minimum (rightmost on ties).  The selected
(position, hash) pairs are the document's fingerprints.  Guarantee: any
shared substring of at least ``w + k - 1`` characters produces at least
one shared fingerprint in both documents — the detection floor MinHash
(a global sketch) cannot offer.  Density is ~2/(w+1) of all k-grams.

Scale shape: k-gram hashing is per-row Catalyst inside the scan stage;
selection is ONE window (min of ``struct(hash, −pos)`` over the next
``w`` positions — lexicographic struct order gives min-hash with
rightmost-position tie-break in a single pass) on the doc-hash
exchange, then a distinct.  Everything downstream shuffles 8-byte
(hash, doc) rows, never text.  The hash is the first 8 hex digits of
md5 so a SQL oracle can rebuild every fingerprint bit-for-bit
cross-engine (q159).

(The first version selected fingerprints with nested array expressions
referencing the k-gram hash array column — Catalyst inlined the whole
290-md5 array expression into EVERY one of the ~283 window references,
and optimization/codegen effectively never terminated on real ~300-char
documents.  Column references are not CSE barriers; an explode + window
is the robust shape.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["winnow_fingerprints", "winnow_pairs"]

_NORM_RE = "[^a-zA-Z0-9]"


def winnow_fingerprints(df: DataFrame, *, k: int = 7, w: int = 8,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """One row per selected fingerprint: (id, fp_pos, fp_hash).

    ``fp_pos`` is the 1-based k-gram start position in the normalized
    text (ASCII alphanumerics only, lowercased — normalization is part
    of the fingerprint definition so whitespace/punct edits don't shift
    matches).  Documents shorter than ``k + w - 1`` normalized chars
    have no full window and yield no rows.
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    from pyspark.sql import Window

    norm = F.lower(F.regexp_replace(F.col(text_col).cast("string"),
                                    _NORM_RE, ""))
    base = (df.select(F.col(id_col), norm.alias("__norm"))
              .withColumn("__m", F.length("__norm") - F.lit(k - 1))
              .filter(F.col("__m") >= w))
    # one row per k-gram: (id, pos, hash) — the explode argument is a
    # TOTAL expression (the __m >= w filter guarantees __m >= 1, and
    # InferFiltersFromGenerate evaluates the copied predicate on every
    # row regardless, so sequence(1, __m) is always ascending here)
    grams = base.select(
        F.col(id_col),
        F.posexplode(F.expr(
            f"transform(sequence(1, __m), i -> "
            f"cast(conv(substring(md5(encode(substring(__norm, i, {k}),"
            f" 'utf-8')), 1, 8), 16, 10) as bigint))"))
        .alias("__i", "__h"),
        F.col("__m"))
    grams = grams.select(
        id_col, (F.col("__i") + 1).alias("__pos"), "__h", "__m")
    # per window start s: min of struct(h, -pos) over positions
    # [s, s+w-1] — lexicographic struct order = smallest hash, ties
    # broken toward the LARGEST position (rightmost, per the paper)
    sel_w = (Window.partitionBy(id_col).orderBy("__pos")
             .rowsBetween(0, w - 1))
    sel = (grams.withColumn(
        "__min", F.min(F.struct(F.col("__h"),
                                (-F.col("__pos")).alias("__np")))
        .over(sel_w))
        .filter(F.col("__pos") <= F.col("__m") - F.lit(w - 1)))
    return (sel.select(F.col(id_col),
                       (-F.col("__min.__np")).cast("int").alias("fp_pos"),
                       F.col("__min.__h").alias("fp_hash"))
            .distinct())


def winnow_pairs(fps: DataFrame, *, min_shared: int = 2,
                 id_col: str = "doc_id") -> DataFrame:
    """Document pairs sharing >= ``min_shared`` DISTINCT fingerprint
    hashes (the MOSS matching step).  Shuffles only (hash, id) rows;
    bucket fan-out is bounded by hash-collision group sizes, never by
    corpus size squared."""
    a = fps.select(F.col(id_col).alias("id_a"),
                   F.col("fp_hash").alias("h")).distinct()
    b = fps.select(F.col(id_col).alias("id_b"),
                   F.col("fp_hash").alias("h")).distinct()
    return (a.join(b, "h")
             .filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("shared_fps"))
             .filter(F.col("shared_fps") >= min_shared))
