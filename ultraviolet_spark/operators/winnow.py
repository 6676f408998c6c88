"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
SIGMOD — the MOSS algorithm).

Position-aware LOCAL fingerprinting: hash every character k-gram of the
normalized text, slide a window of ``w`` consecutive k-gram hashes, and
in each window select the minimum (rightmost on ties).  The selected
(position, hash) pairs are the document's fingerprints.  Guarantee: any
shared substring of at least ``w + k - 1`` characters produces at least
one shared fingerprint in both documents — the detection floor MinHash
(a global sketch) cannot offer.  Density is ~2/(w+1) of all k-grams.

Scale shape: fingerprint selection is PURE per-row Catalyst (array
expressions inside the scan stage — zero shuffle, zero Python); only
the pair-finding step shuffles, and it shuffles 8-byte (hash, doc)
rows, never text.  The hash is the first 8 hex digits of md5 so a SQL
oracle can rebuild every fingerprint bit-for-bit cross-engine (q159).
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
    norm = F.lower(F.regexp_replace(F.col(text_col).cast("string"),
                                    _NORM_RE, ""))
    out = (df.select(F.col(id_col), norm.alias("__norm"))
             .withColumn("__m", F.length("__norm") - F.lit(k - 1))
             .filter(F.col("__m") >= w)
             # all k-gram hashes, one array expression inside the scan.
             # NOTE the expressions must be TOTAL even for rows the
             # __m >= w filter drops: InferFiltersFromGenerate copies
             # the explode argument into a pre-filter predicate that is
             # evaluated on EVERY row (no short-circuit after subexpr
             # elimination), and sequence(1, negative) is DESCENDING in
             # Spark — hence the IF guards and try_element_at.
             .withColumn("__hs", F.expr(
                 f"IF(__m >= 1, transform(sequence(1, __m), i -> "
                 f"cast(conv(substring(md5(encode(substring(__norm, i, {k}),"
                 f" 'utf-8')), 1, 8), 16, 10) as bigint)), "
                 f"array())"))
             # per window start s: rightmost argmin of hs[s .. s+w-1]
             # (<= makes later indices win ties, per the winnowing paper)
             .withColumn("__sel", F.expr(
                 f"IF(__m >= {w}, "
                 f"array_distinct(transform(sequence(1, __m - {w - 1}), s -> "
                 f"aggregate(sequence(s, s + {w - 1}), "
                 f"named_struct('h', 9223372036854775807L, 'p', -1), "
                 f"(acc, i) -> IF(try_element_at(__hs, i) <= acc.h, "
                 f"named_struct('h', try_element_at(__hs, i), "
                 f"'p', cast(i as int)), acc)))), "
                 f"slice(array(named_struct('h', 9223372036854775807L, "
                 f"'p', -1)), 1, 0))"))
             .select(id_col, F.explode("__sel").alias("__fp"))
             .select(id_col, F.col("__fp.p").alias("fp_pos"),
                     F.col("__fp.h").alias("fp_hash")))
    return out


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
