"""Inverted-index construction — the search-engine-shaped output of a
web corpus (token → posting list with term frequencies and positions).

The scalable representation is RELATIONAL: one row per (token, doc)
with the in-doc positions as a bounded array — never one row per token
with a corpus-wide array (a stop word's posting list at 10^12 docs is
terabytes; as rows it partial-aggregates and spills, as an array it is
a single un-splittable value).  Plan shape: posexplode (scan stage) →
one partial-aggregated shuffle on (token, doc) → optional second
rollup on token for the dictionary.  Positions are sort_array-ed so
results are partitioning-invariant (collect_list order is not
deterministic on its own).

Tokenization matches operators.textstats.tokens (lowercased whitespace
split) so postings, BM25 (textstats.bm25_scores) and the Misra–Gries
heavy hitters all agree on what a term is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ultraviolet_spark.operators.textstats import tokens


def build_postings(docs: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """``(token, doc_id, tf, positions)`` posting rows.  Positions are
    1-based in-document token ordinals, ascending."""
    toks = (docs
            .filter(F.length(F.trim(F.col(text_col))) > 0)
            .select(F.col(id_col).alias("doc_id"),
                    F.posexplode(tokens(F.lower(F.col(text_col))))
                    .alias("__pos", "token")))
    return (toks.groupBy("token", "doc_id")
            .agg(F.count("*").alias("tf"),
                 F.sort_array(F.collect_list(
                     (F.col("__pos") + 1).cast("int"))).alias("positions")))


def token_stats(postings: DataFrame) -> DataFrame:
    """Dictionary rollup of :func:`build_postings`: ``(token, df, cf)``
    — document frequency and collection frequency.  One further
    partial-aggregated shuffle on token."""
    return (postings.groupBy("token")
            .agg(F.count("*").cast("long").alias("df"),
                 F.sum("tf").cast("long").alias("cf")))


def phrase_hits(postings: DataFrame, phrase: list[str]) -> DataFrame:
    """Docs containing the exact consecutive ``phrase`` (positional
    AND): self-join the phrase terms' postings on doc, then require
    position(i+1) == position(i) + 1 via array_contains over the
    position arrays.  The phrase side is tiny (k terms) so every join
    is a broadcast against the big postings table."""
    if not phrase:
        raise ValueError("phrase must be non-empty")
    first = (postings.filter(F.col("token") == phrase[0])
             .select("doc_id", F.explode("positions").alias("p0")))
    hits = first
    for i, term in enumerate(phrase[1:], start=1):
        nxt = (postings.filter(F.col("token") == term)
               .select(F.col("doc_id").alias("__d"),
                       F.col("positions").alias(f"__ps{i}")))
        hits = (hits.join(nxt, hits["doc_id"] == F.col("__d"))
                .filter(F.array_contains(F.col(f"__ps{i}"),
                                         F.col("p0") + i))
                .drop("__d", f"__ps{i}"))
    return hits.select("doc_id").distinct()
