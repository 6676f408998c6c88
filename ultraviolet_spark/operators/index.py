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


def postings_compression_stats(postings: DataFrame) -> DataFrame:
    """Storage accounting for delta+varint posting-list compression —
    the sizing pre-pass an index builder runs before choosing codecs:
    per token, the doc-id list is delta-encoded against its sorted
    predecessor (gap 1 for runs of adjacent ids) and each gap costs
    ``ceil(bits(gap)/7)`` LEB128 bytes.

    Returns ``(token, n_docs, raw_bytes, varint_bytes)`` with
    ``raw_bytes = 8·n_docs`` (uncompressed int64 ids).  All integer —
    exact cross-engine.

    Plan: one lag window per token partition (token-hash exchange, the
    same key the dictionary rollup shuffles on) + a partial-agg
    groupBy.  Gaps are positive because (token, doc) rows are unique by
    construction in :func:`build_postings`.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("token").orderBy("doc_id")
    d = postings.select(
        "token",
        (F.col("doc_id") - F.lag("doc_id").over(w)).alias("__gap"),
        F.col("doc_id").alias("__id"))
    # first posting stores the absolute id; gap NULL → encode the id
    gap = F.coalesce(F.col("__gap"), F.col("__id") + 1)  # +1: ids are
    # 0-based and LEB128 of 0 still costs one byte — treat the absolute
    # value like a gap from the sentinel -1
    nbytes = (F.when(gap < F.lit(1 << 7), 1)
              .when(gap < F.lit(1 << 14), 2)
              .when(gap < F.lit(1 << 21), 3)
              .when(gap < F.lit(1 << 28), 4)
              .when(gap < F.lit(1 << 35), 5)
              .when(gap < F.lit(1 << 42), 6)
              .when(gap < F.lit(1 << 49), 7)
              .when(gap < F.lit(1 << 56), 8)
              .otherwise(9)).cast("long")
    return (d.groupBy("token")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 (F.count("*") * 8).cast("long").alias("raw_bytes"),
                 F.sum(nbytes).alias("varint_bytes")))


def rrf_fuse(rankings, *, id_col: str = "doc_id",
             score_col: str = "score", by: str | None = None,
             k: int = 60, top_k: int | None = None) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of several
    retrieval rankings — the standard way to merge BM25 with an
    embedding ranker without score calibration: each list contributes
    ``1/(k + rank)`` per doc and the fused order is the sum.

    Determinism discipline: each contribution is the EXACT integer
    ``1e9 div (k + rank)`` (nano-units) and the cross-list sum is
    integer — a float Σ over ≥3 lists is engine-order-dependent in
    its last ULP.  Ranks are row_number over (score desc, id asc), so
    score ties are deterministic too.  Returns ``([by,] id, n_lists,
    rrf_nano, rrf)`` where ``rrf`` is the nano count paid back out as
    one double division.

    Scale: rank windows partition by ``by`` (the query key) — fusing
    per-query candidate lists, each bounded by the upstream top-N.
    With ``by=None`` the window is global: fine for single-query /
    corpus-ranking use, not for a 10^9-query batch (pass the query
    column).  The fuse itself is one union + one 8-byte-key agg.
    """
    from pyspark.sql import Window

    parts = []
    for r in rankings:
        w = (Window.partitionBy(by) if by is not None
             else Window.partitionBy())
        w = w.orderBy(F.desc(score_col), F.asc(id_col))
        keep = ([by] if by is not None else []) + [id_col]
        parts.append(r.select(*keep, F.row_number().over(w)
                              .alias("__rank")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    contrib = (F.lit(1_000_000_000) - F.lit(1_000_000_000)
               % (F.lit(k) + F.col("__rank"))) / (F.lit(k)
                                                  + F.col("__rank"))
    grouped = ([by] if by is not None else []) + [id_col]
    out = (u.groupBy(*grouped)
           .agg(F.count("*").cast("long").alias("n_lists"),
                F.sum(contrib.cast("long")).cast("long")
                .alias("rrf_nano")))
    out = out.withColumn(
        "rrf", F.col("rrf_nano").cast("double") / F.lit(1e9))
    out = out.orderBy(F.desc("rrf_nano"),
                      *[F.asc(c) for c in grouped])
    return out.limit(top_k) if top_k else out
