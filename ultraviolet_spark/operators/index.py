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


# ---------------------------------------------------------------------------
# Chunked-bitmap postings (roaring-lite boolean retrieval)
# ---------------------------------------------------------------------------
#
# A posting list stored as rows is the right SHUFFLE shape (see module
# docstring) but the wrong RETRIEVAL shape: boolean queries (w1 AND w2,
# w1 AND NOT w2) over row-postings are doc-id equi-joins whose width is
# the posting-list length — for stop words that is the corpus.  The
# classic answer (Lucene/roaring, public) is a chunked bitmap: docs are
# split into fixed-width chunks and each (token, chunk) row carries one
# integer whose bits mark member docs.  Boolean ops become a chunk
# equi-join (≤ ceil(n_docs/width) rows per token, 63× denser than doc
# rows for dense terms) plus bitwise AND/OR/ANDNOT + bit_count — the
# doc ids themselves never cross the wire for a COUNT query.
#
# Width is 63, not 64: bit 63 is the sign bit, and the two engines the
# correctness gate compares (Spark, DuckDB) disagree on signed shifts —
# DuckDB raises on 1::BIGINT << 63 where Spark wraps silently.  Keeping
# the top bit always-zero makes every bitmap word a non-negative int64
# with identical semantics in both engines (and in parquet/Arrow).


def bitmap_postings(pairs: DataFrame, *, id_col: str = "doc_id",
                    token_col: str = "token",
                    width: int = 63) -> DataFrame:
    """``(token, chunk, bits)`` chunked-bitmap postings from distinct
    ``(token, id)`` rows.  ``chunk = id div width``; bit ``id mod
    width`` of ``bits`` is set iff the doc contains the token.

    Scale notes (100 TB): the only shuffle is a partial-aggregated
    ``bit_or`` on (token, chunk) — map-side combine collapses each
    partition's contribution to one word per (token, chunk) before the
    exchange, so wire bytes ∝ distinct (token, chunk), bounded by
    vocabulary × ceil(n_docs/width) and in practice by the token's
    document frequency / width.  Requires ``id >= 0`` (enforced: a
    negative id would flip the sign bit or shift out of range on one
    engine but not the other).
    """
    if not 1 <= width <= 63:
        raise ValueError(f"width must be in [1, 63], got {width}")
    # NO .distinct() pre-pass: bit_or is idempotent, so duplicate
    # (token, id) rows OR the same bit — the whole build is ONE
    # map-side-combined shuffle instead of distinct's exchange + the
    # aggregation's
    dedup = pairs.select(
        F.col(token_col).alias("token"),
        F.col(id_col).cast("long").alias("__id"))
    # the id-sign assertion is folded INTO the bit expression (a separate
    # guard column would be pruned by Catalyst and never evaluate)
    # SQL-form shift: the Python F.shiftleft only takes a literal int
    # for numBits, and the bit position is per-row
    bit = F.when(
        F.assert_true(F.col("__id") >= 0,
                      F.lit("bitmap_postings: negative doc id")).isNull(),
        F.expr(f"shiftleft(cast(1 as bigint), "
               f"cast(__id % {int(width)} as int))"))
    return (dedup
            .select("token",
                    # integer div, not floor(double/): a double quotient
                    # is inexact past 2^53 and ids are full-range int64
                    F.expr(f"__id div {int(width)}").alias("chunk"),
                    bit.alias("__bit"))
            .groupBy("token", "chunk")
            .agg(F.bit_or("__bit").alias("bits")))


def bitmap_docs(bm: DataFrame, *, width: int = 63) -> DataFrame:
    """Inverse of :func:`bitmap_postings`: expand ``(token, chunk,
    bits)`` back to ``(token, doc_id)`` rows — the retrieval step that
    materializes ids AFTER boolean filtering collapsed the candidate
    set.  Pure Catalyst (sequence → filter on the mask → explode)."""
    return (bm.select("token", "chunk", "bits",
                      F.explode(F.sequence(F.lit(0), F.lit(width - 1)))
                       .alias("__b"))
              .filter(F.expr("(shiftright(bits, __b) & 1) = 1"))
              .select("token",
                      (F.col("chunk") * width + F.col("__b"))
                       .cast("long").alias("doc_id")))


def bitmap_bool_counts(bm: DataFrame, pairs: DataFrame) -> DataFrame:
    """Boolean-retrieval cardinalities for token pairs, computed
    entirely on bitmap words: for each ``(w1, w2)`` row of ``pairs``
    returns document frequencies ``df1``/``df2``, ``n_both`` (AND),
    ``n_w1_not_w2`` (ANDNOT), ``n_either`` (OR) and the Jaccard
    overlap — without ever materializing a doc id.

    Chunks where only one side has a row matter: AND of a missing word
    is 0, OR/ANDNOT of a missing word is the present word — handled by
    a full-outer chunk join with COALESCE(bits, 0), so sparse/disjoint
    chunk sets are exact, not just aligned ones.

    Scale notes: ``pairs`` is the query set (tiny — broadcast); each
    retrieval touches only the two tokens' chunk rows (semi-join
    pushes the token filter into the postings scan).  jaccard is one
    double division of two exact int64s — bit-identical cross-engine.
    """
    b1 = bm.select(F.col("token").alias("w1"), "chunk",
                   F.col("bits").alias("bits1"))
    b2 = bm.select(F.col("token").alias("w2"), "chunk",
                   F.col("bits").alias("bits2"))
    j1 = pairs.join(b1, "w1")                      # (w1, w2, chunk, bits1)
    j2 = pairs.join(b2, "w2")
    merged = (j1.join(j2, ["w1", "w2", "chunk"], "full_outer")
              .select("w1", "w2", "chunk",
                      F.coalesce("bits1", F.lit(0)).alias("a"),
                      F.coalesce("bits2", F.lit(0)).alias("b")))
    agg = (merged.groupBy("w1", "w2")
           .agg(F.sum(F.bit_count("a")).cast("long").alias("df1"),
                F.sum(F.bit_count("b")).cast("long").alias("df2"),
                F.sum(F.bit_count(F.col("a").bitwiseAND(F.col("b"))))
                 .cast("long").alias("n_both"),
                F.sum(F.bit_count(F.col("a")
                                   .bitwiseAND(F.bitwise_not(F.col("b")))))
                 .cast("long").alias("n_w1_not_w2"),
                F.sum(F.bit_count(F.col("a").bitwiseOR(F.col("b"))))
                 .cast("long").alias("n_either")))
    return agg.withColumn(
        "jaccard",
        F.round(F.col("n_both").cast("double")
                / F.col("n_either").cast("double"), 6))


def dictionary_hits(docs: DataFrame, phrases, *, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Multi-token PHRASE DICTIONARY matching (the RefinedWeb/C4-style
    bad-phrase filter, generalized to any fixed phrase list): every
    occurrence of every dictionary phrase in every document, as
    ``(doc_id, phrase, start)`` rows (0-based token position).

    One join handles ALL phrase lengths at once: the dictionary
    explodes to (phrase, offset, token) rows; a doc token at position
    p matching a phrase token at offset o is evidence for an
    occurrence starting at p−o; grouping by (doc, phrase, start) and
    requiring count(*) == phrase_length means every offset matched —
    i.e. a full occurrence.  Counts include OVERLAPPING occurrences
    ("a a" occurs twice in "a a a"), which substring replace()-style
    counting misses; the oracle uses the space-doubling substring
    trick and therefore only serves phrases that cannot self-overlap
    (first token ≠ later tokens) — the operator itself is exact for
    any phrase.

    Tokenization: whitespace split of lower(trim(text)) — the corpus
    convention shared with textstats/index/BM25.

    Scale notes (100 TB): the dictionary frame is broadcast (a real
    blocklist is thousands of rows); the token scan is scan-stage; the
    join keeps only tokens that appear SOMEWHERE in the dictionary —
    for a blocklist that is a tiny fraction of the corpus — and the
    candidate groupBy shuffles only those survivors keyed by
    (doc, phrase, start).  No cartesian, no per-row Python."""
    from pyspark.sql import Window

    spark = docs.sparkSession
    if not isinstance(phrases, DataFrame):
        phrases = spark.createDataFrame(
            [(p,) for p in phrases], "phrase string")
    dic = (phrases
           .select("phrase",
                   F.posexplode(F.split(F.lower(F.trim("phrase")),
                                        r"\s+"))
                    .alias("offset", "ptok"))
           .withColumn("plen", F.count("*").over(
               Window.partitionBy("phrase"))))
    toks = (docs
            .filter(F.length(F.trim(text_col)) > 0)
            .select(F.col(id_col).alias("doc_id"),
                    F.posexplode(F.split(F.lower(F.trim(F.col(text_col))),
                                         r"\s+"))
                     .alias("pos", "token")))
    cand = (toks.join(F.broadcast(dic), toks["token"] == dic["ptok"])
            .select("doc_id", "phrase", "plen",
                    (F.col("pos") - F.col("offset")).alias("start")))
    return (cand.filter(F.col("start") >= 0)
            .groupBy("doc_id", "phrase", "start")
            .agg(F.count("*").alias("__n"),
                 F.max("plen").alias("__plen"))
            .filter(F.col("__n") == F.col("__plen"))
            .select("doc_id", "phrase", F.col("start").cast("long")
                    .alias("start")))
