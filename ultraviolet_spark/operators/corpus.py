"""Composed corpus-cleaning pipeline — the end-to-end training-data op
that ties the individual operators together (quality gates → language
gate → exact dedup → optional MinHash near-dup removal).

Scale notes (100 TB): the quality/language gates are pure Catalyst
expressions evaluated in the scan stage (no shuffle, full pushdown
below them); exact dedup is one map-side-combined shuffle on md5(text);
near-dup removal adds the MinHash-LSH candidate/verify plan
(operators.dedup) plus one anti-join on doc id.  Nothing touches the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ultraviolet_spark.operators import textstats as X
from ultraviolet_spark.operators.dedup import (
    connected_components, exact_dedup, minhash_lsh_pairs)


def clean_corpus(docs: DataFrame, *, text_col: str = "text",
                 id_col: str = "doc_id", min_tokens: int = 20,
                 max_punct_ratio: float = 0.2, max_digit_ratio: float = 0.2,
                 langs: list[str] | None = None, near_dup: bool = False,
                 near_dup_threshold: float = 0.8, n: int = 3,
                 near_dup_policy: str = "pairwise") -> DataFrame:
    """Cleaned corpus, original columns preserved.

    Stages: non-empty → token-count floor → punct/digit-ratio ceilings →
    optional language allowlist → exact dedup (keep lowest ``id_col``) →
    optional near-dup removal, two policies:

    * ``"pairwise"`` (default): for every verified MinHash pair
      (id_a < id_b, jaccard ≥ threshold) the HIGHER id is dropped —
      one anti-join, no iteration; a doc survives iff it is never the
      larger side of any pair.
    * ``"cluster"``: connected components over the pair graph, keep
      exactly ONE doc (the minimum id) per transitive duplicate class —
      the production semantics (a-b, b-c collapses to {a} even though
      (a, c) was never emitted as a pair).  Costs the O(log n)-round
      label propagation of dedup.connected_components.
    """
    c = F.col(text_col)
    kept = docs.filter(F.length(c) > 0)
    kept = kept.filter(X.token_count(c) >= min_tokens)
    kept = kept.filter(X.punct_ratio(c) <= max_punct_ratio)
    kept = kept.filter(X.digit_ratio(c) <= max_digit_ratio)
    if langs:
        kept = kept.filter(F.col("lang").isin(list(langs)))
    kept = exact_dedup(kept, text_col=text_col, id_col=id_col)
    if near_dup:
        if near_dup_policy not in ("pairwise", "cluster"):
            raise ValueError(f"unknown near_dup_policy: {near_dup_policy!r}")
        pairs = minhash_lsh_pairs(kept, n=n, threshold=near_dup_threshold,
                                  text_col=text_col, id_col=id_col)
        if near_dup_policy == "cluster":
            cc = connected_components(pairs)
            losers = (cc.filter(F.col("node") != F.col("component"))
                      .select(F.col("node").alias(id_col)))
        else:
            losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        kept = kept.join(losers, on=id_col, how="left_anti")
    return kept.select(*docs.columns)


def chunk_documents(docs: DataFrame, *, max_tokens: int = 128,
                    overlap: int = 32, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Sliding-window token chunks — the training-prep op that turns
    long documents into model-sized pieces.

    Chunk k covers tokens [k·stride, k·stride + max_tokens) with
    stride = max_tokens − overlap; the last chunk may be short; empty
    docs yield no chunks.  Pure Catalyst (split → sequence → transform →
    posexplode): chunking happens in the scan stage, shuffle-free, and
    amplifies rows before any downstream shuffle — exactly where a
    100 TB pipeline wants the fan-out.
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    chunks = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(toks, s + 1, max_tokens)))
    pos = F.posexplode(chunks)
    return (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), n.alias("__n"), pos.alias("chunk_no", "chunk_text"))
        .filter(F.col("chunk_no") * stride < F.col("__n"))
        .select(
            id_col,
            F.col("chunk_no").cast("long").alias("chunk_no"),
            F.size(F.split(F.col("chunk_text"), r"\s+")).cast("long")
            .alias("n_chunk_tokens"),
            "chunk_text",
        )
    )


def corpus_report(docs: DataFrame, **kwargs) -> DataFrame:
    """(stage, n_docs) funnel: how many documents survive each gate —
    the audit table a cleaning run publishes next to its output."""
    stages = {
        "00_input": docs,
        "10_nonempty": docs.filter(F.length(F.col("text")) > 0),
        "20_quality_dedup": clean_corpus(docs, near_dup=False, **{
            k: v for k, v in kwargs.items() if k != "near_dup"}),
    }
    if kwargs.get("near_dup"):
        stages["30_near_dup"] = clean_corpus(docs, **kwargs)
    dfs = [df.select(F.lit(name).alias("stage"),
                     F.lit(1).cast("long").alias("one"))
           for name, df in stages.items()]
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out.groupBy("stage").agg(F.count("*").alias("n_docs"))


def hash_split(docs: DataFrame, *, id_col: str = "doc_id",
               train: float = 0.8, val: float = 0.1,
               salt: str = "") -> DataFrame:
    """Deterministic, engine-portable train/val/test assignment.

    Splits must be STABLE across runs, engines and cluster sizes (a doc
    must never migrate from test into train when the pipeline is re-run
    on more executors), so the bucket is derived from md5(id || salt) —
    identical in Spark and DuckDB — never from RNG or partition ids:
    bucket = first two hex nibbles → 0..255, train < ⌊256·train⌋ ≤ val
    < ⌊256·(train+val)⌋ ≤ test.  Pure Catalyst; evaluated in the scan
    stage (no shuffle).
    """
    t_hi = int(256 * train)
    v_hi = int(256 * (train + val))
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)).cast("binary"))
    alpha = "0123456789abcdef"
    b = ((F.instr(F.lit(alpha), F.substring(h, 1, 1)) - 1) * 16
         + (F.instr(F.lit(alpha), F.substring(h, 2, 1)) - 1))
    split = (F.when(b < t_hi, "train")
             .when(b < v_hi, "val").otherwise("test"))
    return docs.withColumn("bucket", b.cast("int")).withColumn("split", split)


def dsir_importance(docs: DataFrame, *, target_filter,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling",
    public paper): per-document log-likelihood ratio between a TARGET
    domain's unigram LM and the REST of the corpus, add-1 smoothed over
    the shared vocabulary.  High scores = "looks like the target
    domain"; used to up-/down-weight web text before training.

    ``target_filter`` is a boolean Column selecting the target docs
    (e.g. ``F.col('lang') == 'en'``).

    Returns ``(id, n_words, dsir_score)``.  Each per-word log-ratio is
    rounded to 6 decimals BEFORE the per-doc sum and the sum rounded
    again: ln() may differ in the last ulp across engines and the sum
    order across partitions is nondeterministic — snapping the terms to
    a 1e-6 grid keeps the per-doc sum ~1e-12 from a grid point, so the
    final round is stable under any summation order.

    Scale notes (100 TB): one explode feeds BOTH the vocabulary counts
    (groupBy word, map-side combined, conditional sums for target/rest)
    and the per-doc scoring join (shuffle keyed on word, then on doc) —
    the word-stats side is vocabulary-sized, not corpus-sized, and the
    three scalar totals travel via a 1-row cross join (broadcast), not
    ``collect``.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    words = (docs.filter(F.length(F.trim(F.col(text_col))) > 0)
             .select(F.col(id_col),
                     target_filter.cast("int").alias("__is_t"),
                     F.explode(toks).alias("__word")))
    stats = words.groupBy("__word").agg(
        F.sum("__is_t").alias("__ct"),
        F.sum(F.lit(1) - F.col("__is_t")).alias("__cr"))
    totals = stats.agg(
        F.sum("__ct").alias("__tt"), F.sum("__cr").alias("__tr"),
        F.count("*").alias("__v"))
    lr = stats.crossJoin(F.broadcast(totals)).select(
        "__word",
        F.round(
            F.log(((F.col("__ct") + 1) * (F.col("__tr") + F.col("__v"))).cast("double")
                  / ((F.col("__cr") + 1) * (F.col("__tt") + F.col("__v"))).cast("double")),
            6).alias("__lr"))
    return (words.join(lr, on="__word")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_words"),
                 F.round(F.sum("__lr"), 6).alias("dsir_score")))
