"""Distributed token-level suffix arrays via prefix doubling
(Manber–Myers 1990), the index structure behind exact substring-level
corpus deduplication (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better" — their suffix-array dedup is single-node
and memory-bound at ~O(n); prefix doubling re-expressed as log(L)
join+re-rank rounds is the distributed answer).

Every suffix is a row ``(doc_id, pos)`` over the doc's token array
(suffixes never cross document boundaries — cross-doc "substrings" are
meaningless for dedup).  ``sa_rank`` is the GLOBAL dense lexicographic
rank of the suffix across the whole corpus: equal ranks ⇔ identical
(truncated) suffixes, which is exactly the equivalence dedup needs.

Scale design — the part that matters at 10^12 docs:

* NO single-partition window.  A naive ``dense_rank() OVER (ORDER BY
  …)`` forces every row through one task; instead
  :func:`_global_dense_rank` range-partitions on the key, sorts within
  partitions, computes per-partition local dense ranks in one
  Arrow-batched pass (state carried across batches inside the
  ``mapInPandas`` generator — one Python instance per partition), and
  merges with a driver-side prefix sum over P boundary rows (first/last
  key + distinct count per partition — same bounded-collect regime as
  the as-of hot-key probe).  Ranks are exact global dense ranks
  regardless of where the sampled range boundaries fall, so the output
  is deterministic even though the partitioner samples.
* Each doubling round is one equi-join shuffle (fetch the rank of the
  suffix ``h`` tokens ahead; missing ⇒ sentinel −1, which sorts first:
  a proper prefix is lexicographically smaller) plus one re-rank.
  ``ceil(log2(max_tokens))`` rounds total, with early exit as soon as
  every suffix's rank is unique.
* Rounds persist their rank table and unpersist the previous one, so
  lineage stays flat across iterations.

The q160 oracle replays the SAME mathematics as 5 chained global
``dense_rank`` CTEs in DuckDB (fine at oracle scale; the point of the
Spark side is that it never does that).  The q161 repeated-span oracle
is fully independent: it groups by the literal token slice and never
runs prefix doubling at all.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def _tokens(text_col: str, max_tokens: int) -> Column:
    return F.slice(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                   1, max_tokens)


def _suffix_rows(docs: DataFrame, *, max_tokens: int, text_col: str,
                 id_col: str) -> DataFrame:
    """One row per (doc, token position), pos 1-based, with the token."""
    d = docs.filter(F.length(F.trim(F.col(text_col))) > 0)
    return (d.select(F.col(id_col).alias("doc_id"),
                     F.posexplode(_tokens(text_col, max_tokens))
                      .alias("idx", "token"))
            .select("doc_id", (F.col("idx") + 1).alias("pos"), "token"))


def _global_dense_rank(df: DataFrame, key_cols: list[str],
                       out_col: str, *, partitions: int) -> DataFrame:
    """Exact global dense rank over ``key_cols`` without a
    single-partition window: range-repartition + in-partition sorted
    scan + P-row boundary prefix sum (see module docstring)."""
    ranged = (df.repartitionByRange(partitions, *key_cols)
                .sortWithinPartitions(*key_cols)
                .withColumn("__pid", F.spark_partition_id()))

    fields = ranged.schema.fields
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in fields
    ) + ", __lrank bigint"

    keys = list(key_cols)

    def local_rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one generator instance per partition; batches arrive in sorted
        # order, so dense rank is a carried (last_key, rank) fold
        last_key = None
        rank = 0
        for pdf in batches:
            if pdf.empty:
                continue
            ks = list(zip(*(pdf[k].tolist() for k in keys)))
            out = []
            for k in ks:
                if k != last_key:
                    rank += 1
                    last_key = k
                out.append(rank)
            pdf = pdf.copy()
            pdf["__lrank"] = pd.Series(out, index=pdf.index, dtype="int64")
            yield pdf

    local = ranged.mapInPandas(local_rank, out_schema)
    local = local.persist()

    key_struct = F.struct(*[F.col(k) for k in keys])
    bounds = (local.groupBy("__pid")
              .agg(F.min(key_struct).alias("__first"),
                   F.max(key_struct).alias("__last"),
                   F.max("__lrank").alias("__ndist"))
              .collect())
    bounds.sort(key=lambda r: r["__pid"])
    offsets: dict[int, int] = {}
    acc = 0
    prev_last = None
    for r in bounds:
        first = tuple(r["__first"])
        if prev_last is not None and first == prev_last:
            acc -= 1  # the boundary key was already counted once
        offsets[r["__pid"]] = acc
        acc += int(r["__ndist"])
        prev_last = tuple(r["__last"])

    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
        "__pid int, __off bigint")
    out = (local.join(F.broadcast(off_df), "__pid")
           .withColumn(out_col, F.col("__lrank") + F.col("__off"))
           .drop("__pid", "__lrank", "__off"))
    # (result, total distinct keys for early exit, persisted backing)
    return out, acc, local


def token_suffix_array(docs: DataFrame, *, max_tokens: int = 32,
                       text_col: str = "text", id_col: str = "doc_id",
                       partitions: int | None = None,
                       resolution: int | None = None) -> DataFrame:
    """Global suffix array over the corpus' (truncated) token arrays:
    ``(doc_id, pos, sa_rank)`` where ``sa_rank`` is the dense
    lexicographic rank of the suffix starting at token ``pos`` (1-based)
    among ALL suffixes of ALL documents.  Equal ranks ⇔ identical
    truncated suffixes.  ``resolution`` (a power of two ≤ max_tokens)
    stops doubling once prefixes of that many tokens are distinguished —
    ``resolution=8`` yields the rank table that groups 8-token spans,
    which is all substring-dedup needs.
    """
    spark = docs.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    limit = min(resolution or max_tokens, max_tokens)

    rows = _suffix_rows(docs, max_tokens=max_tokens, text_col=text_col,
                        id_col=id_col)
    n_rows = rows.count()

    r, n_distinct, backing = _global_dense_rank(
        rows.select("doc_id", "pos", "token"), ["token"], "sa_rank",
        partitions=partitions)
    r = r.drop("token")
    h = 1
    while h < limit and n_distinct < n_rows:
        ahead = r.select("doc_id", (F.col("pos") - h).alias("pos"),
                         F.col("sa_rank").alias("__r2"))
        j = (r.join(ahead, ["doc_id", "pos"], "left")
             .fillna({"__r2": -1})
             .withColumnRenamed("sa_rank", "__r1"))
        r, n_distinct, new_backing = _global_dense_rank(
            j, ["__r1", "__r2"], "sa_rank", partitions=partitions)
        r = r.drop("__r1", "__r2")
        new_backing.count()  # materialize before cutting the old cache
        backing.unpersist()
        backing = new_backing
        h *= 2
    return r.select("doc_id", "pos", "sa_rank")


def repeated_spans(docs: DataFrame, *, span: int = 8, max_tokens: int = 32,
                   text_col: str = "text", id_col: str = "doc_id",
                   partitions: int | None = None) -> DataFrame:
    """All positions whose ``span``-token prefix (the whole suffix, if
    shorter) occurs at least twice in the corpus — Lee et al.'s
    "repeated substring of length ≥ L" set, derived from the
    resolution-``span`` rank table of :func:`token_suffix_array`.
    Returns ``(doc_id, pos, span_class, n_occurrences)`` where
    ``span_class`` is the dense rank shared by all occurrences.
    """
    assert span & (span - 1) == 0, "span must be a power of two"
    r = token_suffix_array(docs, max_tokens=max_tokens, text_col=text_col,
                           id_col=id_col, partitions=partitions,
                           resolution=span)
    counts = (r.groupBy("sa_rank")
              .agg(F.count("*").alias("n_occurrences"))
              .filter(F.col("n_occurrences") > 1))
    return (r.join(counts, "sa_rank")
            .select("doc_id", "pos",
                    F.col("sa_rank").alias("span_class"),
                    "n_occurrences"))
