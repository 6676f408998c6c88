"""Streaming-sketch operators (the deterministic complement to the
built-in approx aggregates the engine already exercises: HLL++
approx_count_distinct in q46, t-digest percentile_approx in q60).

Misra–Gries heavy hitters is the classic two-pass frequent-items
recipe (Misra & Gries 1982; the "MG summary" of Cormode 2008, public):
pass 1 keeps a capacity-k counter summary per partition — every item
with global frequency > n/k is GUARANTEED to survive (pigeonhole: it
must exceed n_p/k in at least one partition, and per-partition MG
never drops such an item); pass 2 exactly recounts the (small)
candidate union and filters to the guarantee threshold, so the final
output is EXACT — identical to a full GROUP BY + HAVING — while only
ever shuffling candidate keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mg_merge(summary, batch, capacity: int):
    """Merge a batch's exact counts into a capacity-bounded MG summary
    (Agarwal et al. 2012 "Mergeable Summaries": add, then subtract the
    (capacity+1)-th largest count from everything and drop ≤ 0).  Any
    item whose true count in the stream so far exceeds stream/capacity
    keeps a positive residual, so it can never be evicted."""
    from collections import Counter

    summary.update(batch)
    if len(summary) > capacity:
        vals = sorted(summary.values(), reverse=True)
        thresh = vals[capacity]          # (capacity+1)-th largest
        summary = Counter({t: c - thresh for t, c in summary.items()
                           if c > thresh})
    return summary


def heavy_hitter_tokens(docs: DataFrame, *, k: int = 100,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """EXACT global token frequencies for every token with frequency
    > n/k (n = total token count), found without ever shuffling the
    full token multiset.

    Returns ``(token, cnt)`` for tokens with ``cnt * k > n`` — exactly
    the rows ``GROUP BY token HAVING cnt * k > n`` would produce, which
    is what the DuckDB oracle runs.

    Scale notes (100 TB): pass 1 is mapInPandas — one capacity-k MG
    summary per partition, emitting ≤ k candidate tokens per partition
    (bytes ∝ partitions × k, independent of corpus size); pass 2
    semi-joins the scan against the candidate set (broadcast — it is
    tiny) and aggregates ONLY candidate tokens, so the groupBy shuffle
    carries ≤ partitions × k keys instead of every distinct token.
    The full-vocabulary groupBy this replaces is the known killer on
    web-scale corpora (vocab grows with corpus; candidates don't).
    """
    toks_col = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = (docs.filter(F.length(F.trim(F.col(text_col))) > 0)
            .select(toks_col.alias("__w")))

    cand_schema = T.StructType([T.StructField("token", T.StringType())])

    def pass1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter
        from itertools import chain

        summary: Counter = Counter()
        for pdf in batches:
            # exact per-batch counts at C speed, then one bounded merge
            batch = Counter(chain.from_iterable(pdf["__w"]))
            summary = _mg_merge(summary, batch, k)
        # explicit object dtype: an EMPTY partition otherwise yields a
        # float64 column that Arrow cannot cast to the string schema
        yield pd.DataFrame(
            {"token": pd.Series(list(summary.keys()), dtype=object)})

    cands = base.mapInPandas(pass1, schema=cand_schema).distinct()

    exploded = base.select(F.explode("__w").alias("token"))
    total = exploded.agg(F.count("*").cast("long").alias("__n"))
    counts = (exploded.join(F.broadcast(cands), on="token", how="left_semi")
              .groupBy("token")
              .agg(F.count("*").cast("long").alias("cnt")))
    return (counts.crossJoin(F.broadcast(total))
            .filter(F.col("cnt") * k > F.col("__n"))
            .select("token", "cnt"))


# ------------------------------------------------------------------ bloom

def _bloom_positions(v, *, n_bits: int, k: int):
    """k bit positions for string column ``v``: the first 12 md5 hex
    chars of ``value:i`` as an integer mod n_bits — deterministic and
    reproducible in ANY engine with md5 (that's what makes the Bloom
    membership exactly oracle-able, unlike library filters whose hash
    seeds are private)."""
    return [
        (F.conv(F.substring(
            F.md5(F.encode(F.concat(v, F.lit(f":{i}")), "UTF-8")),
            1, 12), 16, 10).cast("long") % n_bits)
        for i in range(k)
    ]


def bloom_build(df: DataFrame, *, col: str, n_bits: int = 2 ** 23,
                k: int = 3) -> DataFrame:
    """DISTRIBUTED Bloom filter as a ``(word_idx, word)`` table of
    32-bit words — never collected to the driver (a 2^30-bit filter is
    just a 33M-row/260MB table), built with ONE partial-aggregated
    shuffle on word_idx, and consumed by broadcast in
    :func:`bloom_might_contain`.

    The classic use is web-scale decontamination: build over the
    benchmark set's n-grams once, probe 10^12 document n-grams with no
    false negatives by construction (a bit every hash set is never
    unset) and FP rate ~(1-e^{-kn/m})^k.
    """
    v = F.col(col).cast("string")
    pos = F.explode(F.array(*_bloom_positions(
        v, n_bits=n_bits, k=k))).alias("__pos")
    return (df.filter(v.isNotNull()).select(pos)
            .select(F.floor(F.col("__pos") / 32).alias("word_idx"),
                    F.expr("shiftleft(1L, cast(__pos % 32 as int))")
                    .alias("__bit"))
            .groupBy("word_idx")
            .agg(F.bit_or("__bit").alias("word")))


def bloom_might_contain(df: DataFrame, bloom: DataFrame, *, col: str,
                        n_bits: int = 2 ** 23, k: int = 3,
                        out: str = "might_contain") -> DataFrame:
    """``df`` + boolean ``out``: true iff ALL k bits for ``col`` are
    set in ``bloom`` (a ``bloom_build`` result with the same n_bits/k —
    the caller owns that contract).  No false negatives; false
    positives at the filter's design rate.

    Plan: explode k probe positions, broadcast-join the bloom words,
    bool_and per input row — the probe side never shuffles.
    """
    from pyspark.sql.functions import broadcast

    v = F.col(col).cast("string")
    probes = (df.withColumn("__pos", F.explode(F.array(
        *_bloom_positions(v, n_bits=n_bits, k=k))))
        .withColumn("__w", F.floor(F.col("__pos") / 32))
        .withColumn("__bit",
                    F.expr("shiftleft(1L, cast(__pos % 32 as int))")))
    joined = (probes.join(broadcast(bloom),
                          probes["__w"] == bloom["word_idx"], "left")
              .withColumn("__hit",
                          F.col("word").isNotNull()
                          & (F.col("word").bitwiseAND(F.col("__bit"))
                             != 0)))
    return (joined.groupBy(*df.columns)
            .agg(F.bool_and("__hit").alias(out)))


# ------------------------------------------------------------- hyperloglog

def hll_registers(df: DataFrame, *, col: str, p: int = 9,
                  by: str | list | None = None) -> DataFrame:
    """Mergeable HyperLogLog sketch as a ``(bucket, max_rho)`` TABLE
    (optionally one sketch per ``by`` group — e.g. per crawl day)
    (Flajolet et al. 2007) — the distinct-URL counter that actually
    composes at 100 TB: per-partition partial ``max`` makes the single
    shuffle carry at most ``2^p`` rows per partition, sketches for two
    corpora/days union+re-max into one, and nothing ever collects.

    Hash is the same engine-portable idiom as the Bloom filter: the
    first 48 bits of md5 — ``bucket`` = low ``p`` bits, ``rho`` =
    leading-zero count of the remaining ``48-p`` bits + 1 (computed
    exactly with integer/string ops: ``(48-p) - length(ltrim('0',
    bin(w))) + 1``, no float log2).  Bit-identical in any engine with
    md5, which is what makes the register table exactly oracle-able —
    unlike approx_count_distinct's private HLL++ seeds (q46 can only
    assert an accuracy band; this table hash-matches).
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    width = 48 - p
    by = [by] if isinstance(by, str) else list(by or [])
    v = F.col(col).cast("string")
    h = F.conv(F.substring(F.md5(F.encode(v, "UTF-8")), 1, 12),
               16, 10).cast("long")
    w = F.expr(f"shiftright(__h, {p})")
    rho = (F.lit(width + 1)
           - F.length(F.expr("ltrim('0', bin(__w))"))).cast("int")
    return (df.filter(v.isNotNull())
            .select(*by, h.alias("__h"))
            .withColumn("__w", w)
            .select(*by, (F.col("__h") % m).cast("int").alias("bucket"),
                    rho.alias("rho"))
            .groupBy(*by, "bucket")
            .agg(F.max("rho").alias("max_rho")))


def hll_estimate(registers: DataFrame, *, p: int = 9) -> DataFrame:
    """One-row ``(estimate,)`` from a :func:`hll_registers` table —
    the standard bias-corrected harmonic mean with the small-range
    linear-counting correction.  Float result: contract-tested for
    accuracy in pytest (like q46), not value-hashed."""
    import math

    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else (
        0.673 if m == 16 else 0.697 if m == 32 else 0.709)
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("__s"),
        F.count("*").alias("__nz"))
    # absent buckets contribute 2^0 each; zeros = m - nz
    est = (F.lit(alpha * m * m)
           / (F.col("__s") + (F.lit(m) - F.col("__nz"))))
    zeros = (F.lit(m) - F.col("__nz")).cast("double")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    return agg.select(
        F.when((est <= 2.5 * m) & (zeros > 0), linear)
        .otherwise(est).alias("estimate"))


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union register tables from several corpora into one sketch —
    the mergeability that makes HLL the right shape for incremental
    crawls (yesterday's sketch + today's delta, never a rescan)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("max_rho").alias("max_rho"))


# ---------------------------------------------------------- count-min

def cms_table(df: DataFrame, *, col: str, width: int = 1 << 12,
              depth: int = 4) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) as a
    ``(d, w, cnt)`` TABLE — approximate frequencies for EVERY key in a
    stream too large to GROUP BY exactly, with one-sided error
    (estimate ≥ true, overshoot ≤ εN w.h.p., ε = e/width).

    Same fleet-shape arguments as the Bloom/HLL tables: one
    partial-aggregated shuffle on (d, w) bounded by depth·width rows,
    mergeable by adding cells, never collected.  Row hashes reuse the
    engine-portable md5 idiom, so the whole sketch is bit-identical in
    any engine — exactly oracle-able, unlike library CMS seeds.
    Complements Misra–Gries (heavy_hitter_tokens): MG answers "which
    keys are heavy" exactly; CMS answers point queries for ALL keys.
    """
    v = F.col(col).cast("string")
    rows = F.explode(F.array(*[
        F.struct(F.lit(d).alias("d"),
                 _bloom_positions(v, n_bits=width, k=d + 1)[d].alias("w"))
        for d in range(depth)])).alias("__rw")
    return (df.filter(v.isNotNull()).select(rows)
            .select(F.col("__rw.d").alias("d"), F.col("__rw.w").alias("w"))
            .groupBy("d", "w")
            .agg(F.count("*").cast("long").alias("cnt")))


def cms_estimate(cms: DataFrame, probes: DataFrame, *, col: str,
                 width: int = 1 << 12, depth: int = 4,
                 out: str = "est") -> DataFrame:
    """``probes`` + the CMS point estimate (min over the depth rows).
    The sketch side broadcasts; the probe side never shuffles."""
    from pyspark.sql.functions import broadcast

    v = F.col(col).cast("string")
    p = probes.withColumn("__pr", F.explode(F.array(*[
        F.struct(F.lit(d).alias("d"),
                 _bloom_positions(v, n_bits=width, k=d + 1)[d].alias("w"))
        for d in range(depth)])))
    j = p.join(broadcast(cms),
               (p["__pr.d"] == cms["d"]) & (p["__pr.w"] == cms["w"]),
               "left")
    return (j.groupBy(*probes.columns)
            .agg(F.min(F.coalesce("cnt", F.lit(0))).alias(out)))


def bloom_semi_join(big: DataFrame, small: DataFrame, *, big_col: str,
                    small_col: str | None = None, n_bits: int = 2 ** 23,
                    k: int = 3, how: str = "left_semi") -> DataFrame:
    """Runtime-filtered join: prune ``big`` against a Bloom filter of
    ``small``'s keys BEFORE the real join — the 100 TB shape for
    "join a petabyte fact table to a selective dimension subset".
    Result is EXACTLY ``big.join(small, cond, how)`` (the Bloom has no
    false negatives and the final join removes false positives); what
    changes is the plan: the big side reaches the join shuffle already
    reduced to ~|matches| + FP·|big| rows.

    Probe shape matters at scale: :func:`bloom_might_contain`'s
    explode + groupBy(*columns) re-shuffles the probe side, so here the
    k probe bits are checked with k BROADCAST hash joins (the filter is
    n_bits/32 rows ≈ 1 MiB at the default) — the big side stays
    pipelined in its scan stage, zero exchanges until the final join.
    ``how='left_semi'`` (default) gives the pure existence filter;
    'inner' returns the enriched join.
    """
    small_col = big_col if small_col is None else small_col
    bloom = bloom_build(small, col=small_col, n_bits=n_bits, k=k)
    v = F.col(big_col).cast("string")
    probed = big
    keep = F.lit(True)
    for i, pos in enumerate(_bloom_positions(v, n_bits=n_bits, k=k)):
        b = bloom.select(F.col("word_idx").alias(f"__w{i}"),
                         F.col("word").alias(f"__word{i}"))
        probed = (probed
                  .withColumn(f"__p{i}", pos)
                  .join(F.broadcast(b),
                        F.floor(F.col(f"__p{i}") / 32) == F.col(f"__w{i}"),
                        "left"))
        keep = keep & F.col(f"__word{i}").isNotNull() & (
            F.col(f"__word{i}").bitwiseAND(
                F.expr(f"shiftleft(1L, cast(__p{i} % 32 as int))")) != 0)
    pruned = probed.filter(keep).select(*big.columns)
    if how == "left_semi":
        return pruned.join(
            small.select(F.col(small_col).alias(big_col)).distinct()
            if small_col != big_col else small.select(big_col).distinct(),
            big_col, "left_semi")
    return pruned.join(small, big[big_col] == small[small_col], how)


def bottomk_signatures(df: DataFrame, *, group_col: str, item_col: str,
                       k: int = 64) -> DataFrame:
    """Per-group bottom-k set signature: the k lexicographically
    smallest md5 hex digests of the group's DISTINCT items.  md5 hex
    order is engine-portable (plain string comparison, no numeric
    conversion) and content-blind, so the signature is a uniform
    random k-sample of the set that is still a pure function of the
    data — same sketch on every run, engine and cluster size.

    Scale: the only full-data pass is the (group, h) distinct — one
    map-side-combined exchange; the rank window runs on the already
    tiny distinct frame.  Output ≤ k rows per group.
    """
    from pyspark.sql import Window

    tk = (df.select(F.col(group_col).alias("g"),
                    F.md5(F.col(item_col).cast("string")).alias("h"))
          .filter(F.col("h").isNotNull())
          .distinct())
    w = Window.partitionBy("g").orderBy("h")
    return (tk.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= k)
            .select(F.col("g").alias(group_col), "h"))


def bottomk_jaccard_pairs(df: DataFrame, *, group_col: str,
                          item_col: str, k: int = 64) -> DataFrame:
    """Estimated Jaccard similarity between every pair of groups' item
    SETS from bottom-k signatures (Cohen & Kaplan bottom-k sketches) —
    per-GROUP set similarity, complementing per-document MinHash.

    Estimator: take the k smallest hashes of sig(A) ∪ sig(B) and count
    how many lie in both sets; Ĵ = n_both / n_bottom.  Two exactness
    facts make signatures sufficient (no second look at the data):
    bottom-k(sig(A) ∪ sig(B)) = bottom-k(A ∪ B) because sig(A) holds
    A's k smallest; and for h ∈ bottom-k(A ∪ B) with h ∈ A, fewer than
    k elements of A∪B — hence of A — precede h, so h ∈ sig(A):
    membership flags computed from signatures alone are exact.  When
    |A ∪ B| ≤ k the estimate IS the exact Jaccard (n_bottom = |A∪B|).
    The estimate is deterministic — a pure function of the data — so
    it is exactly reproducible cross-engine, while its ACCURACY is the
    usual sketch guarantee (std err ≈ √(J(1−J)/k)).

    Scale: one full-data distinct (the signature pass); everything
    after runs on G·k signature rows — the G² pair frame is metadata-
    sized (pairs of GROUPS, not rows) and broadcast.
    """
    sig = bottomk_signatures(df, group_col=group_col,
                             item_col=item_col, k=k)
    from pyspark.sql import Window

    gs = sig.select(F.col(group_col).alias("g")).distinct()
    pairs = (gs.select(F.col("g").alias("g1"))
             .join(F.broadcast(gs.select(F.col("g").alias("g2"))),
                   F.col("g1") < F.col("g2")))
    lab = sig.select(F.col(group_col).alias("__g"), "h")
    u = (pairs.join(F.broadcast(lab),
                    (F.col("__g") == F.col("g1"))
                    | (F.col("__g") == F.col("g2")))
         .groupBy("g1", "g2", "h")
         .agg(F.max(F.when(F.col("__g") == F.col("g1"), 1)
                    .otherwise(0)).alias("__h1"),
              F.max(F.when(F.col("__g") == F.col("g2"), 1)
                    .otherwise(0)).alias("__h2")))
    w = Window.partitionBy("g1", "g2").orderBy("h")
    rk = u.withColumn("__r", F.row_number().over(w)).filter(F.col("__r") <= k)
    return (rk.groupBy("g1", "g2")
            .agg(F.count("*").cast("long").alias("n_bottom"),
                 F.sum(F.col("__h1") * F.col("__h2")).cast("long")
                  .alias("n_both"))
            .withColumn("jaccard_est",
                        F.col("n_both").cast("double")
                        / F.col("n_bottom").cast("double")))
