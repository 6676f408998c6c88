"""Deduplication operators for web-scale training-data pipelines:

* exact_dedup         — hash-groupBy exact duplicate removal
* shingles            — word n-gram shingle explode (Catalyst exprs only)
* ngram_jaccard_pairs — EXACT n-gram Jaccard similar-pair finder
                        (SQL-expressible → DuckDB-oracle-checkable)
* minhash_lsh_pairs   — MinHash + banded LSH near-dup candidates with
                        exact-Jaccard verification (the 100 TB scale path)
* simhash / simhash_pairs — 64-bit SimHash + banded Hamming near-dups

Scale design (100 TB):
* ngram_jaccard_pairs is quadratic in docs sharing a shingle — it is the
  small-scale ORACLE, not the scale path.
* minhash_lsh_pairs shuffles only (band_id, band_hash) keys — candidate
  generation is linear in docs × bands; the exact-verify join touches
  only candidate pairs.  Hot shingle buckets are impossible by
  construction (bucket key is the minhash signature band, uniform).
* All per-row hashing is vectorized numpy inside Arrow batches
  (mapInPandas); signatures travel as fixed-width arrays, never Python
  objects.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of each exact text duplicate
    class (``id_col`` must be row-unique).  One hash-partial-agg shuffle
    on md5(text) — map-side combine makes this safe on 10^12 rows."""
    h = F.md5(F.col(text_col).cast("binary")).alias("__h")
    keep = df.select(h, F.col(id_col)).groupBy("__h").agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=id_col, how="left_semi")


def duplicate_classes(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """md5-class summary: one row per duplicate class with count + keeper."""
    return (
        df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("text_md5"))
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("keeper_id"))
    )


# ---------------------------------------------------------------------------
# word n-gram shingles (pure Catalyst; mirrors the SQL oracle exactly)
# ---------------------------------------------------------------------------

def shingles(df: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(id, shingle) with DISTINCT word-``n``-gram shingles per doc.
    Docs with < n tokens produce zero rows."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    sh = F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)]))
    return (
        df.filter(F.size(toks) >= n)
        .select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def ngram_jaccard_pairs(df: DataFrame, *, n: int = 3, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """EXACT n-gram Jaccard pairs (id_a < id_b, jaccard ≥ threshold).

    Plan: shingle-explode → self-equi-join on shingle (hash shuffle on
    the shingle key) → per-pair intersection counts → jaccard.  Exact
    and SQL-expressible; use minhash_lsh_pairs at scale.
    """
    sh = shingles(df, n=n, text_col=text_col, id_col=id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, on="shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs_against(new: DataFrame, ref: DataFrame, *,
                                n: int = 3, threshold: float = 0.5,
                                text_col: str = "text",
                                id_col: str = "doc_id") -> DataFrame:
    """EXACT cross-corpus n-gram Jaccard pairs ``(new_id, ref_id,
    jaccard ≥ threshold)`` — the small-scale exact twin of
    :func:`minhash_lsh_pairs_against` (incremental-release dedup: a
    new crawl shard screened against the already-released corpus).

    Pairs meet only through SHARED shingles (inverted-index equi-join,
    never new×ref), which is exact for every pair with J > 0; the id
    spaces stay distinct and no ordering filter applies — the same
    new doc may match many reference docs and each match is a reason
    to drop it.  Use the LSH variant at scale; this one is the oracle
    that pins its semantics.
    """
    sh_n = (shingles(new, n=n, text_col=text_col, id_col=id_col)
            .select(F.col(id_col).alias("new_id"), "shingle"))
    sh_r = (shingles(ref, n=n, text_col=text_col, id_col=id_col)
            .select(F.col(id_col).alias("ref_id"), "shingle"))
    sz_n = sh_n.groupBy("new_id").agg(F.count("*").alias("n_a"))
    sz_r = sh_r.groupBy("ref_id").agg(F.count("*").alias("n_b"))
    common = (sh_n.join(sh_r, on="shingle")
              .groupBy("new_id", "ref_id")
              .agg(F.count("*").alias("n_common")))
    return (common.join(sz_n, "new_id").join(sz_r, "ref_id")
            .withColumn("jaccard", F.col("n_common").cast("double")
                        / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
            .filter(F.col("jaccard") >= threshold)
            .select("new_id", "ref_id",
                    F.round("jaccard", 6).alias("jaccard")))


def _rare_first_sets(df: DataFrame, *, n: int, threshold: float,
                     text_col: str, id_col: str) -> DataFrame:
    """Per doc: distinct shingles sorted rarest-first under the global
    corpus frequency order (ties by shingle), plus the prefix length
    ``|d| − ⌈τ·|d|⌉ + 1`` the pigeonhole bound needs.  Shared by the
    prefix-filtered Jaccard and containment joins."""
    sh = shingles(df, n=n, text_col=text_col, id_col=id_col)
    freq = sh.groupBy("shingle").agg(F.count("*").alias("__f"))
    ranked = (sh.join(freq, on="shingle")
              .groupBy(id_col)
              .agg(F.sort_array(F.collect_list(
                  F.struct(F.col("__f"), F.col("shingle")))).alias("__s")))
    return ranked.select(
        F.col(id_col),
        F.transform("__s", lambda x: x["shingle"]).alias("__sh"),
        (F.size("__s") - F.ceil(F.lit(float(threshold)) * F.size("__s"))
         + 1).cast("int").alias("__plen"))


def containment_pairs_prefix(df: DataFrame, *, n: int = 5,
                             threshold: float = 0.9,
                             text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """EXACT directed CONTAINMENT pairs: ``(id_a, id_b, containment)``
    with ``|A∩B| / |A| ≥ τ`` and ``id_a ≠ id_b`` — the asymmetric
    near-dup relation (quotation, excerpting, subset-boilerplate) that
    symmetric Jaccard misses: a tweet quoted inside a long article has
    containment 1.0 but Jaccard ≈ 0.

    Prefix filtering applies on the CONTAINED side only: if
    ``|A∩B| ≥ τ·|A|`` then B must hit one of the first
    ``|A| − ⌈τ·|A|⌉ + 1`` rare-first shingles of A (pigeonhole); the
    container side B is indexed in full.  A size filter
    ``|B| ≥ ⌈τ·|A|⌉`` prunes candidates before the exact verify.

    Scale notes (100 TB): the B-side posting list is the full inverted
    index, so hot boilerplate shingles create heavy join keys — the
    A-side prefix (rare shingles by construction) is what keeps the
    candidate count near the true-pair count.  For corpora where even
    that is too hot, cap posting-list length and fall back to
    MinHash-containment; this operator is the exact path.
    """
    ranked = _rare_first_sets(df, n=n, threshold=threshold,
                              text_col=text_col, id_col=id_col)
    prefix_a = ranked.select(
        F.col(id_col).alias("id_a"),
        F.explode(F.expr("slice(__sh, 1, __plen)")).alias("shingle"))
    full_b = ranked.select(
        F.col(id_col).alias("id_b"), F.explode("__sh").alias("shingle"))
    cand = (prefix_a.join(full_b, on="shingle")
            .filter(F.col("id_a") != F.col("id_b"))
            .select("id_a", "id_b").distinct())
    va = ranked.select(F.col(id_col).alias("id_a"),
                       F.col("__sh").alias("__sa"))
    vb = ranked.select(F.col(id_col).alias("id_b"),
                       F.col("__sh").alias("__sb"))
    inter = F.size(F.array_intersect("__sa", "__sb"))
    return (cand.join(va, on="id_a").join(vb, on="id_b")
            .filter(F.size("__sb") >= F.ceil(
                F.lit(float(threshold)) * F.size("__sa")))
            .withColumn("containment",
                        inter.cast("double") / F.size("__sa"))
            .filter(F.col("containment") >= threshold)
            .select("id_a", "id_b",
                    F.round("containment", 6).alias("containment")))


def jaccard_pairs_prefix(df: DataFrame, *, n: int = 5,
                         threshold: float = 0.5, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """EXACT shingle-set Jaccard pairs via PREFIX FILTERING (the
    PPJoin/AllPairs family — Chaudhuri et al. 2006, Xiao et al. 2008,
    public): same output as the all-pairs join, but candidates come
    only from pairs that share a shingle in their rare-first prefix.

    For sets under a COMMON total order, two sets with Jaccard ≥ τ must
    overlap within the first ``|d| − ⌈τ·|d|⌉ + 1`` elements of each
    (pigeonhole), so equi-joining on prefix shingles loses nothing;
    exact verification then computes the true Jaccard on the candidate
    pairs.  Ordering rare-shingles-first (global frequency asc) makes
    prefixes join on the LEAST common keys — the candidate count
    collapses while remaining exact, unlike MinHash-LSH whose recall
    is probabilistic.

    Returns ``(id_a, id_b, jaccard)`` — identical to the O(n²) oracle.

    Scale notes (100 TB): shingle frequencies are one map-side-combined
    groupBy; the rare-first sort is per-doc (``sort_array``, no global
    window); the candidate join is keyed on prefix shingles (rare by
    construction — hot boilerplate shingles never enter prefixes of
    large docs); verification touches candidates only, carrying the two
    shingle arrays per candidate pair.
    """
    ranked = _rare_first_sets(df, n=n, threshold=threshold,
                              text_col=text_col, id_col=id_col)
    prefix = ranked.select(
        F.col(id_col),
        F.explode(F.expr("slice(__sh, 1, __plen)")).alias("shingle"))
    cand = (prefix.alias("a").join(prefix.alias("b"), on="shingle")
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())
    va = ranked.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sa"))
    vb = ranked.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sb"))
    inter = F.size(F.array_intersect("__sa", "__sb"))
    union = F.size(F.array_union("__sa", "__sb"))
    return (cand.join(va, on="id_a").join(vb, on="id_b")
            .withColumn("jaccard", inter.cast("double") / union)
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path)
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)
_SENTINEL = np.iinfo(np.int64).max  # signature of a zero-shingle doc


def _shingle_hash_segments(texts: np.ndarray, n: int):
    """Distinct uint64 word-n-gram shingle hashes for a whole batch as one
    flat segmented array: returns ``(flat, starts, counts)`` where doc i's
    hashes are ``flat[starts[i]:starts[i]+counts[i]]``.

    Fully vectorized — no per-doc loop anywhere: one chained-iterator token
    flatten, shifted pandas str concat for shingles, one
    ``pandas.util.hash_array`` call (deterministic 64-bit, cython), and the
    per-doc distinct is a single lexsort + adjacent-unique mask.  NULL texts
    become empty token lists (round-1 crashed on them: Series.str.split
    yields NaN scalars that break np.concatenate).
    """
    from itertools import chain

    m = len(texts)
    empty = np.empty(0, dtype=np.uint64)
    zeros = np.zeros(m, dtype=np.int64)
    if m == 0:
        return empty, zeros, zeros
    split = pd.Series(texts, dtype=object).fillna("").str.lower().str.split()
    tok_counts = split.str.len().to_numpy(dtype=np.int64)
    total = int(tok_counts.sum())
    if total < n:
        return empty, zeros, zeros
    flat_tok = pd.Series(
        np.fromiter(chain.from_iterable(split), dtype=object, count=total),
        dtype=object)
    # shingle at flat position i spans tokens i..i+n-1 (cross-doc spans
    # masked below via the doc-id-per-token array)
    n_pos = total - n + 1
    sh = flat_tok.iloc[:n_pos].reset_index(drop=True)
    for k in range(1, n):
        sh = sh + " " + flat_tok.iloc[k: n_pos + k].reset_index(drop=True)
    # categorize=False: the default categorize=True factorizes through a
    # NUL-terminated C-string hash table, so shingles differing only past
    # an embedded '\x00' (real web text contains them) collide into one
    # category and steal each other's hash — found by the hypothesis
    # property suite.  Per-element siphash values are identical either way.
    hashes = pd.util.hash_array(sh.to_numpy(dtype=object),
                                categorize=False)  # uint64
    doc_of_tok = np.repeat(np.arange(m, dtype=np.int64), tok_counts)
    valid = doc_of_tok[:n_pos] == doc_of_tok[n - 1: n - 1 + n_pos]
    doc_v = doc_of_tok[:n_pos][valid]
    hash_v = hashes[valid]
    if not len(hash_v):
        return empty, zeros, zeros
    order = np.lexsort((hash_v, doc_v))
    doc_s, hash_s = doc_v[order], hash_v[order]
    keep = np.empty(len(doc_s), dtype=bool)
    keep[0] = True
    keep[1:] = (doc_s[1:] != doc_s[:-1]) | (hash_s[1:] != hash_s[:-1])
    flat = hash_s[keep]
    counts = np.bincount(doc_s[keep], minlength=m)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return flat, starts, counts


def minhash_signatures(df: DataFrame, *, n: int = 3, num_perm: int = 128,
                       seed: int = 42, text_col: str = "text",
                       id_col: str = "doc_id",
                       with_hashes: bool = False) -> DataFrame:
    """(id, sig array<long>[num_perm]) MinHash signatures.

    Permutations h_i(x) = (a_i·x + b_i) mod p (p = 2^61-1), min over the
    doc's shingle-hash set — the classic Broder construction.  The whole
    Arrow batch is one flat segmented hash array; each perm-block computes
    its affine map over the full array once and segment-mins it with
    ``np.minimum.reduceat`` — zero per-document Python (round-1's per-doc
    loop was 37% of the driver bench).  Perms are processed in blocks of 16
    to bound the (block × total_shingles) temporary.

    ``with_hashes=True`` additionally emits the doc's distinct shingle-hash
    set (array<long>) so a downstream exact-Jaccard verify can reuse this
    pass instead of re-shingling the corpus.

    Docs with zero shingles (< n tokens, empty, NULL) get the _SENTINEL
    signature; LSH banding must exclude them (they'd all collide).
    """
    rng = np.random.default_rng(seed)
    A = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    B = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)

    fields = [
        T.StructField(id_col, T.LongType()),
        T.StructField("sig", T.ArrayType(T.LongType())),
    ]
    if with_hashes:
        fields.append(T.StructField("hashes", T.ArrayType(T.LongType())))
    schema = T.StructType(fields)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = len(pdf)
            flat, starts, counts = _shingle_hash_segments(
                pdf[text_col].to_numpy(), n)
            sig = np.full((m, num_perm), _SENTINEL, dtype=np.int64)
            nonempty = counts > 0
            if flat.size:
                x = flat % _MERSENNE
                starts_ne = starts[nonempty]
                for lo in range(0, num_perm, 16):
                    ab = A[lo:lo + 16, None]
                    bb = B[lo:lo + 16, None]
                    v = (ab * x[None, :] + bb) % _MERSENNE
                    sig[nonempty, lo:lo + v.shape[0]] = np.minimum.reduceat(
                        v, starts_ne, axis=1).T.astype(np.int64)
            out = {id_col: pdf[id_col].to_numpy(), "sig": list(sig)}
            if with_hashes:
                signed = flat.astype(np.int64)
                hs: list = [None] * m
                for j in np.flatnonzero(nonempty):
                    hs[j] = signed[starts[j]: starts[j] + counts[j]]
                for j in np.flatnonzero(~nonempty):
                    hs[j] = signed[:0]
                out["hashes"] = hs
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(gen, schema=schema)


# Signatures persisted by prior minhash_lsh_pairs calls.  The returned
# DataFrame is lazy, so the caller has no natural point to unpersist;
# instead each new call releases the previous call's cache (ADVICE r2:
# without this, every clean_corpus(near_dup=True) pinned executor
# storage for the session lifetime).  release_cached() frees explicitly.
_PERSISTED_SIGS: list[DataFrame] = []


def release_cached() -> None:
    """Unpersist signature frames cached by earlier minhash_lsh_pairs
    calls.  Safe to call any time after the returned DataFrame has been
    fully materialized (collected/written)."""
    while _PERSISTED_SIGS:
        cached = _PERSISTED_SIGS.pop()
        try:
            cached.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped


def minhash_lsh_pairs(df: DataFrame, *, n: int = 3, num_perm: int = 128,
                      bands: int = 32, threshold: float = 0.5, seed: int = 42,
                      text_col: str = "text", id_col: str = "doc_id",
                      verify_exact: bool = True) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH.

    rows-per-band r = num_perm // bands; a pair collides in ≥1 band with
    prob 1-(1-j^r)^bands (≈0.99 at j=0.5 with 128/32).  Candidates are
    then verified: ``verify_exact`` recomputes true n-gram Jaccard on
    just the candidate pairs (cheap — candidates ≪ all pairs).
    """
    r = num_perm // bands
    sigs = minhash_signatures(df, n=n, num_perm=num_perm, seed=seed,
                              text_col=text_col, id_col=id_col,
                              with_hashes=verify_exact)
    if verify_exact:
        # One shingling pass feeds BOTH candidate generation and the exact
        # verify (round 1 re-shingled the whole corpus for verify — 2× the
        # Python-kernel work and a string-keyed shuffle; hash keys are 8B).
        release_cached()  # free the previous invocation's signatures
        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
        _PERSISTED_SIGS.append(sigs)
    # Zero-shingle docs share the sentinel signature → every one of them
    # collides in every band; drop them up front (no near-dup semantics
    # for empty docs anyway).
    live = sigs.filter(F.element_at("sig", 1) != F.lit(_SENTINEL))
    band_cols = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.xxhash64(F.slice(F.col("sig"), b * r + 1, r)),
        )
    )
    buckets = live.select(F.col(id_col), band_cols.alias("band", "bh"))
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(b, on=["band", "bh"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    if not verify_exact:
        return cand
    # Exact Jaccard over the distinct shingle-HASH sets (identical to
    # string-shingle Jaccard modulo 64-bit collisions): explode the reused
    # hash arrays, count per-pair intersections over candidates only.
    sh = live.select(F.col(id_col), F.explode("hashes").alias("h"))
    sizes = live.select(F.col(id_col), F.size("hashes").alias("n_sh"))
    sha = sh.select(F.col(id_col).alias("id_a"), "h")
    shb = sh.select(F.col(id_col).alias("id_b"), "h")
    common = (
        cand.join(sha, "id_a").join(shb, ["id_b", "h"])
        .groupBy("id_a", "id_b").agg(F.count("*").alias("n_common"))
    )
    return (
        common
        .join(sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .withColumn("jaccard", F.col("n_common").cast("double")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def exact_dup_against(new: DataFrame, ref: DataFrame, *,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Incremental exact dedup: flag every NEW doc whose text already
    exists verbatim in the REFERENCE corpus (the per-crawl-increment
    setting — dedup tonight's crawl against the corpus you already
    have, without re-deduping the corpus).

    Returns ``(id, dup_of_ref)`` for every new doc.

    Scale notes (100 TB reference × small increment): one semi join
    keyed on md5(text) — 16-byte keys, map-side distinct on the
    reference side; when the increment is the small side Spark/AQE
    broadcasts it, so the reference never shuffles."""
    nh = new.select(F.col(id_col),
                    F.md5(F.col(text_col).cast("binary")).alias("__h"))
    rh = ref.select(
        F.md5(F.col(text_col).cast("binary")).alias("__h")).distinct()
    hit = (nh.join(rh, on="__h", how="left_semi")
           .select(id_col).withColumn("dup_of_ref", F.lit(True)))
    return (new.select(id_col).join(hit, on=id_col, how="left")
            .select(F.col(id_col),
                    F.coalesce("dup_of_ref", F.lit(False))
                     .alias("dup_of_ref")))


def minhash_lsh_pairs_against(new: DataFrame, ref: DataFrame, *,
                              n: int = 3, num_perm: int = 128,
                              bands: int = 32, threshold: float = 0.5,
                              seed: int = 42, text_col: str = "text",
                              id_col: str = "doc_id",
                              verify_exact: bool = True) -> DataFrame:
    """Cross-corpus near-dup pairs: MinHash + banded LSH of the NEW
    increment against the REFERENCE corpus (same permutations — the
    shared ``seed`` — so band hashes collide across the two frames
    exactly as they would inside one).  Returns ``(new_id, ref_id[,
    jaccard])``; both id spaces are kept distinct, no ordering filter.

    Scale notes: identical shuffle census to minhash_lsh_pairs (band,
    band_hash 8-byte keys), but the join is new×ref instead of self —
    at 10^12 reference docs the banded index of the reference is the
    thing you PERSIST between increments; candidates stay ∝ colliding
    pairs, verify touches candidates only."""
    r = num_perm // bands
    band_expr = F.posexplode(F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(F.slice(F.col("sig"), b * r + 1, r))))

    def prep(frame, out_id):
        sigs = minhash_signatures(frame, n=n, num_perm=num_perm, seed=seed,
                                  text_col=text_col, id_col=id_col,
                                  with_hashes=verify_exact)
        live = sigs.filter(F.element_at("sig", 1) != F.lit(_SENTINEL))
        buckets = live.select(F.col(id_col).alias(out_id),
                              band_expr.alias("band", "bh"))
        return live, buckets

    live_n, bk_n = prep(new, "new_id")
    live_r, bk_r = prep(ref, "ref_id")
    cand = (bk_n.join(bk_r, on=["band", "bh"])
            .select("new_id", "ref_id").distinct())
    if not verify_exact:
        return cand
    sh_n = live_n.select(F.col(id_col).alias("new_id"),
                         F.explode("hashes").alias("h"))
    sh_r = live_r.select(F.col(id_col).alias("ref_id"),
                         F.explode("hashes").alias("h"))
    sz_n = live_n.select(F.col(id_col).alias("new_id"),
                         F.size("hashes").alias("n_a"))
    sz_r = live_r.select(F.col(id_col).alias("ref_id"),
                         F.size("hashes").alias("n_b"))
    common = (cand.join(sh_n, "new_id").join(sh_r, ["ref_id", "h"])
              .groupBy("new_id", "ref_id")
              .agg(F.count("*").alias("n_common")))
    return (common.join(sz_n, "new_id").join(sz_r, "ref_id")
            .withColumn("jaccard", F.col("n_common").cast("double")
                        / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
            .filter(F.col("jaccard") >= threshold)
            .select("new_id", "ref_id",
                    F.round("jaccard", 6).alias("jaccard")))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
            ngram: int = 2) -> DataFrame:
    """(id, simhash long): 64-bit Charikar SimHash over word-``ngram``
    hashes — sum of ±1 per bit weighted by feature, sign → bit.  All
    bit math is a vectorized numpy unpack per Arrow batch."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("simhash", T.LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            m = len(pdf)
            flat, starts, counts = _shingle_hash_segments(
                pdf[text_col].to_numpy(), ngram)
            # zero-shingle docs get NULL, not 0: at corpus scale millions
            # of empty docs sharing simhash 0 would pair O(m²) in the
            # banded join (same failure class as the MinHash sentinel)
            out = np.zeros(m, dtype=np.int64)
            nonempty = counts > 0
            if flat.size:
                # (F, 64) bit matrix for the whole batch, then one
                # segment-sum per doc — votes = 2·ones − count, no per-doc
                # loop (round-1 looped per document here).
                bits = ((flat[:, None] >> shifts[None, :])
                        & np.uint64(1)).astype(np.int64)
                ones = np.add.reduceat(bits, starts[nonempty], axis=0)
                votes = 2 * ones - counts[nonempty, None]
                words = (np.where(votes > 0, np.uint64(1), np.uint64(0))
                         << shifts[None, :]).sum(axis=1)
                out[nonempty] = words.astype(np.int64)
            col = pd.Series(out, dtype="Int64")
            col[~nonempty] = None
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "simhash": col})

    return df.select(id_col, text_col).mapInPandas(gen, schema=schema)


def simhash_pairs(df: DataFrame, *, max_hamming: int = 3, ngram: int = 2,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split 64 bits into max_hamming+1 chunks — any
    pair within distance k agrees exactly on ≥1 chunk, so candidates
    come from equi-joins on chunk values (shuffle on uniform chunk keys,
    no quadratic blowup), then exact popcount-verify."""
    k = max_hamming + 1
    width = 64 // k
    mask = (1 << width) - 1
    # zero-shingle docs carry NULL simhash — exclude them (no near-dup
    # semantics for empty docs; see the simhash() NULL note)
    sh = (simhash(df, text_col=text_col, id_col=id_col, ngram=ngram)
          .filter(F.col("simhash").isNotNull()))
    chunks = F.posexplode(F.array(*[
        F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(F.lit(mask))
        for i in range(k)
    ]))
    bk = sh.select(F.col(id_col), F.col("simhash"), chunks.alias("chunk", "cv"))
    a, b = bk.alias("a"), bk.alias("b")
    cand = (
        a.join(b, on=["chunk", "cv"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# duplicate clustering: pairs -> connected components -> one keeper/cluster
# ---------------------------------------------------------------------------

def connected_components(pairs: DataFrame, a_col: str = "id_a",
                         b_col: str = "id_b", *, max_iters: int = 50) -> DataFrame:
    """Label every node of the near-dup pair graph with its connected
    component (``(node, component)``; component = min node id reachable).

    Pair finders (exact/Jaccard/MinHash/SimHash) emit EDGES; production
    dedup needs CLUSTERS — "keep one document per duplicate class" is
    only well-defined on the transitive closure (a-b, b-c must collapse
    to ONE keeper even though (a, c) was never emitted as a pair).

    Algorithm: min-label propagation with pointer jumping.  Per round,
    every node takes the minimum label in its closed neighborhood (one
    edge-label join + groupBy), then labels are compressed one hop
    through the label table itself (``label = label(label)``, a
    self-join) — chains of length d collapse in O(log d) rounds instead
    of O(d).  Labels decrease monotonically and are bounded below, so
    the fixpoint (0 changes) is guaranteed; ``max_iters`` is a backstop.

    Scale notes (100 TB): every step is a key-partitioned join/groupBy
    on (node) or (label) — no collect, no driver-side graph.  Duplicate
    components in web corpora are shallow (near-clique mirror sets), so
    the loop converges in 2-4 rounds; each round's result is
    ``localCheckpoint``-ed to truncate the iterative lineage (the
    standard GraphFrames/GraphX practice — on a cluster, lost-executor
    recovery restarts the loop from the last checkpoint).
    """
    u, v = F.col("__u"), F.col("__v")
    e1 = pairs.select(F.col(a_col).alias("__u"), F.col(b_col).alias("__v"))
    e2 = pairs.select(F.col(b_col).alias("__u"), F.col(a_col).alias("__v"))
    edges = e1.union(e2).distinct().persist(StorageLevel.MEMORY_AND_DISK)

    # init: label(n) = min(n, min neighbor)  (symmetric edges cover all nodes)
    labels = (edges.groupBy("__u").agg(F.least(F.min("__v"), u).alias("__l"))
              .withColumnRenamed("__u", "__n"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iters):
        # 1) neighborhood min: smallest label among my neighbors
        nbr = (edges.join(labels, edges["__v"] == labels["__n"])
               .groupBy("__u").agg(F.min("__l").alias("__nl")))
        stepped = (labels.join(nbr, labels["__n"] == nbr["__u"], "left")
                   .select(F.col("__n"),
                           F.col("__l").alias("__old"),
                           F.least(F.col("__l"),
                                   F.coalesce(F.col("__nl"), F.col("__l"))).alias("__l1")))
        # 2) pointer jump: follow my label's own label one hop
        ptr = stepped.select(F.col("__n").alias("__p"), F.col("__l1").alias("__pl"))
        jumped = (stepped.join(ptr, stepped["__l1"] == ptr["__p"], "left")
                  .select(F.col("__n"), F.col("__old"),
                          F.least(F.col("__l1"),
                                  F.coalesce(F.col("__pl"), F.col("__l1"))).alias("__l")))
        jumped = jumped.localCheckpoint(eager=True)
        changed = jumped.filter(F.col("__l") != F.col("__old")).limit(1).count()
        labels = jumped.select("__n", "__l")
        if changed == 0:
            break
    edges.unpersist(blocking=False)
    return labels.select(F.col("__n").alias("node"), F.col("__l").alias("component"))


def dup_clusters(pairs: DataFrame, a_col: str = "id_a",
                 b_col: str = "id_b") -> DataFrame:
    """Cluster summary over the transitive closure of ``pairs``:
    one row per duplicate class — ``(cluster_id, n_docs, max_doc_id)``
    with ``cluster_id`` = the class keeper (minimum doc id, the same
    keep-lowest policy as exact_dedup)."""
    cc = connected_components(pairs, a_col, b_col)
    return (cc.groupBy(F.col("component").alias("cluster_id"))
            .agg(F.count("*").alias("n_docs"),
                 F.max("node").alias("max_doc_id")))
