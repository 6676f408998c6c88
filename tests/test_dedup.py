"""Deduplication operators: exact classes, n-gram Jaccard, MinHash+LSH
recall/precision, SimHash near-dups — cross-checked against independent
brute-force pandas/numpy oracles on the driver testdata."""

from __future__ import annotations

import itertools

import pandas as pd
import pytest

from ultraviolet_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_pd(docs):
    return docs.select("doc_id", "text").toPandas()


def _shingle_sets(pdf: pd.DataFrame, n: int) -> dict[int, frozenset]:
    out = {}
    for _, row in pdf.iterrows():
        toks = row["text"].lower().split()
        out[row["doc_id"]] = frozenset(
            " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))
    return out


def _brute_pairs(sets: dict, threshold: float):
    pairs = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            pairs[(a, b)] = j
    return pairs


def test_exact_dedup_removes_duplicates(spark, docs):
    # inject 5 exact-text duplicates under fresh doc_ids
    clones = docs.limit(5).withColumn("doc_id", docs.doc_id + 1_000_000)
    dup = docs.union(clones)
    kept = D.exact_dedup(dup)
    assert kept.count() == docs.count()
    # keeps exactly one row per distinct text
    assert kept.select("text").distinct().count() == kept.count()


def test_duplicate_classes_counts(spark, docs):
    dup = docs.union(docs.limit(5).withColumn("doc_id", docs.doc_id + 1_000_000))
    classes = D.duplicate_classes(dup).toPandas()
    assert (classes["n_copies"] > 1).sum() == 5
    assert classes["n_copies"].sum() == dup.count()


def test_ngram_jaccard_matches_bruteforce(docs, docs_pd):
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for _, r in D.ngram_jaccard_pairs(docs, n=3, threshold=0.4)
           .toPandas().iterrows()}
    want = _brute_pairs(_shingle_sets(docs_pd, 3), 0.4)
    assert set(got) == set(want)
    for k, j in want.items():
        assert got[k] == pytest.approx(j, abs=1e-6)


def test_minhash_lsh_recall_and_precision(docs, docs_pd):
    got = D.minhash_lsh_pairs(docs, n=3, num_perm=128, bands=32,
                              threshold=0.5).toPandas()
    want = _brute_pairs(_shingle_sets(docs_pd, 3), 0.5)
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    # exact-verify step ⇒ precision is 1.0 by construction
    assert got_pairs <= set(want)
    # banded LSH at (128, 32) catches ≥ 95% of true pairs ≥ 0.5
    if want:
        assert len(got_pairs) / len(want) >= 0.95


def test_simhash_identical_docs_collide(spark, docs):
    two = docs.limit(1)
    clone = two.withColumn("doc_id", two.doc_id + 1_000_000)
    pairs = D.simhash_pairs(two.union(clone), max_hamming=3).toPandas()
    assert len(pairs) == 1
    assert pairs["hamming"].iloc[0] == 0


def test_simhash_pairs_verified_hamming(docs):
    import numpy as np

    pairs = D.simhash_pairs(docs, max_hamming=3).toPandas()
    sh = D.simhash(docs).toPandas().set_index("doc_id")["simhash"]
    for _, r in pairs.iterrows():
        x = np.uint64(sh[r["id_a"]]) ^ np.uint64(sh[r["id_b"]])
        assert bin(int(x)).count("1") == r["hamming"] <= 3


def test_null_and_short_docs_no_crash_no_spurious_pairs(spark):
    """Round-2 regression (ADVICE r1): NULL texts crashed the shingle
    kernel, and zero-shingle docs shared a sentinel signature that made
    them all LSH-collide.  Null/empty/short docs must produce no
    signatures-driven pairs and no executor crash."""
    rows = [
        (1, None), (2, None), (3, ""), (4, "one"), (5, "two words only"),
        (6, "a genuine document with plenty of words to shingle properly"),
        (7, "a genuine document with plenty of words to shingle properly"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = D.minhash_lsh_pairs(df, n=3, threshold=0.5).toPandas()
    assert set(zip(pairs["id_a"], pairs["id_b"])) == {(6, 7)}

    cand = D.minhash_lsh_pairs(df, n=3, verify_exact=False).toPandas()
    # no sentinel-collision candidates among the 5 degenerate docs
    assert set(zip(cand["id_a"], cand["id_b"])) == {(6, 7)}

    sh = D.simhash(df).toPandas().set_index("doc_id")["simhash"]
    assert pd.isna(sh[1]) and pd.isna(sh[3])  # degenerate docs -> NULL
    assert sh[6] == sh[7]
    assert not pd.isna(sh[6])
    pairs = D.simhash_pairs(df, max_hamming=3).toPandas()
    # NULL-simhash docs must produce no pairs (scale: empty docs would
    # otherwise all collide at simhash 0)
    assert set(zip(pairs["id_a"], pairs["id_b"])) == {(6, 7)}


def test_shingle_segments_property_vs_naive():
    """Hypothesis: the flat segmented shingle-hash kernel equals a naive
    per-doc implementation on arbitrary unicode text (incl. None, empty,
    whitespace-only, repeated-token docs)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ultraviolet_spark.operators.dedup import _shingle_hash_segments

    def naive(texts, n):
        out = []
        for t in texts:
            toks = ("" if t is None else t).lower().split()
            sh = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
            # categorize=False also in the reference: the categorize path
            # collides strings at embedded NULs (see dedup.py comment)
            hs = pd.util.hash_array(np.array(sorted(sh), dtype=object),
                                    categorize=False)
            out.append(np.sort(hs))
        return out

    text = st.one_of(
        st.none(),
        st.text(alphabet=st.characters(codec="utf-8"), max_size=80),
        st.sampled_from(["", "   ", "a a a a a", "wörd wörd wörd",
                         "one two", "\t\n x \n y \n z \n"]),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(text, max_size=12), st.integers(1, 4))
    def check(texts, n):
        flat, starts, counts = _shingle_hash_segments(
            np.array(texts, dtype=object), n)
        want = naive(texts, n)
        assert len(counts) == len(texts) or not texts
        for i, w in enumerate(want):
            got = np.sort(flat[starts[i]:starts[i] + counts[i]])
            assert np.array_equal(got, w), (i, texts[i])

    check()


def test_minhash_recall_improves_with_bands(docs, docs_pd):
    """LSH parameter sweep: at fixed num_perm, more bands (shorter
    rows-per-band) must not lose candidate pairs at a given threshold —
    collision probability 1-(1-j^r)^b rises as r shrinks."""
    want = set(_brute_pairs(_shingle_sets(docs_pd, 3), 0.5))
    if not want:
        return
    recalls = []
    for bands in (8, 16, 32):
        got = D.minhash_lsh_pairs(docs, n=3, num_perm=128, bands=bands,
                                  threshold=0.5).toPandas()
        pairs = set(zip(got["id_a"], got["id_b"]))
        assert pairs <= want  # exact verify keeps precision at 1.0
        recalls.append(len(pairs) / len(want))
    assert recalls == sorted(recalls), recalls  # monotone non-decreasing
    assert recalls[-1] >= 0.95


# ---------------------------------------------------------------------------
# connected components / duplicate clustering
# ---------------------------------------------------------------------------

def _brute_components(edges):
    """Union-find oracle over an explicit edge list."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_long_chain_and_merges(spark):
    # a 12-node chain (stresses pointer jumping), a triangle that merges
    # two pair-clusters, and an isolated pair
    edges = ([(i, i + 1) for i in range(100, 112)]
             + [(7, 20), (20, 21), (21, 7), (3, 21)]
             + [(500, 400)])
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long")
    got = {r["node"]: r["component"]
           for r in D.connected_components(pairs).collect()}
    want = _brute_components(edges)
    assert got == want


def test_connected_components_randomized_vs_union_find(spark):
    import random
    rng = random.Random(42)
    nodes = list(range(200))
    edges = [(min(a, b), max(a, b))
             for a, b in (rng.sample(nodes, 2) for _ in range(150))]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"]
           for r in D.connected_components(pairs).collect()}
    assert got == _brute_components(edges)


def test_dup_clusters_summary(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    rows = {r["cluster_id"]: (r["n_docs"], r["max_doc_id"])
            for r in D.dup_clusters(pairs).collect()}
    assert rows == {1: (3, 3), 10: (2, 11)}


def test_jaccard_prefix_equals_allpairs(spark, sf_dir):
    """Prefix filtering is EXACT: output must equal the O(n²)
    shingle-join path at the same (n, τ)."""
    from ultraviolet_spark.operators.dedup import (
        jaccard_pairs_prefix,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
            ngram_jaccard_pairs(docs, n=5, threshold=0.5).collect()}
    got = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
           jaccard_pairs_prefix(docs, n=5, threshold=0.5).collect()}
    assert got == want
    assert got  # the corpus has near-dup pairs at this τ


def test_jaccard_prefix_prunes_candidates(spark, sf_dir):
    """The point of prefix filtering: candidate pairs ≪ pairs sharing
    ANY shingle (what the naive shingle equi-join generates)."""
    from pyspark.sql import functions as F

    from ultraviolet_spark.operators.dedup import shingles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = shingles(docs, n=5)
    freq = sh.groupBy("shingle").agg(F.count("*").alias("__f"))
    ranked = (sh.join(freq, on="shingle").groupBy("doc_id")
              .agg(F.sort_array(F.collect_list(
                  F.struct(F.col("__f"), F.col("shingle")))).alias("__s")))
    prefix = ranked.select(
        F.col("doc_id"),
        F.explode(F.expr(
            "slice(transform(__s, x -> x.shingle), 1,"
            " cast(size(__s) - ceil(0.5 * size(__s)) + 1 as int))"))
        .alias("shingle"))

    def n_pairs(frame):
        a, b = frame.alias("a"), frame.alias("b")
        return (a.join(b, on="shingle")
                .filter(F.col("a.doc_id") < F.col("b.doc_id"))
                .select("a.doc_id", "b.doc_id").distinct().count())

    from ultraviolet_spark.operators.dedup import jaccard_pairs_prefix

    naive = n_pairs(sh)
    pruned = n_pairs(prefix)
    true_pairs = jaccard_pairs_prefix(docs, n=5, threshold=0.5).count()
    # candidates must be a superset of the true pairs (exactness) and
    # strictly smaller than the naive any-shared-shingle join; on this
    # corpus the rare-first prefix eliminates EVERY false candidate
    # (measured 37 naive → 25 = the true pair count at both test SFs)
    assert true_pairs <= pruned < naive, (true_pairs, pruned, naive)
    assert pruned == true_pairs


def test_jaccard_prefix_boundary_pair_not_lost(spark):
    """A pair EXACTLY at the threshold must survive the prefix filter
    (the ⌈τ·|d|⌉ arithmetic is where off-by-ones would bite)."""
    from ultraviolet_spark.operators.dedup import (
        jaccard_pairs_prefix,
        ngram_jaccard_pairs,
    )

    # two docs sharing exactly half their 2-gram shingles
    rows = [(1, "a b c d e"), (2, "a b c x y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.2, 1 / 3, 0.34):
        want = {(r["id_a"], r["id_b"]) for r in
                ngram_jaccard_pairs(df, n=2, threshold=t).collect()}
        got = {(r["id_a"], r["id_b"]) for r in
               jaccard_pairs_prefix(df, n=2, threshold=t).collect()}
        assert got == want, t


def test_exact_dup_against_literal(spark):
    from ultraviolet_spark.operators.dedup import exact_dup_against

    ref = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, "alpha"), (11, "gamma"), (12, "beta"), (13, "ALPHA")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["dup_of_ref"] for r in
           exact_dup_against(new, ref).collect()}
    # byte-exact matching: case differs -> not a dup
    assert got == {10: True, 11: False, 12: True, 13: False}


def test_minhash_against_equals_self_join_cross_pairs(spark, sf_dir):
    """Same seed => identical signatures => the cross-corpus banded
    join must find EXACTLY the self-join's pairs that straddle the
    split (normalized for id order)."""
    from pyspark.sql import functions as F

    from ultraviolet_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_against,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 2 == 0)
    ref = docs.filter(F.col("doc_id") % 2 == 1)

    full = minhash_lsh_pairs(docs, threshold=0.5).collect()
    want = {(r["id_a"], r["id_b"], r["jaccard"]) for r in full
            if (r["id_a"] % 2 == 0) != (r["id_b"] % 2 == 0)}
    want = {(a if a % 2 == 0 else b, b if a % 2 == 0 else a, j)
            for a, b, j in want}

    got = {(r["new_id"], r["ref_id"], r["jaccard"]) for r in
           minhash_lsh_pairs_against(new, ref, threshold=0.5).collect()}
    assert got == want
    assert got  # the corpus has cross near-dups at this tau


def test_containment_prefix_equals_allpairs(spark, sf_dir):
    """Prefix-filtered containment is EXACT: must equal the O(n²)
    directed all-pairs computation at the same (n, τ)."""
    from ultraviolet_spark.operators.dedup import containment_pairs_prefix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pdf = docs.select("doc_id", "text").toPandas()
    sets = _shingle_sets(pdf[pdf["text"].str.strip().str.len() > 0], 5)
    sets = {k: v for k, v in sets.items() if v}
    tau = 0.9
    want = set()
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b:
                continue
            c = len(sa & sb) / len(sa)
            if c >= tau:
                want.add((a, b, round(c, 6)))
    got = {(r["id_a"], r["id_b"], r["containment"]) for r in
           containment_pairs_prefix(docs, n=5, threshold=tau).collect()}
    assert got == want
    assert got  # the corpus has containment pairs at this tau


def test_containment_catches_quotation_jaccard_misses(spark):
    """The operator's reason to exist: a short doc quoted verbatim
    inside a long one has containment 1.0 but tiny Jaccard."""
    from ultraviolet_spark.operators.dedup import (
        containment_pairs_prefix,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"w{i}" for i in range(200))
    rows = [(1, quote), (2, filler + " " + quote + " " + filler)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {(r["id_a"], r["id_b"]): r["containment"] for r in
           containment_pairs_prefix(df, n=3, threshold=0.9).collect()}
    # directed: the quote is contained in the article, not vice versa
    assert got == {(1, 2): 1.0}
    assert not ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()


def test_ngram_jaccard_against_matches_brute_force(spark):
    from itertools import product
    from ultraviolet_spark.operators.dedup import ngram_jaccard_pairs_against

    def sh(t):
        w = t.lower().split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    new_rows = [(1, "the quick brown fox jumps over the lazy dog"),
                (2, "completely different content here nothing shared"),
                (3, "short")]                       # <3 tokens: no shingles
    ref_rows = [(10, "the quick brown fox jumps over the lazy cat"),
                (11, "the quick brown fox jumps over the lazy dog"),
                (12, "unrelated reference text about other things entirely")]
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    got = {(r["new_id"], r["ref_id"]): r["jaccard"]
           for r in ngram_jaccard_pairs_against(
               new, ref, n=3, threshold=0.3).collect()}
    expect = {}
    for (ni, nt), (ri, rt) in product(new_rows, ref_rows):
        a, b = sh(nt), sh(rt)
        if not a or not b:
            continue
        j = len(a & b) / len(a | b)
        if j >= 0.3:
            expect[(ni, ri)] = round(j, 6)
    assert got == expect
    assert (1, 11) in got and got[(1, 11)] == 1.0   # exact dup across
    assert (1, 10) in got                           # near dup across
    assert all(k[0] != 2 for k in got)              # disjoint text: absent
