"""BPE: vectorized apply ≡ slow per-doc reference, training on a tiny
hand-computable corpus, overlap runs, partitioning invariance."""

from __future__ import annotations

import numpy as np

from ultraviolet_spark.operators.tokenize import (
    BASE_ID, bpe_apply, bpe_train)


def _ref_bpe(text: str, merges) -> list[int]:
    """Obvious per-document reference: greedy left-to-right, one merge
    fully applied before the next."""
    toks = [ord(c) for c in text]
    for i, (a, b) in enumerate(merges):
        out, j = [], 0
        while j < len(toks):
            if j + 1 < len(toks) and toks[j] == a and toks[j + 1] == b:
                out.append(BASE_ID + i)
                j += 2
            else:
                out.append(toks[j])
                j += 1
        toks = out
    return toks


MERGES = [
    (ord("e"), ord(" ")),
    (ord("t"), ord("h")),
    (BASE_ID + 1, ord("e")),      # chained: 'th' + 'e' → 'the'
    (ord(" "), ord(" ")),         # a == b: overlap runs
    (ord("o"), ord("n")),
]

DOCS = [
    "the theme of the month",
    "on and on and on",
    "aaaa    bbbb  e e e ",
    "",
    "e",
    "中文 the 文本 e ",
    "ththththe",
]


def test_apply_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], list(r["tokens"]))
           for r in bpe_apply(df, MERGES).collect()}
    for i, t in enumerate(DOCS):
        want = _ref_bpe(t, MERGES)
        assert got[i] == (len(want), want), f"doc {i}: {t!r}"


def test_apply_random_fuzz_vs_reference(spark):
    rng = np.random.RandomState(7)
    alphabet = list("ethon ab中")
    docs = ["".join(rng.choice(alphabet, size=rng.randint(0, 60)))
            for _ in range(40)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got = {r["doc_id"]: list(r["tokens"])
           for r in bpe_apply(df, MERGES).collect()}
    for i, t in enumerate(docs):
        assert got[i] == _ref_bpe(t, MERGES)


def test_partitioning_and_batch_invariance(spark):
    df1 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)],
        "doc_id long, text string").repartition(1)
    df5 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)],
        "doc_id long, text string").repartition(5)
    a = sorted((r["doc_id"], r["n_tokens"], tuple(r["tokens"]))
               for r in bpe_apply(df1, MERGES).collect())
    b = sorted((r["doc_id"], r["n_tokens"], tuple(r["tokens"]))
               for r in bpe_apply(df5, MERGES).collect())
    assert a == b


def test_train_tiny_corpus(spark):
    df = spark.createDataFrame(
        [(0, "ababab")], "doc_id long, text string")
    merges = bpe_train(df, n_merges=2)
    # 'ab' dominates (3 > 2 'ba'); then the merged token pairs with itself
    assert merges == [(97, 98), (BASE_ID, BASE_ID)]


def test_train_then_apply_compresses(spark):
    docs = [(i, "the quick brown fox jumps over the lazy dog " * 3)
            for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    m0 = bpe_apply(df, []).agg({"n_tokens": "sum"}).head()[0]
    merges = bpe_train(df, n_merges=16)
    assert len(merges) == 16
    m16 = bpe_apply(df, merges).agg({"n_tokens": "sum"}).head()[0]
    assert m16 < m0
    # every merge strictly helps on its training corpus
    m8 = bpe_apply(df, merges[:8]).agg({"n_tokens": "sum"}).head()[0]
    assert m16 < m8 < m0
