"""Suffix-array prefix doubling vs a plain-Python reference."""
from __future__ import annotations

import pytest

from ultraviolet_spark.operators.suffix import (repeated_spans,
                                                token_suffix_array)


def _ref_ranks(texts: list[str], max_tokens: int) -> dict[tuple[int, int], int]:
    """Brute force: dense lexicographic rank of every truncated token
    suffix across all docs (doc ids are list indices)."""
    sufs = {}
    for i, t in enumerate(texts):
        toks = t.strip().lower().split()[:max_tokens]
        for p in range(len(toks)):
            sufs[(i, p + 1)] = tuple(toks[p:])
    order = sorted(set(sufs.values()))
    rank = {s: r + 1 for r, s in enumerate(order)}
    return {k: rank[v] for k, v in sufs.items()}


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox naps",          # shared 4-token prefix with doc 0
    "over the lazy dog",                 # exact suffix of doc 0
    "dog",                               # exact 1-token suffix
    "zebra",                             # unique
    "the the the the the",               # heavy self-repetition / ties
]


def _run(spark, texts, max_tokens=32, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {(r["doc_id"], r["pos"]): r["sa_rank"]
           for r in token_suffix_array(df, max_tokens=max_tokens,
                                       **kw).collect()}
    return got


def test_matches_reference(spark):
    got = _run(spark, TEXTS)
    assert got == _ref_ranks(TEXTS, 32)


def test_truncation(spark):
    texts = ["a b c d e f", "a b c d e g"]
    got = _run(spark, texts, max_tokens=4)  # truncated: both docs identical
    ref = _ref_ranks(texts, 4)
    assert got == ref
    # truncated suffixes of the two docs coincide pairwise
    for p in range(1, 5):
        assert got[(0, p)] == got[(1, p)]


def test_all_distinct_early_exit(spark):
    texts = ["alpha beta", "gamma delta epsilon"]
    got = _run(spark, texts)
    assert got == _ref_ranks(texts, 32)
    assert len(set(got.values())) == len(got)  # all unique


def test_single_partition_and_many(spark):
    # result is partitioning-independent
    a = _run(spark, TEXTS, partitions=1)
    b = _run(spark, TEXTS, partitions=7)
    assert a == b == _ref_ranks(TEXTS, 32)


def test_repeated_spans_reference(spark):
    texts = TEXTS
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = repeated_spans(df, span=4, max_tokens=32).collect()
    # brute force: slice of up to 4 tokens at each position
    slices: dict[tuple[int, int], tuple] = {}
    for i, t in enumerate(texts):
        toks = t.strip().lower().split()[:32]
        for p in range(len(toks)):
            slices[(i, p + 1)] = tuple(toks[p:p + 4])
    from collections import Counter

    counts = Counter(slices.values())
    expect = {k for k, v in slices.items() if counts[v] > 1}
    got = {(r["doc_id"], r["pos"]) for r in rows}
    assert got == expect
    for r in rows:
        assert r["n_occurrences"] == counts[slices[(r["doc_id"], r["pos"])]]
    # span_class groups ⇔ identical slices
    by_class: dict[int, set] = {}
    for r in rows:
        by_class.setdefault(r["span_class"], set()).add(
            slices[(r["doc_id"], r["pos"])])
    assert all(len(v) == 1 for v in by_class.values())


def test_empty_and_blank_docs(spark):
    texts = ["", "   ", "only doc"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {(r["doc_id"], r["pos"]): r["sa_rank"]
           for r in token_suffix_array(df).collect()}
    assert set(k[0] for k in got) == {2}
    assert got == {(2, 1): 2, (2, 2): 1}  # "doc" < "only doc"? no: "doc" < "only"


@pytest.mark.parametrize("span", [1, 2, 8])
def test_span_powers(spark, span):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    rows = repeated_spans(df, span=span).collect()
    assert all(r["n_occurrences"] >= 2 for r in rows)
