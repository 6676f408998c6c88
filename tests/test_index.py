"""Inverted-index construction vs plain-Python reference + phrase AND."""

from __future__ import annotations

from collections import Counter

import pytest

from ultraviolet_spark.operators.index import (
    build_postings,
    phrase_hits,
    token_stats,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown cat"),
        (3, "quick quick quick"),
        (4, "  "),          # blank -> dropped
        (5, "Brown FOX"),   # case folding
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_match_python(corpus):
    got = {(r["token"], r["doc_id"]): (r["tf"], list(r["positions"]))
           for r in build_postings(corpus).collect()}
    ref = {}
    for doc_id, text in corpus.collect():
        ws = text.strip().lower().split()
        if not ws:
            continue
        c = Counter(ws)
        for tok, tf in c.items():
            pos = [i + 1 for i, w in enumerate(ws) if w == tok]
            ref[(tok, doc_id)] = (tf, pos)
    assert got == ref


def test_token_stats(corpus):
    got = {r["token"]: (r["df"], r["cf"])
           for r in token_stats(build_postings(corpus)).collect()}
    assert got["quick"] == (3, 5)
    assert got["the"] == (2, 3)
    assert got["fox"] == (2, 2)


def test_phrase_hits_consecutive_only(corpus):
    p = build_postings(corpus)
    assert {r["doc_id"] for r in
            phrase_hits(p, ["quick", "brown"]).collect()} == {1, 2}
    # 'brown quick' never appears consecutively
    assert phrase_hits(p, ["brown", "quick"]).count() == 0
    # trigram spanning the repeated word
    assert {r["doc_id"] for r in
            phrase_hits(p, ["the", "quick", "brown"]).collect()} == {1, 2}
    assert {r["doc_id"] for r in
            phrase_hits(p, ["quick", "quick"]).collect()} == {3}
