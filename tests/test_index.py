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


def test_rrf_fuse_literal(spark):
    from ultraviolet_spark.operators.index import rrf_fuse

    a = spark.createDataFrame([(1, 10.0), (2, 5.0), (3, 1.0)],
                              "doc_id long, score double")
    b = spark.createDataFrame([(3, 9.0), (1, 8.0)],
                              "doc_id long, score double")
    got = {r.doc_id: (r.n_lists, r.rrf_nano) for r in
           rrf_fuse([a, b], k=60).collect()}
    # doc1: rank 1 in a, rank 2 in b → 1e9//61 + 1e9//62
    assert got[1] == (2, 10**9 // 61 + 10**9 // 62)
    # doc3: rank 3 in a, rank 1 in b
    assert got[3] == (2, 10**9 // 63 + 10**9 // 61)
    # doc2 appears once
    assert got[2] == (1, 10**9 // 62)
    # fused order: doc1 > doc3 > doc2
    order = [r.doc_id for r in rrf_fuse([a, b]).collect()]
    assert order == [1, 3, 2]


def test_rrf_fuse_score_tie_and_by(spark):
    from ultraviolet_spark.operators.index import rrf_fuse

    # tied scores rank by doc_id asc, per query partition
    a = spark.createDataFrame(
        [("q1", 1, 5.0), ("q1", 2, 5.0), ("q2", 7, 1.0)],
        "query string, doc_id long, score double")
    b = spark.createDataFrame(
        [("q1", 2, 3.0), ("q2", 7, 2.0)],
        "query string, doc_id long, score double")
    got = {(r.query, r.doc_id): r.rrf_nano for r in
           rrf_fuse([a, b], by="query").collect()}
    assert got[("q1", 1)] == 10**9 // 61            # tie → rank 1
    assert got[("q1", 2)] == 10**9 // 62 + 10**9 // 61
    assert got[("q2", 7)] == 2 * (10**9 // 61)      # rank 1 both lists
