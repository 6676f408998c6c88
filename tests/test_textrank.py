"""TextRank keywords (operators/textstats.textrank_keywords).

The reference replays the exact integer power iteration (micro ranks,
floor division) over the same co-occurrence graph, so equality is
exact.
"""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.textstats import textrank_keywords

pytestmark = pytest.mark.usefixtures("spark")


def _ref_textrank(texts, window=2, iters=3, damping=85):
    edges = set()
    for t in texts:
        w = t.strip().lower().split()
        for d in range(1, window):
            for i in range(len(w) - d):
                a, b = w[i], w[i + d]
                if a != b:
                    edges.add((a, b))
                    edges.add((b, a))
    nodes = {x for e in edges for x in e}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {n: 1_000_000 for n in nodes}
    base = (100 - damping) * 1_000_000 // 100
    for _ in range(iters):
        c = {n: 0 for n in nodes}
        for s, d_ in edges:
            c[d_] += (r[s] * damping) // (100 * outdeg[s])
        r = {n: base + c[n] for n in nodes}
    return r


def _run(spark, texts, **kw):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    out = textrank_keywords(df, **kw).collect()
    return {r["token"]: r["rank_micro"] for r in out}


def test_reference_equality_window2(spark):
    texts = ["the quick brown fox jumps over the lazy dog",
             "the quick red fox runs past the sleepy cat",
             "brown dog meets red cat near the fox"]
    got = _run(spark, texts, window=2, iters=3)
    want = _ref_textrank(texts, window=2, iters=3)
    assert got == want


def test_reference_equality_window3(spark):
    texts = ["alpha beta gamma delta", "beta gamma epsilon alpha"]
    got = _run(spark, texts, window=3, iters=2)
    want = _ref_textrank(texts, window=3, iters=2)
    assert got == want


def test_connector_outranks_repeater(spark):
    # 'hub' connects 4 distinct tokens; 'e'/'f' repeat one edge —
    # TextRank must reward distinct contexts over raw co-occurrence
    texts = ["hub a", "hub b", "hub c", "hub d", "e f", "e f", "e f"]
    got = _run(spark, texts)
    assert got["hub"] > got["e"]
    assert got["hub"] > got["f"]


def test_self_pairs_dropped_and_case_folded(spark):
    texts = ["Word word OTHER"]
    got = _run(spark, texts)
    # "Word word" lowercases to a self-pair → dropped; only edge is
    # word—other
    assert set(got) == {"word", "other"}
    assert got["word"] == got["other"]


def test_empty_and_null_docs_ignored(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "   ")],
        "doc_id long, text string")
    out = textrank_keywords(df).collect()
    assert {r["token"] for r in out} == {"a", "b"}
