"""Chunked-bitmap postings (operators.index bitmap_*): exact equality
with plain Python set arithmetic, chunk-boundary and sparse-chunk
edges, sign-bit safety, partitioning invariance, and the one-exchange
plan contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ultraviolet_spark.operators.index import (
    bitmap_bool_counts,
    bitmap_docs,
    bitmap_postings,
)

# docs straddle the 62/63 chunk boundary on purpose; token c is
# chunk-disjoint from b's high chunks (exercises the full-outer
# COALESCE(bits, 0) path in bool counts)
ROWS = [
    ("a", 0), ("a", 62), ("a", 63), ("a", 126),
    ("b", 62), ("b", 63), ("b", 200),
    ("c", 5), ("c", 200),
    # duplicate (token, doc) rows: bit_or must be idempotent (the
    # operator deliberately has NO distinct pre-pass)
    ("a", 62), ("c", 5),
]


def _pairs_df(spark, parts=4):
    return spark.createDataFrame(
        ROWS, "token string, doc_id long").repartition(parts)


def _py_sets():
    out = {}
    for t, i in ROWS:
        out.setdefault(t, set()).add(i)
    return out


def test_roundtrip_matches_python_sets(spark):
    bm = bitmap_postings(_pairs_df(spark))
    got = {(r.token, r.doc_id) for r in bitmap_docs(bm).collect()}
    want = {(t, i) for t, s in _py_sets().items() for i in s}
    assert got == want


def test_words_are_nonnegative_and_chunked_right(spark):
    rows = bitmap_postings(_pairs_df(spark)).collect()
    assert all(r.bits > 0 for r in rows)          # sign bit never set
    by = {(r.token, r.chunk): r.bits for r in rows}
    # doc 62 → chunk 0 bit 62; doc 63 → chunk 1 bit 0
    assert by[("a", 0)] & (1 << 62)
    assert by[("a", 1)] & 1
    # duplicate rows did not double-set / corrupt anything
    assert by[("c", 0)] == 1 << 5


def test_bool_counts_match_set_arithmetic(spark):
    bm = bitmap_postings(_pairs_df(spark))
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "w1 string, w2 string")
    got = {(r.w1, r.w2): r for r in bitmap_bool_counts(bm, pairs).collect()}
    sets = _py_sets()
    for w1, w2 in [("a", "b"), ("a", "c"), ("b", "c")]:
        s1, s2 = sets[w1], sets[w2]
        r = got[(w1, w2)]
        assert (r.df1, r.df2) == (len(s1), len(s2))
        assert r.n_both == len(s1 & s2)
        assert r.n_w1_not_w2 == len(s1 - s2)
        assert r.n_either == len(s1 | s2)
        assert r.jaccard == round(len(s1 & s2) / len(s1 | s2), 6)


def test_partitioning_invariance(spark):
    one = sorted(map(tuple, bitmap_postings(_pairs_df(spark, 1)).collect()))
    seven = sorted(map(tuple, bitmap_postings(_pairs_df(spark, 7)).collect()))
    assert one == seven


def test_negative_id_raises(spark):
    df = spark.createDataFrame([("x", -1)], "token string, doc_id long")
    with pytest.raises(Exception, match="negative doc id"):
        bitmap_postings(df).collect()


def test_width_validation():
    with pytest.raises(ValueError):
        bitmap_postings(None, width=0)
    with pytest.raises(ValueError):
        bitmap_postings(None, width=64)


def test_single_exchange_plan(spark):
    # the whole bitmap build is ONE map-side-combined shuffle — no
    # distinct pre-pass (bit_or is idempotent)
    df = _pairs_df(spark)
    plan = bitmap_postings(df)._sc._jvm.PythonSQLUtils.explainString(
        bitmap_postings(df)._jdf.queryExecution(), "formatted")
    # ") Exchange" counts tree nodes once (the formatted dump repeats
    # each node in the detail section)
    n_shuffles = plan.count(") Exchange")
    # repartition(4) in the fixture contributes one; the agg one more
    assert n_shuffles <= 2, plan


def test_narrow_width(spark):
    # width=1: degenerate one-doc-per-chunk bitmaps must still roundtrip
    bm = bitmap_postings(_pairs_df(spark), width=1)
    assert (bm.filter(F.col("bits") != 1).count()) == 0
    got = {(r.token, r.doc_id)
           for r in bitmap_docs(bm, width=1).collect()}
    want = {(t, i) for t, s in _py_sets().items() for i in s}
    assert got == want
