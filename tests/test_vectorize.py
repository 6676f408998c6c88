"""Feature-hashing vectorizer: cross-checked against a pure-Python
md5 reference, plus shape/edge-case behavior."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest


def _ref(texts: dict[int, str], dim: int, n: int = 1):
    """Independent reference: same md5 bucket + sign derivation."""
    out = {}
    for i, t in texts.items():
        toks = t.lower().strip().split()
        grams = (toks if n == 1 else
                 [" ".join(toks[k:k + n]) for k in range(len(toks) - n + 1)])
        tf, sg = Counter(), Counter()
        for g in grams:
            h = hashlib.md5(g.encode()).hexdigest()
            idx = int(h[:8], 16) % dim
            tf[idx] += 1
            sg[idx] += 1 if int(h[8], 16) < 8 else -1
        out[i] = {k: (tf[k], sg[k]) for k in tf}
    return out


def test_hashed_features_matches_reference(spark):
    from ultraviolet_spark.operators.vectorize import hashed_features

    texts = {
        1: "the quick brown fox the quick",
        2: "lone",
        3: "   ",            # whitespace-only -> zero rows
        4: "a b c d e f g h i j " * 5,
    }
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    for dim in (8, 1024):
        got = {}
        for r in hashed_features(df, dim=dim).collect():
            got.setdefault(r["doc_id"], {})[r["feature_idx"]] = (
                r["tf"], r["signed_tf"])
        want = {i: v for i, v in _ref(texts, dim).items() if v}
        assert got == want, dim


def test_hashed_features_ngrams(spark):
    from ultraviolet_spark.operators.vectorize import hashed_features

    texts = {1: "a b c d", 2: "a"}
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    got = {}
    for r in hashed_features(df, dim=64, n=2).collect():
        got.setdefault(r["doc_id"], {})[r["feature_idx"]] = (
            r["tf"], r["signed_tf"])
    want = {i: v for i, v in _ref(texts, 64, n=2).items() if v}
    assert got == want
    assert 2 not in got   # single-token doc has no 2-grams


def test_small_dim_forces_collisions(spark, sf_dir):
    """At dim=8 distinct tokens MUST share buckets, and the signed sum
    must differ from tf somewhere (opposite signs colliding) — the
    property the hashing trick exists for."""
    from pyspark.sql import functions as F

    from ultraviolet_spark.operators.vectorize import hashed_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = hashed_features(docs, dim=8)
    assert out.filter(F.col("feature_idx") >= 8).count() == 0
    assert out.filter(F.abs(F.col("signed_tf")) != F.col("tf")).count() > 0


def test_hashed_vector_consistent_with_sparse(spark):
    from ultraviolet_spark.operators.vectorize import (
        hashed_features,
        hashed_vector,
    )

    df = spark.createDataFrame(
        [(1, "x y z x"), (2, "y")], "doc_id long, text string")
    sparse = {}
    for r in hashed_features(df, dim=32).collect():
        sparse.setdefault(r["doc_id"], {})[r["feature_idx"]] = r["signed_tf"]
    dense = {r["doc_id"]: dict(r["features"]) for r in
             hashed_vector(df, dim=32).collect()}
    assert dense == sparse


def test_bad_dim_rejected(spark):
    from ultraviolet_spark.operators.vectorize import hashed_features

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        hashed_features(df, dim=0)
