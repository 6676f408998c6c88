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


# ---------------------------------------------------- random projection

def _py_rp(emb, out_dim=16, micro=1_000_000):
    import hashlib
    import math
    in_dim = len(emb)
    out = []
    for k in range(out_dim):
        acc = 0
        for j, x in enumerate(emb):
            s = 1 if int(hashlib.md5(f"{j}_{k}".encode())
                         .hexdigest()[0], 16) < 8 else -1
            acc += s * math.floor(float(x) * micro)
        out.append(acc)
    return out


def test_rp_matches_python_reference(spark):
    from ultraviolet_spark.operators.vectorize import random_projection
    vecs = [(1, [0.5, -0.25, 0.125, 1.0]), (2, [0.0, 0.1, -0.9, 3.3])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: list(r["proj_micro"])
           for r in random_projection(df, in_dim=4, out_dim=6).collect()}
    import numpy as np
    for vid, emb in vecs:
        want = _py_rp(np.array(emb, dtype=np.float32), out_dim=6)
        assert got[vid] == want


def test_rp_preserves_distances_approximately(spark):
    # JL property: squared distance in projected space / out_dim is an
    # unbiased estimate of the original.  iid-gaussian points make ALL
    # pairwise distances nearly equal (correlation would be noise), so
    # scale each point differently to spread the distance distribution,
    # then bound every pair's ratio and the mean ratio.
    import numpy as np
    from ultraviolet_spark.operators.vectorize import random_projection
    rng = np.random.RandomState(7)
    X = (rng.randn(10, 64) * np.arange(1, 11)[:, None]).astype(np.float32)
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(10)],
        "vec_id long, embedding array<float>")
    P = {r["vec_id"]: np.array(r["proj_micro"], dtype=np.float64) / 1e6
         for r in random_projection(df, in_dim=64, out_dim=32).collect()}
    ratios = []
    for i in range(10):
        for j in range(i + 1, 10):
            d_orig = np.sum((X[i] - X[j]) ** 2)
            d_proj = np.sum((P[i] - P[j]) ** 2) / 32
            ratios.append(d_proj / d_orig)
    ratios = np.array(ratios)
    # k=32 → sd of the ratio ≈ sqrt(2/32) = 0.25; generous bounds
    assert 0.8 < ratios.mean() < 1.2, ratios.mean()
    assert ratios.min() > 0.25 and ratios.max() < 2.5, (
        ratios.min(), ratios.max())


def test_rp_short_vector_contributes_present_entries(spark):
    from ultraviolet_spark.operators.vectorize import random_projection
    df = spark.createDataFrame([(1, [1.0, 2.0])],
                               "vec_id long, embedding array<float>")
    got = random_projection(df, in_dim=4, out_dim=3).collect()[0]
    want = _py_rp([1.0, 2.0, 0.0, 0.0], out_dim=3)
    assert list(got["proj_micro"]) == want
