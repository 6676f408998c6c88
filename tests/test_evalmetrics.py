"""cohens_kappa / roc_auc vs plain-Python references."""
from __future__ import annotations

import math
import random
from collections import Counter

from ultraviolet_spark.operators.evalmetrics import cohens_kappa, roc_auc


def _ref_kappa(pairs):
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ra, cb = Counter(a for a, _ in pairs), Counter(b for _, b in pairs)
    pe = sum(ra[k] * cb.get(k, 0) for k in ra)
    num, den = n * agree - pe, n * n - pe
    return num / den if den else None


def _ref_auc(rows):
    # midrank AUC
    scores = sorted(set(s for s, _ in rows))
    rank = {}
    start = 1
    for s in scores:
        cnt = sum(1 for x, _ in rows if x == s)
        rank[s] = start + (cnt - 1) / 2
        start += cnt
    pos = [s for s, p in rows if p]
    neg = [s for s, p in rows if not p]
    r = sum(rank[s] for s in pos)
    return (r - len(pos) * (len(pos) + 1) / 2) / (len(pos) * len(neg))


def test_kappa_perfect_and_random(spark):
    perfect = [(c, c) for c in "aabbccdd"]
    df = spark.createDataFrame(perfect, "x string, y string")
    row = cohens_kappa(df, col_a="x", col_b="y").collect()[0]
    assert row["kappa"] == 1.0 and row["n_agree"] == 8

    rng = random.Random(3)
    pairs = [(rng.choice("abc"), rng.choice("abc")) for _ in range(200)]
    df = spark.createDataFrame(pairs, "x string, y string")
    row = cohens_kappa(df, col_a="x", col_b="y").collect()[0]
    assert math.isclose(row["kappa"], _ref_kappa(pairs), abs_tol=1e-12)
    assert abs(row["kappa"]) < 0.25  # independent labelings ⇒ κ ≈ 0


def test_kappa_degenerate_constant(spark):
    df = spark.createDataFrame([("a", "a")] * 5, "x string, y string")
    row = cohens_kappa(df, col_a="x", col_b="y").collect()[0]
    assert row["kappa"] is None  # pe = 1 ⇒ undefined


def test_auc_reference_with_ties(spark):
    rng = random.Random(5)
    rows = [(rng.randrange(20), rng.random() < 0.4) for _ in range(300)]
    df = spark.createDataFrame([(s, int(p)) for s, p in rows],
                               "score long, is_pos int")
    got = roc_auc(df, score_col="score", label_col="is_pos").collect()[0]
    assert math.isclose(got["auc"], _ref_auc(rows), abs_tol=1e-12)


def test_auc_separable_and_degenerate(spark):
    rows = [(i, i >= 50) for i in range(100)]
    df = spark.createDataFrame([(s, int(p)) for s, p in rows],
                               "score long, is_pos int")
    assert roc_auc(df, score_col="score",
                   label_col="is_pos").collect()[0]["auc"] == 1.0
    df1 = spark.createDataFrame([(1, 1), (2, 1)], "score long, is_pos int")
    assert roc_auc(df1, score_col="score",
                   label_col="is_pos").collect()[0]["auc"] is None
