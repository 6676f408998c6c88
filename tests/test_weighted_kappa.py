"""Quadratic-weighted kappa (operators/evalmetrics.weighted_kappa)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.evalmetrics import weighted_kappa

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, pairs):
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs],
                                 "a long, b long")


def _ref(pairs, quad=True):
    from collections import Counter

    n = len(pairs)
    cells = Counter(pairs)
    ri = Counter(a for a, _ in pairs)
    cj = Counter(b for _, b in pairs)
    wo = we = 0
    for a in ri:
        for b in cj:
            w = (a - b) ** 2 if quad else abs(a - b)
            wo += w * cells.get((a, b), 0)
            we += w * ri[a] * cj[b]
    return round(1 - n * wo / we, 6) if we else None


def test_matches_sequential_reference(spark):
    pairs = [((i * 3) % 5, ((i * 3) % 5 + (i % 3) - 1) % 5)
             for i in range(60)]
    got = weighted_kappa(_mk(spark, pairs), a_col="a",
                         b_col="b").head()
    assert got["kappa_w"] == _ref(pairs)


def test_ordinal_grading_near_vs_far_disagreement(spark):
    # rater B one step high (clipped) vs fully reversed: quadratic
    # weights grade the near-miss far higher, the reversal negative
    near = [(i % 5, min(i % 5 + 1, 4)) for i in range(50)]
    far = [(i % 5, 4 - i % 5) for i in range(50)]
    k_near = weighted_kappa(_mk(spark, near), a_col="a",
                            b_col="b").head()["kappa_w"]
    k_far = weighted_kappa(_mk(spark, far), a_col="a",
                           b_col="b").head()["kappa_w"]
    assert k_near > 0.5 > k_far
    assert k_far < 0
    # perfect agreement is exactly 1
    perf = [(i % 5, i % 5) for i in range(40)]
    assert weighted_kappa(_mk(spark, perf), a_col="a",
                          b_col="b").head()["kappa_w"] == 1.0


def test_single_category_null_and_linear_weights(spark):
    one = [(2, 2)] * 8
    assert weighted_kappa(_mk(spark, one), a_col="a",
                          b_col="b").head()["kappa_w"] is None
    pairs = [(0, 1), (1, 0), (2, 2), (3, 4), (4, 3)] * 4
    got = weighted_kappa(_mk(spark, pairs), a_col="a", b_col="b",
                         weight="linear").head()
    assert got["kappa_w"] == _ref(pairs, quad=False)
