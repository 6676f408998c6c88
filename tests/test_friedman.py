"""Friedman test + Kendall's W (operators/stats.friedman_test)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import friedman_test

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    k = len(rows[0])
    schema = ", ".join(f"x{j} double" for j in range(k))
    return spark.createDataFrame(
        [tuple(float(v) for v in r) for r in rows], schema)


def _ref(rows):
    k = len(rows[0])
    n = len(rows)
    a2 = 0
    R = [0] * k
    for r in rows:
        ms = [round(v * 1e6) for v in r]
        for j in range(k):
            below = sum(1 for l in range(k) if ms[l] < ms[j])
            tied = sum(1 for l in range(k) if ms[l] == ms[j])
            a = 2 * below + tied + 1
            R[j] += a
            a2 += a * a
    num = (k - 1) * sum((Rj - n * (k + 1)) ** 2 for Rj in R)
    den = a2 - n * k * (k + 1) ** 2
    if den == 0:
        return None, None
    chi2 = round(num / den, 6)
    w = round(num / den / (n * (k - 1)), 6)
    return chi2, w


def test_matches_sequential_reference(spark):
    rows = [((i % 4) + 0.5 * (i % 3), (i % 5), (i % 3) * 1.5)
            for i in range(40)]
    got = friedman_test(_mk(spark, rows), cols=["x0", "x1", "x2"]).head()
    chi2, w = _ref(rows)
    assert (got["chi2"], got["w"]) == (chi2, w)


def test_consistent_ordering_w_one(spark):
    # every block ranks treatments identically (with block offsets!):
    # perfect concordance → W = 1, chi2 = n(k-1)
    rows = [(10.0 * i + 1, 10.0 * i + 2, 10.0 * i + 3)
            for i in range(20)]
    got = friedman_test(_mk(spark, rows), cols=["x0", "x1", "x2"]).head()
    assert got["w"] == 1.0
    assert got["chi2"] == 40.0           # n(k-1) = 20*2


def test_block_offsets_cancel(spark):
    # the SAME within-block pattern with wildly different offsets
    # gives the identical statistic — the point of ranking per block
    pat = [(1.0, 3.0, 2.0), (2.0, 1.0, 3.0), (1.0, 2.0, 3.0)] * 5
    plain = friedman_test(_mk(spark, pat),
                          cols=["x0", "x1", "x2"]).head()
    shifted = [(a + 1000 * i, b + 1000 * i, c + 1000 * i)
               for i, (a, b, c) in enumerate(pat)]
    offs = friedman_test(_mk(spark, shifted),
                         cols=["x0", "x1", "x2"]).head()
    assert (plain["chi2"], plain["w"]) == (offs["chi2"], offs["w"])


def test_all_tied_blocks_null(spark):
    rows = [(2.0, 2.0, 2.0)] * 8
    got = friedman_test(_mk(spark, rows), cols=["x0", "x1", "x2"]).head()
    assert got["chi2"] is None and got["w"] is None
