"""Spearman rank correlation (operators/stats.spearman_rho)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import spearman_rho

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, pts):
    return spark.createDataFrame([(float(x), float(y)) for x, y in pts],
                                 "x double, y double")


def _ref_rho(pts):
    from collections import Counter
    xm = [round(x * 1e6) for x, _ in pts]
    ym = [round(y * 1e6) for _, y in pts]

    def ar2(vals):
        cnt = Counter(vals)
        order = sorted(cnt)
        below = {}
        run = 0
        for v in order:
            below[v] = run
            run += cnt[v]
        return [2 * below[v] + cnt[v] + 1 for v in vals]

    a, b = ar2(xm), ar2(ym)
    n = len(a)
    sa, sb = sum(a), sum(b)
    saa = sum(v * v for v in a)
    sbb = sum(v * v for v in b)
    sab = sum(u * v for u, v in zip(a, b))
    va = n * saa - sa * sa
    vb = n * sbb - sb * sb
    if va <= 0 or vb <= 0:
        return None
    return round((n * sab - sa * sb) / (va * vb) ** 0.5, 6)


def test_reference_equality_with_ties(spark):
    pts = [((i * 7) % 5, ((i * 3) % 5) + (i % 2) * 0.5)
           for i in range(60)]
    got = spearman_rho(_mk(spark, pts), x_col="x", y_col="y").head()
    assert got["rho"] == _ref_rho(pts)
    assert got["n"] == 60


def test_monotone_nonlinear_is_one(spark):
    pts = [(i, i ** 3) for i in range(1, 30)]
    got = spearman_rho(_mk(spark, pts), x_col="x", y_col="y").head()
    assert got["rho"] == 1.0
    got = spearman_rho(_mk(spark, [(x, -y) for x, y in pts]),
                       x_col="x", y_col="y").head()
    assert got["rho"] == -1.0


def test_outlier_moves_one_rank_not_one_magnitude(spark):
    base = [(i, i + 0.1) for i in range(20)]
    wild = base + [(21, 1e6)]          # absurd y, but still max rank
    got = spearman_rho(_mk(spark, wild), x_col="x", y_col="y").head()
    assert got["rho"] == 1.0           # Pearson would be dragged < 1


def test_constant_variable_null(spark):
    got = spearman_rho(_mk(spark, [(1, 5), (2, 5), (3, 5)]),
                       x_col="x", y_col="y").head()
    assert got["rho"] is None


def test_partitioning_invariance(spark):
    pts = [(((i * 13) % 17), ((i * 5) % 11)) for i in range(100)]
    df = _mk(spark, pts)
    a = spearman_rho(df.coalesce(1), x_col="x", y_col="y").head()
    b = spearman_rho(df.repartition(7), x_col="x", y_col="y").head()
    assert tuple(a) == tuple(b)
