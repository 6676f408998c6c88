"""One-sample KS uniformity (operators/stats.ks_uniform_test)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import ks_uniform_test

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "v long")


def _ref(vals, lo, hi):
    from collections import Counter

    W = hi - lo
    n = len(vals)
    cnt = Counter(vals)
    cum = 0
    dnum = 0
    for v in sorted(cnt):
        m = cnt[v]
        cum += m
        dnum = max(dnum, cum * W - n * (v - lo),
                   n * (v - lo) - (cum - m) * W)
    return dnum, round(dnum / (n * W), 6)


def test_matches_sequential_reference(spark):
    vals = [(i * 37) % 100 for i in range(60)] + [5, 5, 99]
    got = ks_uniform_test(_mk(spark, vals), value_col="v",
                          lo=0, hi=100).head()
    dnum, d = _ref(vals, 0, 100)
    assert got["d_num"] == dnum and got["d"] == d


def test_uniform_grid_small_clumped_large(spark):
    grid = list(range(0, 1000))              # perfect uniform grid
    clump = [10] * 500 + [990] * 500          # two spikes
    d_grid = ks_uniform_test(_mk(spark, grid), value_col="v",
                             lo=0, hi=1000).head()["d"]
    d_clump = ks_uniform_test(_mk(spark, clump), value_col="v",
                              lo=0, hi=1000).head()["d"]
    assert d_grid <= 0.002
    assert d_clump > 0.45


def test_out_of_domain_raises_the_sup(spark):
    # values beyond hi honestly blow the statistic up instead of
    # being clipped: F_n jumps above the reference line's cap
    inside = ks_uniform_test(_mk(spark, [100, 200, 300]), value_col="v",
                             lo=0, hi=400).head()["d"]
    outside = ks_uniform_test(_mk(spark, [100, 200, 900]), value_col="v",
                              lo=0, hi=400).head()["d"]
    assert outside > 1.0 >= inside
