"""Brown-Forsythe equal-variance test
(operators/stats.brown_forsythe)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import brown_forsythe

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    return spark.createDataFrame(
        [(str(g), float(v)) for g, v in rows], "g string, v double")


def _ref(rows):
    """Sequential reference: doubled medians, then the q301 snapped
    ANOVA pipeline on |x - median|."""
    from collections import defaultdict
    per = defaultdict(list)
    for g, v in rows:
        per[g].append(round(v * 1e6))
    sa = sss = stot = ntot = 0
    for vals in per.values():
        vals.sort()
        n = len(vals)
        m2 = vals[(n + 1) // 2 - 1] + vals[(n + 2) // 2 - 1]
        zs = [round(abs(2 * x - m2) / 2e6 * 1e6) for x in vals]
        s = sum(zs)
        ss = sum(z * z for z in zs)
        sa += round(float(s) * float(s) / float(n) / 1e12 * 1e6)
        sss += round(float(ss) / 1e12 * 1e6)
        stot += s
        ntot += n
    a_tot = round(float(stot) * float(stot) / float(ntot) / 1e12 * 1e6)
    k = len(per)
    ssb, ssw = float(sa - a_tot), float(sss - sa)
    f = None
    if k >= 2 and ntot > k and ssw > 0:
        f = round((ssb / (k - 1.0)) / (ssw / (ntot - k)), 6)
    return f


def test_matches_sequential_reference(spark):
    rows = [("a", 1 + (i % 9) * 0.3) for i in range(21)]
    rows += [("b", 5 + (i % 5) * 1.7) for i in range(18)]
    rows += [("c", 2 + (i % 4) * 0.1) for i in range(12)]
    got = brown_forsythe(_mk(spark, rows), value_col="v",
                         group_col="g").head()
    assert got["f"] == _ref(rows)
    assert got["k"] == 3 and got["n"] == 51


def test_unequal_spread_fires_equal_means_do_not(spark):
    # same MEANS, wildly different spreads → the variance test fires
    rows = [("tight", 10 + 0.01 * (i % 5)) for i in range(30)]
    rows += [("wide", 10 + 3.0 * ((i % 5) - 2)) for i in range(30)]
    got = brown_forsythe(_mk(spark, rows), value_col="v",
                         group_col="g").head()
    assert got["f"] > 50
    # identical distributions → F ≈ 0
    rows2 = [("p", float(i % 7)) for i in range(35)]
    rows2 += [("q", float(i % 7)) for i in range(35)]
    got2 = brown_forsythe(_mk(spark, rows2), value_col="v",
                          group_col="g").head()
    assert got2["f"] == 0.0


def test_outlier_does_not_poison_center(spark):
    # Levene's MEAN center is dragged by the outlier it should flag;
    # the median center stays put, so the outlier lands in the
    # deviations (where it belongs) rather than shifting everyone's
    rows = [("a", float(v)) for v in [1, 2, 3, 4, 5] * 6]
    rows += [("b", float(v)) for v in [1, 2, 3, 4, 5] * 6]
    rows.append(("b", 1000.0))
    got = brown_forsythe(_mk(spark, rows), value_col="v",
                         group_col="g").head()
    assert got["f"] == _ref(rows)
    assert got["f"] is not None
