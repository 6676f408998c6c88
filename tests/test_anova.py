"""One-way ANOVA F + η² (operators/stats.anova_oneway)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import anova_oneway

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    return spark.createDataFrame(
        [(str(g), float(v)) for g, v in rows], "g string, v double")


def _ref(rows):
    """Sequential reference of the exact snapped pipeline."""
    from collections import defaultdict
    groups = defaultdict(list)
    for g, v in rows:
        groups[g].append(round(v * 1e6))
    sa = sss = 0
    stot = ntot = 0
    for vals in groups.values():
        n, s = len(vals), sum(vals)
        ss = sum(x * x for x in vals)
        sa += round(float(s) * float(s) / float(n) / 1e12 * 1e6)
        sss += round(float(ss) / 1e12 * 1e6)
        stot += s
        ntot += n
    a_tot = round(float(stot) * float(stot) / float(ntot) / 1e12 * 1e6)
    k = len(groups)
    ssb, ssw, sst = float(sa - a_tot), float(sss - sa), float(sss - a_tot)
    f = None
    if k >= 2 and ntot > k and ssw > 0:
        f = round((ssb / (k - 1.0)) / (ssw / (ntot - k)), 6)
    eta2 = round(ssb / sst, 6) if sst > 0 else None
    return f, eta2, round(ssb / 1e6, 6), round(ssw / 1e6, 6)


def test_reference_equality_three_groups(spark):
    rows = [("a", 1 + (i % 5) * 0.3) for i in range(20)]
    rows += [("b", 2 + (i % 7) * 0.4) for i in range(30)]
    rows += [("c", 1.5 + (i % 3) * 0.2) for i in range(25)]
    got = anova_oneway(_mk(spark, rows), value_col="v",
                       group_col="g").head()
    f, eta2, ssb, ssw = _ref(rows)
    assert (got["f"], got["eta2"]) == (f, eta2)
    assert (got["ss_between"], got["ss_within"]) == (ssb, ssw)
    assert (got["k"], got["n"]) == (3, 75)


def test_identical_group_means_f_zero(spark):
    # same values in every group → SSB = 0 → F = 0, η² = 0
    vals = [1.0, 2.0, 3.0]
    rows = [(g, v) for g in "abc" for v in vals]
    got = anova_oneway(_mk(spark, rows), value_col="v",
                       group_col="g").head()
    assert got["f"] == 0.0 and got["eta2"] == 0.0


def test_strong_separation_dominates(spark):
    # means 1 vs 100 with tiny within-noise → η² ≈ 1, F huge
    rows = [("a", 1.0 + 0.001 * i) for i in range(10)]
    rows += [("b", 100.0 + 0.001 * i) for i in range(10)]
    got = anova_oneway(_mk(spark, rows), value_col="v",
                       group_col="g").head()
    assert got["eta2"] > 0.999
    assert got["f"] > 1e5


def test_degenerate_cases_null(spark):
    # single group → no between variance to test → NULL F
    got = anova_oneway(_mk(spark, [("a", 1.0), ("a", 2.0)]),
                       value_col="v", group_col="g").head()
    assert got["f"] is None
    # all values constant → SSW = 0 and SST = 0 → NULL F, NULL η²
    rows = [("a", 5.0)] * 3 + [("b", 5.0)] * 3
    got = anova_oneway(_mk(spark, rows), value_col="v",
                       group_col="g").head()
    assert got["f"] is None and got["eta2"] is None


def test_two_groups_f_equals_student_t_squared(spark):
    # classic identity: one-way ANOVA with k=2 gives F = t² for the
    # POOLED-variance t (not Welch's) — checked via the pooled t
    # recomputed from the same exact moments
    import math
    a = [1.0, 2.0, 3.0, 4.0]
    b = [2.5, 3.5, 4.5, 5.5, 6.5]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    got = anova_oneway(_mk(spark, rows), value_col="v",
                       group_col="g").head()
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    s2a = sum((x - ma) ** 2 for x in a) / (na - 1)
    s2b = sum((x - mb) ** 2 for x in b) / (nb - 1)
    sp2 = ((na - 1) * s2a + (nb - 1) * s2b) / (na + nb - 2)
    t = (ma - mb) / math.sqrt(sp2 * (1 / na + 1 / nb))
    assert got["f"] == pytest.approx(t * t, rel=1e-4)
