"""Two-sample Cramer-von Mises (operators/stats.cvm_two_sample)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import cvm_two_sample

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, a_vals, b_vals):
    rows = [("a", float(v)) for v in a_vals] + \
           [("b", float(v)) for v in b_vals]
    return spark.createDataFrame(rows, "grp string, v double")


def _ref(a_vals, b_vals):
    am = sorted(round(v * 1e6) for v in a_vals)
    bm = sorted(round(v * 1e6) for v in b_vals)
    na, nb = len(am), len(bm)
    pooled = sorted(am + bm)
    tnum = 0
    for x in pooled:
        ca = sum(1 for v in am if v <= x)
        cb = sum(1 for v in bm if v <= x)
        tnum += (ca * nb - cb * na) ** 2
    t = tnum / (na * nb * (na + nb) ** 2)
    return float(tnum), round(t, 6)


def test_matches_sequential_reference(spark):
    a = [1.0 + 0.3 * ((i * 7) % 9) for i in range(17)]
    b = [1.4 + 0.25 * ((i * 5) % 11) for i in range(23)]
    got = cvm_two_sample(_mk(spark, a, b), value_col="v",
                         group_col="grp", group_a="a",
                         group_b="b").head()
    tnum, t = _ref(a, b)
    assert got["t_num"] == tnum and got["t"] == t


def test_integral_vs_sup_sensitivity(spark):
    # a uniform small shift over the WHOLE support: every CDF gap is
    # moderate (KS sup small) but CvM accumulates all of them; the
    # identical distribution scores ~0
    a = [float(i) for i in range(100)]
    b_shift = [v + 0.6 for v in a]
    b_same = list(a)
    t_shift = cvm_two_sample(_mk(spark, a, b_shift), value_col="v",
                             group_col="grp", group_a="a",
                             group_b="b").head()["t"]
    t_same = cvm_two_sample(_mk(spark, a, b_same), value_col="v",
                            group_col="grp", group_a="a",
                            group_b="b").head()["t"]
    assert t_shift > 5 * max(t_same, 1e-9)


def test_empty_group_null(spark):
    got = cvm_two_sample(_mk(spark, [1.0, 2.0], []), value_col="v",
                         group_col="grp", group_a="a",
                         group_b="b").head()
    assert got["t"] is None and got["n_b"] == 0
