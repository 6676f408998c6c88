"""Welch's two-sample t-test + Cohen's d (operators/stats.welch_ttest)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.stats import welch_ttest

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    return spark.createDataFrame(
        [(str(g), float(v)) for g, v in rows], "g string, v double")


def _ref(rows):
    """Sequential reference of the exact micro-integer pipeline."""
    a = [round(v * 1e6) for g, v in rows if g == "a"]
    b = [round(v * 1e6) for g, v in rows if g == "b"]
    na, nb = float(len(a)), float(len(b))
    sa, sb = float(sum(a)), float(sum(b))
    saa = float(sum(x * x for x in a))
    sbb = float(sum(x * x for x in b))
    mean_a, mean_b = sa / na, sb / nb
    s2a = (na * saa - sa * sa) / (na * (na - 1.0))
    s2b = (nb * sbb - sb * sb) / (nb * (nb - 1.0))
    se2 = s2a / na + s2b / nb
    t = (mean_a - mean_b) / math.sqrt(se2)
    df = se2 * se2 / ((s2a / na) ** 2 / (na - 1.0)
                      + (s2b / nb) ** 2 / (nb - 1.0))
    pooled = ((na - 1.0) * s2a + (nb - 1.0) * s2b) / (na + nb - 2.0)
    d = (mean_a - mean_b) / math.sqrt(pooled)
    return round(t, 6), round(df, 6), round(d, 6)


def test_reference_equality(spark):
    # unequal variances AND unequal sizes — the case Student's pooled
    # t gets wrong and Welch exists for
    rows = [("a", 10 + 0.25 * ((i * 7) % 11)) for i in range(8)]
    rows += [("b", 9 + 2.5 * ((i * 5) % 13)) for i in range(40)]
    got = welch_ttest(_mk(spark, rows), value_col="v", group_col="g",
                      group_a="a", group_b="b").head()
    t, df, d = _ref(rows)
    assert (got["t"], got["df"], got["cohen_d"]) == (t, df, d)
    assert (got["na"], got["nb"]) == (8, 40)


def test_welch_df_between_min_and_pooled(spark):
    # Welch-Satterthwaite ν is bracketed by min(n)−1 and n_a+n_b−2
    rows = [("a", float(v)) for v in [1, 2, 3, 4, 100]]
    rows += [("b", float(v)) for v in [2, 2, 3, 3, 4, 4, 5, 5]]
    got = welch_ttest(_mk(spark, rows), value_col="v", group_col="g",
                      group_a="a", group_b="b").head()
    assert 4 - 1 <= got["df"] <= 5 + 8 - 2
    # heavily unequal variances pull ν far below pooled
    assert got["df"] < 6


def test_identical_groups_t_zero(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    rows = [("a", v) for v in vals] + [("b", v) for v in vals]
    got = welch_ttest(_mk(spark, rows), value_col="v", group_col="g",
                      group_a="a", group_b="b").head()
    assert got["t"] == 0.0 and got["cohen_d"] == 0.0
    assert got["mean_a"] == got["mean_b"] == 3.0


def test_degenerate_groups_null_not_inf(spark):
    # n_b = 1 → no variance estimate → NULL t/df/d, never ±inf
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 9.0)]
    got = welch_ttest(_mk(spark, rows), value_col="v", group_col="g",
                      group_a="a", group_b="b").head()
    assert got["t"] is None and got["df"] is None
    assert got["cohen_d"] is None
    assert got["nb"] == 1
    # both groups constant → zero SE → NULL, never 0/0
    rows = [("a", 2.0)] * 3 + [("b", 2.0)] * 4
    got = welch_ttest(_mk(spark, rows), value_col="v", group_col="g",
                      group_a="a", group_b="b").head()
    assert got["t"] is None and got["cohen_d"] is None


def test_other_groups_excluded(spark):
    rows = [("a", 1.0), ("a", 2.0), ("b", 1.5), ("b", 2.5),
            ("c", 999.0), ("c", -999.0)]
    got = welch_ttest(_mk(spark, rows), value_col="v", group_col="g",
                      group_a="a", group_b="b").head()
    assert (got["na"], got["nb"]) == (2, 2)
    assert got["mean_a"] == 1.5 and got["mean_b"] == 2.0
