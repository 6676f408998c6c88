"""Cohen's d / Hedges' g effect size (operators/stats.cohens_d)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.stats import cohens_d

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, a_vals, b_vals):
    rows = [("a", float(v)) for v in a_vals] + \
           [("b", float(v)) for v in b_vals]
    return spark.createDataFrame(rows, "grp string, v double")


def _ref(a_vals, b_vals):
    am = [round(v * 1e6) for v in a_vals]
    bm = [round(v * 1e6) for v in b_vals]
    na, nb = len(am), len(bm)
    va = (na * sum(v * v for v in am) - sum(am) ** 2) / (na * (na - 1))
    vb = (nb * sum(v * v for v in bm) - sum(bm) ** 2) / (nb * (nb - 1))
    sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    sp = math.sqrt(sp2)
    d = (sum(am) / na - sum(bm) / nb) / sp
    j = 1.0 - 3.0 / (4 * (na + nb - 2) - 1)
    return round(d, 6), round(d * j, 6), round(sp / 1e6, 6)


def test_matches_sequential_reference(spark):
    a = [5.0 + 0.3 * ((i * 7) % 5) for i in range(20)]
    b = [4.2 + 0.4 * ((i * 3) % 7) for i in range(30)]
    got = cohens_d(_mk(spark, a, b), value_col="v", group_col="grp",
                   group_a="a", group_b="b").head()
    d, g, sp = _ref(a, b)
    assert got["d"] == d and got["g"] == g and got["sp"] == sp
    assert got["n_a"] == 20 and got["n_b"] == 30


def test_sign_and_scale_semantics(spark):
    # one pooled-sd separation: d close to 1; swapped groups negate
    a = [float(v) for v in (10, 11, 9, 10, 12, 8, 10, 11, 9, 10)]
    b = [v - 1.2 for v in a]
    got = cohens_d(_mk(spark, a, b), value_col="v", group_col="grp",
                   group_a="a", group_b="b").head()
    swp = cohens_d(_mk(spark, a, b), value_col="v", group_col="grp",
                   group_a="b", group_b="a").head()
    assert got["d"] > 0.8
    assert swp["d"] == -got["d"]
    # Hedges g shrinks toward zero (|g| < |d|) at small n
    assert abs(got["g"]) < abs(got["d"])


def test_degenerate_null(spark):
    # constant values in both groups: sp = 0 -> NULL d/g, means intact
    got = cohens_d(_mk(spark, [2.0] * 5, [1.0] * 5), value_col="v",
                   group_col="grp", group_a="a", group_b="b").head()
    assert got["d"] is None and got["g"] is None
    assert got["mean_a"] == 2.0 and got["mean_b"] == 1.0
    # a group with n < 2: NULL loudly
    got2 = cohens_d(_mk(spark, [2.0], [1.0, 3.0, 2.0]), value_col="v",
                    group_col="grp", group_a="a", group_b="b").head()
    assert got2["d"] is None
