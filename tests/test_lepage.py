"""Lepage location+scale omnibus (operators/stats.lepage_test)."""

from __future__ import annotations

import random

import pytest

from ultraviolet_spark.operators.stats import lepage_test

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, a_vals, b_vals):
    rows = [("a", float(v)) for v in a_vals] + \
           [("b", float(v)) for v in b_vals]
    return spark.createDataFrame(rows, "grp string, v double")


def _run(spark, a, b):
    return lepage_test(_mk(spark, a, b), value_col="v",
                       group_col="grp", group_a="a",
                       group_b="b").head()


def test_fires_on_pure_shift_and_pure_scale(spark):
    rng = random.Random(11)
    base = [rng.uniform(-1, 1) for _ in range(80)]
    shift = _run(spark, [v + 2.5 for v in base], base)
    scale = _run(spark, [v * 15 for v in base], base)
    null_ = _run(spark, base,
                 [rng.uniform(-1, 1) for _ in range(80)])
    # pure shift: Wilcoxon arm carries it; pure scale: AB arm
    assert abs(shift["z_w"]) > 4 and shift["l"] > 20
    assert abs(scale["z_ab"]) > 4 and scale["l"] > 20
    assert null_["l"] < 12      # chi2(2) scale under the null


def test_l_is_sum_of_squared_rounded_arms(spark):
    a = [1.0 + 0.3 * ((i * 7) % 9) for i in range(20)]
    b = [1.5 + 0.45 * ((i * 5) % 11) for i in range(25)]
    got = _run(spark, a, b)
    assert got["l"] == round(got["z_w"] ** 2 + got["z_ab"] ** 2, 6)


def test_all_tied_null(spark):
    got = _run(spark, [2.0] * 6, [2.0] * 8)
    assert got["l"] is None and got["z_w"] is None
