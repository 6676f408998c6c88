"""Haldane-corrected odds ratio (operators/stats.odds_ratio_2x2)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.stats import odds_ratio_2x2

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, a, b, c, d):
    rows = ([(True, True)] * a + [(True, False)] * b
            + [(False, True)] * c + [(False, False)] * d)
    return spark.createDataFrame(rows, "ea boolean, eb boolean")


def _ref(a, b, c, d):
    orr = (a + .5) * (d + .5) / ((b + .5) * (c + .5))
    se = math.sqrt(1 / (a + .5) + 1 / (b + .5) + 1 / (c + .5)
                   + 1 / (d + .5))
    return (round(orr, 6), round(math.log(orr), 6), round(se, 6),
            round(math.exp(math.log(orr) - 1.959964 * se), 6),
            round(math.exp(math.log(orr) + 1.959964 * se), 6))


def test_matches_sequential_reference(spark):
    got = odds_ratio_2x2(_mk(spark, 30, 10, 5, 40), expr_a="ea",
                         expr_b="eb").head()
    orr, lo_, se, cl, ch = _ref(30, 10, 5, 40)
    assert (got["odds_ratio"], got["log_or"], got["se"],
            got["ci_lo"], got["ci_hi"]) == (orr, lo_, se, cl, ch)
    assert (got["a"], got["b"], got["c"], got["d"]) == (30, 10, 5, 40)


def test_empty_cell_stays_finite_and_direction(spark):
    got = odds_ratio_2x2(_mk(spark, 20, 0, 5, 15), expr_a="ea",
                         expr_b="eb").head()
    assert math.isfinite(got["odds_ratio"]) and got["odds_ratio"] > 1
    # swapping the outcome inverts the ratio exactly (same correction)
    swp = odds_ratio_2x2(_mk(spark, 0, 20, 15, 5), expr_a="ea",
                         expr_b="eb").head()
    assert swp["odds_ratio"] == round(1 / got["odds_ratio"], 6) or \
        abs(swp["odds_ratio"] * got["odds_ratio"] - 1) < 1e-5


def test_independence_near_one(spark):
    got = odds_ratio_2x2(_mk(spark, 40, 40, 40, 40), expr_a="ea",
                         expr_b="eb").head()
    assert got["odds_ratio"] == 1.0 and got["ci_lo"] < 1 < got["ci_hi"]
