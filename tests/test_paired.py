"""Paired-design tests: McNemar + sign test (operators/stats)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.stats import mcnemar_test, sign_test

pytestmark = pytest.mark.usefixtures("spark")


def test_mcnemar_counts_and_statistic(spark):
    rows = ([(True, True)] * 40 + [(False, False)] * 30
            + [(True, False)] * 20 + [(False, True)] * 10)
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    got = mcnemar_test(df, a_col="a", b_col="b").head()
    assert (got["n"], got["n_both"], got["n_neither"]) == (100, 40, 30)
    assert (got["b"], got["c"]) == (20, 10)
    assert got["chi2_cc"] == round((abs(20 - 10) - 1) ** 2 / 30, 6)


def test_mcnemar_concordant_pairs_carry_nothing(spark):
    # piling on both/neither units must not move the statistic
    core = [(True, False)] * 12 + [(False, True)] * 5
    a = mcnemar_test(spark.createDataFrame(
        core, "a boolean, b boolean"), a_col="a", b_col="b").head()
    b = mcnemar_test(spark.createDataFrame(
        core + [(True, True)] * 500 + [(False, False)] * 500,
        "a boolean, b boolean"), a_col="a", b_col="b").head()
    assert a["chi2_cc"] == b["chi2_cc"]


def test_mcnemar_no_discordant_null(spark):
    df = spark.createDataFrame([(True, True)] * 5,
                               "a boolean, b boolean")
    assert mcnemar_test(df, a_col="a", b_col="b").head()["chi2_cc"] \
        is None


def test_sign_test_counts_and_z(spark):
    rows = [(1.0, 2.0)] * 15 + [(2.0, 1.0)] * 5 + [(3.0, 3.0)] * 7
    df = spark.createDataFrame(rows, "x double, y double")
    got = sign_test(df, x_col="x", y_col="y").head()
    assert (got["n_pos"], got["n_neg"], got["n_tie"]) == (15, 5, 7)
    assert got["z"] == round((abs(15 - 5) - 1) / math.sqrt(20), 6)


def test_sign_test_ties_are_integer_equality(spark):
    # 0.1+0.2 vs 0.3: float == would call them different; the micro
    # snap makes the tie deterministic
    df = spark.createDataFrame([(0.1 + 0.2, 0.3)], "x double, y double")
    got = sign_test(df, x_col="x", y_col="y").head()
    assert got["n_tie"] == 1 and got["z"] is None
