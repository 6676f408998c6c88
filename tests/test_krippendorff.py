"""Krippendorff alpha nominal (operators/evalmetrics)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.evalmetrics import (
    krippendorff_alpha_nominal)

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, pairs):
    return spark.createDataFrame(list(pairs), "a string, b string")


def _ref(pairs):
    from collections import Counter

    n = len(pairs)
    d = sum(1 for a, b in pairs if a != b)
    m = Counter()
    for a, b in pairs:
        m[a] += 1
        m[b] += 1
    den = (2 * n) ** 2 - sum(v * v for v in m.values())
    if den <= 0:
        return None
    return round(1 - (2 * n - 1) * 2 * d / den, 6)


def test_matches_reference_and_textbook_case(spark):
    # classic Krippendorff example shape: mostly agree, some confusion
    pairs = [("x", "x")] * 8 + [("y", "y")] * 6 + [("x", "y")] * 2 \
        + [("z", "z")] * 3 + [("y", "z")]
    got = krippendorff_alpha_nominal(_mk(spark, pairs), a_col="a",
                                     b_col="b").head()
    assert got["alpha"] == _ref(pairs)
    assert got["n_disagree"] == 3


def test_perfect_and_chance_agreement(spark):
    perf = [("p", "p")] * 5 + [("q", "q")] * 5
    got = krippendorff_alpha_nominal(_mk(spark, perf), a_col="a",
                                     b_col="b").head()
    assert got["alpha"] == 1.0
    # systematic disagreement on two labels: alpha goes strongly
    # negative (worse than chance)
    anti = [("p", "q")] * 6 + [("q", "p")] * 6
    got2 = krippendorff_alpha_nominal(_mk(spark, anti), a_col="a",
                                      b_col="b").head()
    assert got2["alpha"] < -0.9


def test_single_category_null(spark):
    one = [("s", "s")] * 7
    got = krippendorff_alpha_nominal(_mk(spark, one), a_col="a",
                                     b_col="b").head()
    assert got["alpha"] is None and got["k"] == 1
