"""Wald-Wolfowitz runs test (operators/stats.runs_test)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.stats import runs_test

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, series):
    rows = [(k, i, bool(x)) for k, xs in series.items()
            for i, x in enumerate(xs)]
    return spark.createDataFrame(rows, "k string, i long, f boolean")


def _run(spark, series):
    return {r["k"]: r for r in
            runs_test(_mk(spark, series), by="k", order_col="i",
                      tiebreak_col="i", flag_expr="f").collect()}


def _ref_z(xs):
    n = len(xs)
    n1 = sum(xs)
    n0 = n - n1
    runs = 1 + sum(1 for a, b in zip(xs, xs[1:]) if a != b)
    if n1 == 0 or n0 == 0:
        return runs, None
    two_p = 2.0 * n1 * n0
    e = 1.0 + two_p / n
    var = two_p * (two_p - n) / (n * n * (n - 1.0))
    return runs, round((runs - e) / math.sqrt(var), 6)


def test_matches_reference_and_counts(spark):
    xs = [(i * 7) % 3 == 0 for i in range(50)]
    got = _run(spark, {"a": xs})["a"]
    runs, z = _ref_z(xs)
    assert (got["runs"], got["z"]) == (runs, z)
    assert got["n1"] == sum(xs)


def test_clumped_negative_alternating_positive(spark):
    clump = [True] * 15 + [False] * 15        # 2 runs — way too few
    alt = [bool(i % 2) for i in range(30)]    # 30 runs — way too many
    got = _run(spark, {"clump": clump, "alt": alt})
    assert got["clump"]["runs"] == 2
    assert got["clump"]["z"] < -4
    assert got["alt"]["runs"] == 30
    assert got["alt"]["z"] > 4
    # both have the SAME marginal rate — the sequence is the signal
    assert got["clump"]["n1"] == got["alt"]["n1"]


def test_one_sided_sequence_null(spark):
    got = _run(spark, {"all1": [True] * 10, "one": [True]})
    assert got["all1"]["z"] is None
    assert got["all1"]["runs"] == 1
    assert got["one"]["z"] is None
