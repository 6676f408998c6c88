"""Per-key Kendall tau-b (operators/stats.kendall_tau_by_key)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from ultraviolet_spark.operators.stats import kendall_tau_by_key

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, series):
    rows = [(k, i, float(x), float(y)) for k, pts in series.items()
            for i, (x, y) in enumerate(pts)]
    return spark.createDataFrame(
        rows, "k string, tb long, x double, y double")


def _ref(pts):
    xs = [round(x * 1e6) for x, _ in pts]
    ys = [round(y * 1e6) for _, y in pts]
    n = len(pts)
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        * (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
        for i in range(n) for j in range(i + 1, n))
    n0 = n * (n - 1) // 2
    n1 = sum(t * (t - 1) // 2 for t in Counter(xs).values())
    n2 = sum(t * (t - 1) // 2 for t in Counter(ys).values())
    den2 = (n0 - n1) * (n0 - n2)
    tau = round(s / math.sqrt(den2), 6) if den2 > 0 else None
    return s, n0, n1, n2, tau


def test_matches_sequential_reference(spark):
    pts = [((i * 7) % 11 + 0.1 * i, (i * 5) % 13 - 0.2 * i)
           for i in range(25)]
    got = kendall_tau_by_key(_mk(spark, {"a": pts}), by="k",
                             x_col="x", y_col="y",
                             tiebreak_col="tb").head()
    s, n0, n1, n2, tau = _ref(pts)
    assert (got["s"], got["n0"], got["n1"], got["n2"]) == (s, n0, n1, n2)
    assert got["tau_b"] == tau


def test_perfect_monotone_and_reversed(spark):
    up = [(float(i), float(2 * i + 1)) for i in range(15)]
    down = [(float(i), float(-3 * i)) for i in range(15)]
    got = {r["k"]: r for r in kendall_tau_by_key(
        _mk(spark, {"up": up, "down": down}), by="k", x_col="x",
        y_col="y", tiebreak_col="tb").collect()}
    assert got["up"]["tau_b"] == 1.0
    assert got["down"]["tau_b"] == -1.0
    # monotone but NONLINEAR still gives exactly 1 (rank statistic;
    # Pearson would not)
    curved = [(float(i), float(i) ** 3) for i in range(12)]
    got2 = kendall_tau_by_key(_mk(spark, {"c": curved}), by="k",
                              x_col="x", y_col="y",
                              tiebreak_col="tb").head()
    assert got2["tau_b"] == 1.0


def test_ties_shrink_denominator_and_degenerate_null(spark):
    tied = [(float(i % 3), float(i % 4 + (0.5 if i % 2 else 0.0)))
            for i in range(16)]
    s, n0, n1, n2, tau = _ref(tied)
    got = kendall_tau_by_key(_mk(spark, {"a": tied}), by="k",
                             x_col="x", y_col="y",
                             tiebreak_col="tb").head()
    assert (got["s"], got["n1"], got["n2"]) == (s, n1, n2)
    assert n1 > 0 and got["tau_b"] == tau
    # fully-tied x margin: zero denominator -> NULL, s = 0
    const = [(1.0, float(i)) for i in range(8)]
    got2 = kendall_tau_by_key(_mk(spark, {"c": const}), by="k",
                              x_col="x", y_col="y",
                              tiebreak_col="tb").head()
    assert got2["tau_b"] is None and got2["n1"] == got2["n0"]
