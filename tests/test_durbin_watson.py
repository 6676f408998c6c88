"""Durbin-Watson on per-key OLS residuals
(operators/stats.durbin_watson_by_key)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import durbin_watson_by_key

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, series):
    rows = [(k, i, float(x), float(y))
            for k, pts in series.items()
            for i, (x, y) in enumerate(pts)]
    return spark.createDataFrame(rows,
                                 "k string, i long, x double, y double")


def _ref(pts):
    xs = [round(x * 1e6) for x, _ in pts]
    ys = [round(y * 1e6) for _, y in pts]
    n = float(len(pts))
    sx, sy = float(sum(xs)), float(sum(ys))
    sxx = float(sum(x * x for x in xs))
    sxy = float(sum(x * y for x, y in zip(xs, ys)))
    den = n * sxx - sx * sx
    if den == 0:
        return None
    b = (n * sxy - sx * sy) / den
    a = (sy - b * sx) / n
    es = [round(y - (a + b * x)) for x, y in zip(xs, ys)]
    see = sum(e * e for e in es)
    if see == 0:
        return None
    sdd = sum((e2 - e1) ** 2 for e1, e2 in zip(es, es[1:]))
    return round(sdd / see, 6)


def test_matches_sequential_reference(spark):
    pts = [(i, 2 * i + ((i * 7) % 5) - 2) for i in range(40)]
    got = durbin_watson_by_key(_mk(spark, {"a": pts}), by="k",
                               x_col="x", y_col="y", order_col="i",
                               tiebreak_col="i").head()
    assert got["dw"] == _ref(pts)


def test_regime_shift_low_alternation_high(spark):
    # a missing regime: the line averages two levels, so residuals
    # stay negative then positive for long stretches → DW near 0
    pts_regime = [(i, 0.0 + (i % 3) * 0.01) for i in range(25)]
    pts_regime += [(25 + i, 100.0 + (i % 3) * 0.01) for i in range(25)]
    # alternating residuals → DW near 4
    pts_alt = [(i, i + (5.0 if i % 2 == 0 else -5.0))
               for i in range(40)]
    got = {r["k"]: r for r in durbin_watson_by_key(
        _mk(spark, {"regime": pts_regime, "alt": pts_alt}), by="k",
        x_col="x", y_col="y", order_col="i",
        tiebreak_col="i").collect()}
    assert got["regime"]["dw"] < 0.5
    assert got["alt"]["dw"] > 3.0
    assert got["regime"]["dw"] == _ref(pts_regime)
    assert got["alt"]["dw"] == _ref(pts_alt)


def test_degenerate_keys_null(spark):
    series = {"constx": [(1.0, i) for i in range(5)],
              "perfect": [(i, 3.0 * i + 1) for i in range(5)]}
    got = {r["k"]: r for r in durbin_watson_by_key(
        _mk(spark, series), by="k", x_col="x", y_col="y",
        order_col="i", tiebreak_col="i").collect()}
    assert got["constx"]["dw"] is None
    assert got["perfect"]["dw"] is None      # zero residuals
