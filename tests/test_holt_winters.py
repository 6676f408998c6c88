"""Holt-Winters additive seasonal fold
(operators/windows.holt_winters_by_key)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.windows import (
    holt_forecast_by_key,
    holt_winters_by_key,
)

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, series):
    rows = [(k, i, float(v)) for k, vals in series.items()
            for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "k string, i long, v double")


def _ref(vals, m, h):
    """Sequential reference of the integer trunc-div trajectory."""
    def t2(x):
        # trunc toward zero by 2 (matches (x/2.0).cast(long))
        return abs(x) // 2 * (1 if x >= 0 else -1)

    ms = [int(v * 1_000_000) for v in vals]
    if len(ms) < m:
        return None
    l = int(float(sum(ms[:m])) / m)    # trunc toward zero
    seas = [v - l for v in ms[:m]]
    b = 0
    for v in ms[m:]:
        s_old = seas.pop(0)
        l_new = t2(l + b + (v - s_old))
        b_new = t2(b + (l_new - l))
        s_new = t2((v - l_new) + s_old)
        l, b = l_new, b_new
        seas.append(s_new)
    si = (h - 1) % m
    return l, b, seas[si], l + h * b + seas[si]


def test_matches_sequential_reference(spark):
    # noisy 4-cycle with drift, 19 points (3 partial cycles past init)
    vals = [10 + 3 * (i % 4) + 0.25 * i + (0.1 if i % 3 == 0 else 0)
            for i in range(19)]
    got = holt_winters_by_key(_mk(spark, {"a": vals}), value_col="v",
                              order_cols=["i"], by="k", season_len=4,
                              horizon=2).head()
    l, b, s, fc = _ref(vals, 4, 2)
    assert (got["level_micro"], got["trend_micro"],
            got["season_micro"], got["fc_micro"]) == (l, b, s, fc)


def test_sees_the_cycle_holt_cannot(spark):
    # pure 4-sawtooth, no trend: HW's 1-step forecast lands on the
    # cycle value; Holt (level+trend only) sits near the MEAN
    vals = [0.0, 10.0, 20.0, 30.0] * 8
    df = _mk(spark, {"a": vals})
    hw = holt_winters_by_key(df, value_col="v", order_cols=["i"],
                             by="k", season_len=4, horizon=1).head()
    holt = holt_forecast_by_key(df, value_col="v", order_cols=["i"],
                                by="k", horizon=1).head()
    # next point is 0.0 (position 32 ≡ 0 mod 4)
    hw_err = abs(hw["fc_micro"] - 0)
    holt_err = abs(holt["fc_micro"] - 0)
    assert hw_err < 3_000_000          # within 3 units of the sawtooth
    assert holt_err > 8_000_000        # Holt stuck around the mean ~15


def test_short_series_null_not_partial_model(spark):
    got = holt_winters_by_key(_mk(spark, {"a": [1.0, 2.0, 3.0]}),
                              value_col="v", order_cols=["i"], by="k",
                              season_len=4, horizon=1).head()
    assert got["level_micro"] is None and got["fc_micro"] is None
    assert got["n"] == 3


def test_exactly_one_season_is_init_only(spark):
    vals = [5.0, 7.0, 9.0, 11.0]
    got = holt_winters_by_key(_mk(spark, {"a": vals}), value_col="v",
                              order_cols=["i"], by="k", season_len=4,
                              horizon=1).head()
    l = int(sum(int(v * 1e6) for v in vals) / 4)
    assert got["level_micro"] == l
    assert got["trend_micro"] == 0
    assert got["season_micro"] == int(5.0 * 1e6) - l
    assert got["fc_micro"] == l + (int(5.0 * 1e6) - l)


def test_multiple_keys_independent(spark):
    series = {"a": [1.0, 2.0] * 6, "b": [100.0, 50.0] * 6}
    got = {r["k"]: r for r in
           holt_winters_by_key(_mk(spark, series), value_col="v",
                               order_cols=["i"], by="k", season_len=2,
                               horizon=1).collect()}
    ra, rb = _ref(series["a"], 2, 1), _ref(series["b"], 2, 1)
    assert got["a"]["fc_micro"] == ra[3]
    assert got["b"]["fc_micro"] == rb[3]
