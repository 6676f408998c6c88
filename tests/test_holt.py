"""Holt double-exponential smoothing (operators/windows.holt_forecast_by_key)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.windows import holt_forecast_by_key

pytestmark = pytest.mark.usefixtures("spark")


def _trunc_div2(x: int) -> int:
    return -((-x) // 2) if x < 0 else x // 2


def _ref_holt(vals, micro=1_000_000, horizon=3):
    import math
    ms = [math.floor(float(v) * micro) for v in vals]
    level, trend = ms[0], 0
    for v in ms[1:]:
        l_new = _trunc_div2(level + trend + v)
        trend = _trunc_div2(trend + (l_new - level))
        level = l_new
    return level, trend, level + horizon * trend


def _run(spark, series, horizon=3):
    rows = [(k, i, float(v)) for k, vals in series.items()
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = holt_forecast_by_key(df, value_col="v", order_cols=["i"],
                               by="k", horizon=horizon).collect()
    return {r["k"]: (r["level_micro"], r["trend_micro"], r["fc_micro"])
            for r in out}


def test_sequential_reference_equality(spark):
    series = {
        "ramp": [float(i) for i in range(20)],
        "flat": [5.5] * 10,
        "noisy": [((i * 37) % 11) / 3.0 + i * 0.5 for i in range(15)],
        "neg": [-3.7 + 0.1 * i for i in range(8)],
        "single": [2.25],
    }
    got = _run(spark, series)
    for k, vals in series.items():
        assert got[k] == _ref_holt(vals), k


def test_trend_is_learned_on_a_ramp_ewma_lags(spark):
    from ultraviolet_spark.operators.windows import ewma_by_key
    vals = [float(i) for i in range(40)]       # slope 1/step
    got = _run(spark, {"r": vals})["r"]
    level, trend, fc = got
    # trend converges to ~1.0/step; 3-step forecast lands near v_n + 3
    assert trend == pytest.approx(1_000_000, rel=0.05)
    assert fc / 1e6 == pytest.approx(vals[-1] + 3, rel=0.05)
    # EWMA (level-only) forecasts the ramp well BEHIND the last value
    rows = [("r", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    ew = ewma_by_key(df, value_col="v", order_cols=["i"],
                     by="k").head()["ewma_micro"]
    assert ew / 1e6 < vals[-1] - 0.5


def test_single_observation_level_only(spark):
    got = _run(spark, {"s": [7.0]}, horizon=5)["s"]
    assert got == (7_000_000, 0, 7_000_000)


def test_partitioning_invariance(spark):
    vals = [((i * 13) % 7) * 1.5 for i in range(30)]
    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    a = holt_forecast_by_key(df.coalesce(1), value_col="v",
                             order_cols=["i"], by="k").head()
    b = holt_forecast_by_key(df.repartition(7), value_col="v",
                             order_cols=["i"], by="k").head()
    assert tuple(a) == tuple(b)
