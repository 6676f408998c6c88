"""Wilson score intervals (operators/stats.wilson_intervals)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.stats import wilson_intervals

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    return spark.createDataFrame(
        [(str(k), bool(s)) for k, s in rows], "k string, s boolean")


def _ref(n, s, z=1.96):
    p = s / n
    z2 = z * z
    denom = 1.0 + z2 / n
    center = (p + z2 / (2.0 * n)) / denom
    half = (z * math.sqrt(p * (1.0 - p) / n
                          + z2 / (4.0 * n * n))) / denom
    return round(center - half, 6), round(center + half, 6)


def test_matches_reference(spark):
    rows = [("a", i % 3 == 0) for i in range(90)]
    rows += [("b", i % 10 == 0) for i in range(50)]
    got = {r["k"]: r for r in wilson_intervals(
        _mk(spark, rows), by="k", success_expr="s").collect()}
    lo, hi = _ref(90, 30)
    assert (got["a"]["wilson_lo"], got["a"]["wilson_hi"]) == (lo, hi)
    assert got["b"]["successes"] == 5


def test_boundary_honesty_vs_wald(spark):
    # 3/3 successes: Wald says [1, 1] (certainty!); Wilson stays
    # properly below 1 with a wide interval
    rows = [("sure", True)] * 3
    got = wilson_intervals(_mk(spark, rows), by="k",
                           success_expr="s").head()
    assert got["p_hat"] == 1.0
    assert got["wilson_lo"] < 0.5          # honest about n=3
    assert got["wilson_hi"] <= 1.0
    # 0/5: interval stays above 0 on the low side's mirror
    rows = [("none", False)] * 5
    got = wilson_intervals(_mk(spark, rows), by="k",
                           success_expr="s").head()
    assert got["wilson_lo"] == 0.0 or got["wilson_lo"] >= 0.0
    assert got["wilson_hi"] > 0.3


def test_interval_contains_p_hat_and_shrinks(spark):
    rows = [("small", i % 2 == 0) for i in range(10)]
    rows += [("large", i % 2 == 0) for i in range(1000)]
    got = {r["k"]: r for r in wilson_intervals(
        _mk(spark, rows), by="k", success_expr="s").collect()}
    for r in got.values():
        assert r["wilson_lo"] <= r["p_hat"] <= r["wilson_hi"]
    w_small = got["small"]["wilson_hi"] - got["small"]["wilson_lo"]
    w_large = got["large"]["wilson_hi"] - got["large"]["wilson_lo"]
    assert w_large < w_small / 5
