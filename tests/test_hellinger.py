"""Hellinger/Bhattacharyya drift (operators/stats.hellinger_drift)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.stats import hellinger_drift

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "v double")


def test_identical_windows_bc_one(spark):
    vals = [float(i % 50) for i in range(500)]
    out = hellinger_drift(_mk(spark, vals), _mk(spark, vals),
                          value_col="v", bins=10).collect()
    bc = sum(r["bc_term"] for r in out)
    assert abs(bc - 1.0) < 1e-9
    h = math.sqrt(max(0.0, 1 - bc))
    assert h < 1e-4


def test_disjoint_windows_bounded(spark):
    # PSI explodes on disjoint supports; Hellinger saturates near 1
    ref = [float(i % 10) for i in range(300)]
    cur = [1000.0 + i % 10 for i in range(300)]
    out = hellinger_drift(_mk(spark, ref), _mk(spark, cur),
                          value_col="v", bins=10).collect()
    bc = sum(r["bc_term"] for r in out)
    # all current mass lands in the reference's top decile bin, so
    # BC ~ sqrt(0.1*1) plus smoothing crumbs — bounded, unlike PSI
    assert 0.0 <= bc < 0.6
    assert math.sqrt(1 - bc) > 0.6


def test_bc_bounds_and_counts(spark):
    ref = [float(i % 20) for i in range(400)]
    cur = [float((i * 7) % 23) for i in range(350)]
    out = hellinger_drift(_mk(spark, ref), _mk(spark, cur),
                          value_col="v", bins=10).collect()
    bc = sum(r["bc_term"] for r in out)
    assert 0.0 < bc <= 1.0 + 1e-9
    assert sum(r["ref_n"] for r in out) == 400
    assert sum(r["cur_n"] for r in out) == 350
