"""Brier decomposition (operators/evalmetrics.brier_decomposition)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.evalmetrics import brier_decomposition

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, pairs):
    return spark.createDataFrame([(int(p), int(y)) for p, y in pairs],
                                 "p long, y long")


def _run(spark, pairs, bins=10):
    return brier_decomposition(_mk(spark, pairs), p_micro_col="p",
                               label_col="y", bins=bins).head()


def test_exact_identity(spark):
    import random

    rng = random.Random(5)
    pairs = [(rng.randrange(1_000_000),
              1 if rng.random() < 0.3 else 0) for _ in range(500)]
    r = _run(spark, pairs)
    # BS = REL - RES + UNC + WBV - 2*WBC  (exact up to the 6-digit
    # rounding of each reported term)
    assert r["brier"] == pytest.approx(
        r["rel"] - r["res"] + r["unc"] + r["wbv"] - 2 * r["wbc"],
        abs=5e-6)
    assert r["unc"] == pytest.approx(0.3 * 0.7, abs=0.05)


def test_calibrated_vs_miscalibrated(spark):
    import random

    rng = random.Random(9)
    # perfectly calibrated: y ~ Bernoulli(p)
    cal = [(p, 1 if rng.random() * 1e6 < p else 0)
           for p in (rng.randrange(1_000_000) for _ in range(4000))]
    # same forecasts, labels shuffled against p: reliability blows up
    ps = [p for p, _ in cal]
    ys = [y for _, y in cal]
    rng.shuffle(ys)
    mis = list(zip(ps, ys))
    r_cal = _run(spark, cal)
    r_mis = _run(spark, mis)
    assert r_cal["rel"] < 0.01
    # shuffling kills the forecast's information: resolution collapses
    # and the Brier degrades toward UNC + (miscalibration terms)
    assert r_mis["res"] < r_cal["res"]
    assert r_mis["brier"] > r_cal["brier"]


def test_binary_forecaster_decomposition(spark):
    # forecaster says 0.9 for one group (90% positive) and 0.1 for the
    # other (10% positive): REL ~ 0, RES = the full spread, WBV = 0
    pairs = ([(900_000, 1)] * 9 + [(900_000, 0)]
             + [(100_000, 0)] * 9 + [(100_000, 1)])
    r = _run(spark, pairs)
    assert r["rel"] == pytest.approx(0.0, abs=1e-9)
    assert r["wbv"] == pytest.approx(0.0, abs=1e-9)
    assert r["wbc"] == pytest.approx(0.0, abs=1e-9)
    assert r["res"] == pytest.approx(0.16, abs=1e-6)   # (0.9-0.5)^2 etc
    assert r["unc"] == pytest.approx(0.25, abs=1e-6)
    assert r["brier"] == pytest.approx(0.09, abs=1e-6)
