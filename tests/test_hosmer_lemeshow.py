"""Hosmer-Lemeshow calibration chi2 (operators/evalmetrics)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.evalmetrics import hosmer_lemeshow

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, pairs):
    return spark.createDataFrame([(int(p), int(y)) for p, y in pairs],
                                 "p long, y long")


def _run(spark, pairs, bins=10):
    return hosmer_lemeshow(_mk(spark, pairs), p_micro_col="p",
                           label_col="y", bins=bins).head()


def _ref(pairs, bins=10):
    width = 1_000_000 // bins
    agg = {}
    for p, y in pairs:
        b = min(p // width, bins - 1)
        n, o, s = agg.get(b, (0, 0, 0))
        agg[b] = (n + 1, o + y, s + p)
    hl, used, degen = 0.0, 0, 0
    for b in sorted(agg):
        n, o, s = agg[b]
        if 0 < s < 1_000_000 * n:
            used += 1
            hl += n * (1_000_000 * o - s) ** 2 / (s * (1_000_000 * n - s))
        else:
            degen += 1
    return round(hl, 6), used, degen


def test_matches_sequential_reference(spark):
    import random

    rng = random.Random(4)
    pairs = [(rng.randrange(1_000_000),
              1 if rng.random() < 0.4 else 0) for _ in range(400)]
    got = _run(spark, pairs)
    hl, used, degen = _ref(pairs)
    assert got["hl"] == pytest.approx(hl, abs=2e-6)
    assert (got["n_bins_used"], got["n_degenerate"]) == (used, degen)


def test_calibrated_small_miscalibrated_large(spark):
    import random

    rng = random.Random(8)
    cal = [(p, 1 if rng.random() * 1e6 < p else 0)
           for p in (rng.randrange(1_000_000) for _ in range(3000))]
    # systematically overconfident: forecasts high, outcomes rare
    over = [(900_000 + rng.randrange(100_000),
             1 if rng.random() < 0.3 else 0) for _ in range(3000)]
    hl_cal = _run(spark, cal)["hl"]
    hl_over = _run(spark, over)["hl"]
    assert hl_cal < 40          # ~chi2(8) scale
    assert hl_over > 10 * hl_cal


def test_degenerate_bins_counted_not_clamped(spark):
    # a bin whose forecasts are all 0: zero binomial variance
    pairs = [(0, 0)] * 5 + [(550_000, 1), (550_000, 0), (560_000, 1)]
    got = _run(spark, pairs)
    assert got["n_degenerate"] == 1 and got["n_bins_used"] == 1
    assert got["hl"] is not None
