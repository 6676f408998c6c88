"""Depth-2 binary segmentation (operators/stats.binary_segmentation)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import binary_segmentation

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, series):
    rows = [(k, i, float(v)) for k, vs in series.items()
            for i, v in enumerate(vs)]
    return spark.createDataFrame(rows, "k string, i long, v double")


def _gain(vs, lo, hi, tau):
    """Gain of splitting vs[lo:hi] after relative position tau."""
    seg = [round(v * 1e6) for v in vs[lo:hi]]
    m = len(seg)
    z = sum(seg)
    p = sum(seg[:tau])
    from decimal import ROUND_HALF_UP, Decimal
    d = float(p * m - tau * z)     # exact int → ONE double, as the
    # engines square it; HALF_UP via Decimal exactly like F.round
    # (py round() is half-even; x+0.5 corrupts ints above 2^52)
    x = d * d / m / tau / (m - tau)
    return float(Decimal(x).quantize(Decimal(1),
                                     rounding=ROUND_HALF_UP))


def _best(vs, lo, hi):
    m = hi - lo
    if m < 2:
        return None, None
    best = max(((t, _gain(vs, lo, hi, t)) for t in range(1, m)),
               key=lambda x: (x[1], -x[0]))
    return best


def test_two_step_staircase_recovered(spark):
    # three flat levels: 0 (x20), 50 (x20), 100 (x20).  The single
    # detector picks ONE compromise split; depth-2 recovers BOTH
    vs = [0.0] * 20 + [50.0] * 20 + [100.0] * 20
    got = binary_segmentation(_mk(spark, {"a": vs}), key_col="k",
                              order_col="i", value_col="v",
                              tiebreak_col="i").head()
    taus = sorted(t for t in (got["tau1"], got["tau_l"], got["tau_r"])
                  if t is not None)
    assert 20 in taus and 40 in taus


def test_matches_sequential_reference(spark):
    vs = [float((i * 13 + 5) % 17) + (30.0 if 12 <= i < 25 else 0)
          for i in range(40)]
    got = binary_segmentation(_mk(spark, {"a": vs}), key_col="k",
                              order_col="i", value_col="v",
                              tiebreak_col="i").head()
    t1, g1 = _best(vs, 0, 40)
    assert (got["tau1"], got["gain1"]) == (t1, g1)
    tl, gl = _best(vs, 0, t1)
    tr, gr = _best(vs, t1, 40)
    assert got["tau_l"] == tl and got["gain_l"] == gl
    assert got["tau_r"] == (t1 + tr) and got["gain_r"] == gr


def test_short_segments_null(spark):
    # n = 2: tau1 = 1, both sub-segments have length 1 → NULL
    got = binary_segmentation(_mk(spark, {"a": [1.0, 9.0]}),
                              key_col="k", order_col="i",
                              value_col="v", tiebreak_col="i").head()
    assert got["tau1"] == 1
    assert got["tau_l"] is None and got["tau_r"] is None
