"""Ljung-Box portmanteau test (operators/stats.ljung_box_by_key)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import ljung_box_by_key

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, series):
    rows = [(k, i, i, int(v)) for k, vs in series.items()
            for i, v in enumerate(vs)]
    return spark.createDataFrame(
        rows, "k string, t long, tb long, x long")


def _ref(vs, L=3):
    n = len(vs)
    if n <= L:
        return None
    mean = sum(vs) / n
    den = sum((v - mean) ** 2 for v in vs)
    if den == 0:
        return None
    q = 0.0
    for lag in range(1, L + 1):
        rho = sum((vs[t] - mean) * (vs[t + lag] - mean)
                  for t in range(n - lag)) / den
        q += rho * rho / (n - lag)
    return n * (n + 2) * q


def test_matches_sequential_reference(spark):
    vs = [(i * 13) % 7 + (i % 3) * 5 for i in range(40)]
    got = ljung_box_by_key(_mk(spark, {"a": vs}), key_col="k",
                           order_col="t", value_col="x",
                           tiebreak_col="tb").head()
    assert got["q_lb"] == pytest.approx(_ref(vs), rel=1e-6)


def test_white_vs_periodic(spark):
    import random

    rng = random.Random(7)
    white = [rng.randrange(1000) for _ in range(120)]
    periodic = [100 if i % 2 else 0 for i in range(120)]
    got = {r["k"]: r["q_lb"] for r in ljung_box_by_key(
        _mk(spark, {"w": white, "p": periodic}), key_col="k",
        order_col="t", value_col="x", tiebreak_col="tb").collect()}
    # an alternating series is maximally lag-correlated; white noise
    # stays near the chi2(3) scale
    assert got["p"] > 100
    assert got["w"] < 30


def test_large_cent_values_past_int64(spark):
    """ADVICE r4: the n*n*p numerator term crosses int64 at roughly
    1-2k cent-scale events per key, and non-ANSI Spark would wrap
    silently.  num/den are now assembled from DECIMAL(38,0) operands —
    pin a 5k-event cent-scale series against the exact big-int
    reference, and prove the fixture bites by showing the wrapped
    int64 build of num disagrees with the exact one."""
    # ×5 scale pushes the lag-1 numerator itself past 2^63 (2.55e19),
    # so per-operation int64 wrapping corrupts the FINAL value too —
    # without that, modular arithmetic round-trips (wrapping
    # intermediates is exact whenever the result fits, which is why a
    # smaller fixture cannot demonstrate corruption)
    vs = [(((i * 9973) % 10007) + 5000) * 5 for i in range(5000)]
    n, L = len(vs), 3
    s = sum(vs)
    s2 = sum(v * v for v in vs)
    den = n * (n * s2 - s * s)

    def wrap64(a):
        return ((a + 2**63) % 2**64) - 2**63

    sumt = 0.0
    wrapped_differs = False
    for lag in range(1, L + 1):
        p = sum(vs[t] * vs[t + lag] for t in range(n - lag))
        sa, sb = sum(vs[:n - lag]), sum(vs[lag:])
        num = n * n * p - n * s * (sa + sb) + (n - lag) * s * s
        # per-operation int64-wrapped build (what the old code computed)
        nw = wrap64(
            wrap64(wrap64(wrap64(n * n) * p)
                   - wrap64(wrap64(n * s) * wrap64(sa + sb)))
            + wrap64(wrap64(n - lag) * wrap64(s * s)))
        wrapped_differs = wrapped_differs or (nw != num)
        sumt += float(num * num) / float(n - lag)
    assert n * n * p > 2**63          # the fixture really crosses int64
    assert wrapped_differs            # ...and wrapping really corrupts
    q = float(n * (n + 2)) * sumt / float(den * den)
    got = ljung_box_by_key(_mk(spark, {"big": vs}), key_col="k",
                           order_col="t", value_col="x",
                           tiebreak_col="tb").head()
    assert got["q_lb"] == pytest.approx(q, rel=1e-6, abs=1e-6)


def test_degenerate_nulls(spark):
    got = {r["k"]: r["q_lb"] for r in ljung_box_by_key(
        _mk(spark, {"const": [5] * 10, "short": [1, 2, 3]}),
        key_col="k", order_col="t", value_col="x",
        tiebreak_col="tb").collect()}
    assert got["const"] is None   # zero variance
    assert got["short"] is None   # n <= max_lag
