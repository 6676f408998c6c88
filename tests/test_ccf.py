"""Per-key lead-lag cross-correlation (operators/stats.ccf_by_key)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.stats import ccf_by_key

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, series):
    rows = [(k, i, int(x), int(y))
            for k, pts in series.items()
            for i, (x, y) in enumerate(pts)]
    return spark.createDataFrame(rows, "k string, i long, x long, y long")


def _ref(pts, L):
    xs = [x for x, _ in pts]
    ys = [y for _, y in pts]
    n = len(pts)
    sx, sy = sum(xs), sum(ys)
    denx = n * sum(v * v for v in xs) - sx * sx
    deny = n * sum(v * v for v in ys) - sy * sy
    out = {}
    for lag in range(-L, L + 1):
        if abs(lag) >= n:
            continue
        if lag >= 0:
            pairs = list(zip(xs[:n - lag], ys[lag:]))
        else:
            pairs = list(zip(xs[-lag:], ys[:n + lag]))
        p = sum(a * b for a, b in pairs)
        a = sum(a for a, _ in pairs)
        b = sum(b for _, b in pairs)
        num = n * n * p - n * sx * b - n * sy * a \
            + (n - abs(lag)) * sx * sy
        r = None
        if denx > 0 and deny > 0:
            r = round(num / (n * math.sqrt(denx * deny)), 6)
        out[lag] = (num, r)
    return out


def test_matches_sequential_reference(spark):
    pts = [((i * 7) % 13, (i * 5 + 3) % 11) for i in range(25)]
    got = {r["lag"]: (r["ccf_num"], r["r"])
           for r in ccf_by_key(_mk(spark, {"a": pts}), key_col="k",
                               order_col="i", x_col="x", y_col="y",
                               tiebreak_col="i", max_lag=3).collect()}
    assert got == _ref(pts, 3)


def test_shifted_copy_peaks_at_its_lag(spark):
    # y is x delayed by 2 steps: the CCF must peak at lag +2 (x leads)
    base = [(i * 13 + 5) % 29 for i in range(30)]
    pts = [(base[i], base[i - 2] if i >= 2 else 0)
           for i in range(30)]
    got = {r["lag"]: r["r"]
           for r in ccf_by_key(_mk(spark, {"a": pts}), key_col="k",
                               order_col="i", x_col="x", y_col="y",
                               tiebreak_col="i", max_lag=3).collect()}
    assert got[2] == max(got.values())
    assert got[2] > 0.85
    # and the reverse pairing peaks negative-side
    rev = [(y, x) for x, y in pts]
    got2 = {r["lag"]: r["r"]
            for r in ccf_by_key(_mk(spark, {"a": rev}), key_col="k",
                                order_col="i", x_col="x", y_col="y",
                                tiebreak_col="i", max_lag=3).collect()}
    assert got2[-2] == max(got2.values())


def test_lag_zero_is_pearson(spark):
    pts = [(i, 3 * i + 1) for i in range(10)]
    got = {r["lag"]: r["r"]
           for r in ccf_by_key(_mk(spark, {"a": pts}), key_col="k",
                               order_col="i", x_col="x", y_col="y",
                               tiebreak_col="i", max_lag=1).collect()}
    assert got[0] == 1.0


def test_constant_series_null(spark):
    pts = [(5, i) for i in range(8)]
    got = ccf_by_key(_mk(spark, {"a": pts}), key_col="k",
                     order_col="i", x_col="x", y_col="y",
                     tiebreak_col="i", max_lag=2).collect()
    assert all(r["r"] is None for r in got)
    assert all(r["den_x"] == 0 for r in got)
