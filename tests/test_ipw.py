"""IPW / Hájek ATE (operators/mlfit.ipw_ate).

The sequential reference reuses test_logreg's exact IRLS replica for
the propensity fit and replays the trimming/weighting integer
arithmetic, so equality is exact.
"""

from __future__ import annotations

import math

import pytest

from tests.test_logreg import _py_irls
from ultraviolet_spark.operators.mlfit import ipw_ate

pytestmark = pytest.mark.usefixtures("spark")

SCHEMA = "t boolean, y double, x1 double, x2 double"


def _snap(v):
    a = v * 1e6
    f = math.floor(abs(a) + 0.5)
    return int(math.copysign(f, a))


def _ref_ipw(rows, iters=2, trim=1000):
    n, b0m, b1m, b2m = _py_irls(
        [(1 if t else 0, x1, x2) for t, _, x1, x2 in rows], iters)
    sums = {k: 0 for k in ("yt", "yc", "wyt", "wyc", "wt", "wc")}
    nt = 0
    for t, y, x1, x2 in rows:
        x1s, x2s = round(x1 * 1e6) / 1e6, round(x2 * 1e6) / 1e6
        ym = _snap(y)
        eta = (float(b0m) + float(b1m) * x1s + float(b2m) * x2s) / 1e6
        emu = max(trim, min(1_000_000 - trim,
                            _snap(1.0 / (1.0 + math.exp(-eta)))))
        den = emu if t else 1_000_000 - emu
        wm = _snap(1e6 / den)
        wym = int(math.copysign(
            math.floor(abs(float(ym) * 1e6 / den) + 0.5),
            float(ym) * 1e6 / den))
        if t:
            nt += 1
            sums["yt"] += ym
            sums["wyt"] += wym
            sums["wt"] += wm
        else:
            sums["yc"] += ym
            sums["wyc"] += wym
            sums["wc"] += wm
    naive = round((sums["yt"] / nt - sums["yc"] / (n - nt)) / 1e6, 6)
    ipw = round((sums["wyt"] - sums["wyc"]) / n / 1e6, 6)
    hajek = round(sums["wyt"] / sums["wt"]
                  - sums["wyc"] / sums["wc"], 6)
    return {"n": n, "n_treated": nt, "beta0_micro": b0m,
            "beta1_micro": b1m, "beta2_micro": b2m,
            "ate_naive": naive, "ate_ipw": ipw, "ate_hajek": hajek}


def _confounded_rows(n=400, effect=0.0):
    """Treatment and outcome both driven by x1 → naive is biased by
    construction; the true effect is ``effect``."""
    rows = []
    for i in range(n):
        x1 = (i % 20) / 2.0                      # activity 0..9.5
        x2 = ((i * 7) % 13) / 3.0
        # self-selection WITH overlap: P(t|x1) rises from ~.2 to ~.8
        # but never saturates — IPW needs positivity to deconfound
        t = ((i * 13) % 10) < 2.0 + 0.63 * x1
        y = 2.0 * x1 + (effect if t else 0.0) + (i % 5) * 0.1
        rows.append((bool(t), float(y), float(x1), float(x2)))
    return rows


def test_sequential_reference_equality(spark):
    rows = _confounded_rows(200, effect=1.0)
    got = ipw_ate(spark.createDataFrame(rows, SCHEMA), treat_expr="t",
                  outcome_col="y", x1_col="x1", x2_col="x2").head()
    want = _ref_ipw(rows)
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)


def test_deconfounding_shrinks_naive_bias(spark):
    # TRUE effect is zero; all outcome signal rides the confounder x1
    rows = _confounded_rows(400, effect=0.0)
    got = ipw_ate(spark.createDataFrame(rows, SCHEMA), treat_expr="t",
                  outcome_col="y", x1_col="x1", x2_col="x2").head()
    assert got["ate_naive"] > 3.0            # selection bias, huge
    # Hájek recovers the true zero to within noise; HT is looser but
    # still an order of magnitude under the naive bias
    assert abs(got["ate_hajek"]) < 0.3
    assert abs(got["ate_ipw"]) < 1.0


def test_singular_fit_propagates_null(spark):
    rows = [(i % 2 == 0, float(i), float(i % 7), float(2 * (i % 7)))
            for i in range(40)]               # x2 = 2·x1 — collinear
    got = ipw_ate(spark.createDataFrame(rows, SCHEMA), treat_expr="t",
                  outcome_col="y", x1_col="x1", x2_col="x2").head()
    assert got["beta1_micro"] is None
    assert got["ate_ipw"] is None and got["ate_hajek"] is None
    assert got["ate_naive"] is not None      # the raw diff still reports


def test_partitioning_invariance(spark):
    rows = _confounded_rows(150, effect=0.5)
    df = spark.createDataFrame(rows, SCHEMA)
    a = ipw_ate(df.coalesce(1), treat_expr="t", outcome_col="y",
                x1_col="x1", x2_col="x2").head()
    b = ipw_ate(df.repartition(7), treat_expr="t", outcome_col="y",
                x1_col="x1", x2_col="x2").head()
    assert tuple(a) == tuple(b)
