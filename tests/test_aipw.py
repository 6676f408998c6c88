"""AIPW doubly-robust ATE (operators/mlfit.aipw_ate)."""

from __future__ import annotations

import math

import pytest

from tests.test_ipw import SCHEMA, _confounded_rows
from tests.test_logreg import _py_irls
from ultraviolet_spark.operators.mlfit import aipw_ate

pytestmark = pytest.mark.usefixtures("spark")


def _snap(v):
    a = v * 1e6
    f = math.floor(abs(a) + 0.5)
    return int(math.copysign(f, a))


def _py_ols(rows):
    """Exact snapped-sufficient-statistics OLS, the operator's
    arithmetic: rows of (y, x1, x2) with x already 1e6-snapped."""
    S = dict(s11=0, s12=0, s13=0, s22=0, s23=0, s33=0,
             t1=0, t2=0, t3=0)
    for y, x1, x2 in rows:
        S["s11"] += 1_000_000
        S["s12"] += _snap(x1)
        S["s13"] += _snap(x2)
        S["s22"] += _snap(x1 * x1)
        S["s23"] += _snap(x1 * x2)
        S["s33"] += _snap(x2 * x2)
        S["t1"] += _snap(y)
        S["t2"] += _snap(y * x1)
        S["t3"] += _snap(y * x2)
    d = {k: float(v) for k, v in S.items()}
    m11 = d["s22"] * d["s33"] - d["s23"] * d["s23"]
    m12 = d["s12"] * d["s33"] - d["s23"] * d["s13"]
    m13 = d["s12"] * d["s23"] - d["s22"] * d["s13"]
    det = d["s11"] * m11 - d["s12"] * m12 + d["s13"] * m13
    det0 = (d["t1"] * m11
            - d["s12"] * (d["t2"] * d["s33"] - d["s23"] * d["t3"])
            + d["s13"] * (d["t2"] * d["s23"] - d["s22"] * d["t3"]))
    det1 = (d["s11"] * (d["t2"] * d["s33"] - d["s23"] * d["t3"])
            - d["t1"] * m12
            + d["s13"] * (d["s12"] * d["t3"] - d["t2"] * d["s13"]))
    det2 = (d["s11"] * (d["s22"] * d["t3"] - d["t2"] * d["s23"])
            - d["s12"] * (d["s12"] * d["t3"] - d["t2"] * d["s13"])
            + d["t1"] * m13)
    return _snap(det0 / det), _snap(det1 / det), _snap(det2 / det)


def _ref_aipw(rows, iters=2, trim=1000):
    snapped = [(t, round(y * 1e6), round(x1 * 1e6) / 1e6,
                round(x2 * 1e6) / 1e6) for t, y, x1, x2 in rows]
    n, b0m, b1m, b2m = _py_irls(
        [(1 if t else 0, x1, x2) for t, _, x1, x2 in rows], iters)
    ob = {}
    for arm in (0, 1):
        ob[arm] = _py_ols([(ym / 1e6, x1, x2)
                           for t, ym, x1, x2 in snapped
                           if int(t) == arm])
    sdm = sc1 = sc0 = 0
    nt = 0
    for t, ym, x1, x2 in snapped:
        eta = (b0m + b1m * x1 + b2m * x2) / 1e6
        emu = max(trim, min(1_000_000 - trim,
                            _snap(1.0 / (1.0 + math.exp(-eta)))))
        mu0 = (ob[0][0] + ob[0][1] * x1 + ob[0][2] * x2) / 1e6
        mu1 = (ob[1][0] + ob[1][1] * x1 + ob[1][2] * x2) / 1e6
        sdm += _snap(mu1 - mu0)
        yd = ym / 1e6
        if t:
            nt += 1
            sc1 += _snap((yd - mu1) * 1e6 / emu)
        else:
            sc0 += _snap((yd - mu0) * 1e6 / (1_000_000 - emu))
    ate = round((sdm + sc1 - sc0) / n / 1e6, 6)
    return {"n": n, "n_treated": nt, "ate_aipw": ate,
            "b1_out_treated_micro": ob[1][1],
            "b1_out_control_micro": ob[0][1]}


def test_sequential_reference_equality(spark):
    rows = _confounded_rows(200, effect=1.0)
    got = aipw_ate(spark.createDataFrame(rows, SCHEMA), treat_expr="t",
                   outcome_col="y", x1_col="x1", x2_col="x2").head()
    want = _ref_aipw(rows)
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)


def test_doubly_robust_recovers_null_effect(spark):
    rows = _confounded_rows(400, effect=0.0)
    got = aipw_ate(spark.createDataFrame(rows, SCHEMA), treat_expr="t",
                   outcome_col="y", x1_col="x1", x2_col="x2").head()
    # the outcome model here is correctly specified (y linear in x1),
    # so AIPW nails the zero effect even tighter than Hájek IPW
    assert abs(got["ate_aipw"]) < 0.15


def test_effect_recovered_when_planted(spark):
    rows = _confounded_rows(400, effect=2.0)
    got = aipw_ate(spark.createDataFrame(rows, SCHEMA), treat_expr="t",
                   outcome_col="y", x1_col="x1", x2_col="x2").head()
    assert got["ate_aipw"] == pytest.approx(2.0, abs=0.3)


def test_partitioning_invariance(spark):
    rows = _confounded_rows(150, effect=0.5)
    df = spark.createDataFrame(rows, SCHEMA)
    a = aipw_ate(df.coalesce(1), treat_expr="t", outcome_col="y",
                 x1_col="x1", x2_col="x2").head()
    b = aipw_ate(df.repartition(7), treat_expr="t", outcome_col="y",
                 x1_col="x1", x2_col="x2").head()
    assert tuple(a) == tuple(b)
