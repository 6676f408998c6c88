"""Propensity-score matching ATT (operators/mlfit.psm_att)."""

from __future__ import annotations

import math

import pytest

from tests.test_ipw import SCHEMA as IPW_SCHEMA
from tests.test_ipw import _confounded_rows
from tests.test_logreg import _py_irls
from ultraviolet_spark.operators.mlfit import psm_att

pytestmark = pytest.mark.usefixtures("spark")

SCHEMA = "uid long, " + IPW_SCHEMA


def _with_ids(rows):
    return [(i, t, y, x1, x2) for i, (t, y, x1, x2) in enumerate(rows)]


def _snap(v):
    a = v * 1e6
    f = math.floor(abs(a) + 0.5)
    return int(math.copysign(f, a))


def _ref_psm(rows, iters=2, trim=1000):
    n, b0m, b1m, b2m = _py_irls(
        [(1 if t else 0, x1, x2) for _, t, _, x1, x2 in rows], iters)
    units = []
    for uid, t, y, x1, x2 in rows:
        x1s, x2s = round(x1 * 1e6) / 1e6, round(x2 * 1e6) / 1e6
        eta = (b0m + b1m * x1s + b2m * x2s) / 1e6
        e = max(trim, min(1_000_000 - trim,
                          _snap(1.0 / (1.0 + math.exp(-eta)))))
        units.append((e, str(uid), t, round(y * 1e6)))
    units.sort(key=lambda u: (u[0], u[1]))
    sd = n_match = n_t = 0
    for i, (e, uid, t, ym) in enumerate(units):
        if not t:
            continue
        n_t += 1
        prev = next((units[j] for j in range(i, -1, -1)
                     if not units[j][2]), None)
        nxt = next((units[j] for j in range(i + 1, len(units))
                    if not units[j][2]), None)
        if prev is None and nxt is None:
            continue
        if prev is not None and (nxt is None
                                 or (e - prev[0]) <= (nxt[0] - e)):
            my = prev[3]
        else:
            my = nxt[3]
        n_match += 1
        sd += ym - my
    att = round(sd / n_match / 1e6, 6)
    return {"n": n, "n_treated": n_t, "n_matched": n_match, "att": att}


def test_sequential_reference_equality(spark):
    rows = _with_ids(_confounded_rows(200, effect=1.0))
    got = psm_att(spark.createDataFrame(rows, SCHEMA), id_col="uid",
                  treat_expr="t", outcome_col="y",
                  x1_col="x1", x2_col="x2").head()
    want = _ref_psm(rows)
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)


def test_matching_deconfounds_null_effect(spark):
    rows = _with_ids(_confounded_rows(400, effect=0.0))
    got = psm_att(spark.createDataFrame(rows, SCHEMA), id_col="uid",
                  treat_expr="t", outcome_col="y",
                  x1_col="x1", x2_col="x2").head()
    # naive treated-control gap is > 3 (see test_ipw); matched ATT
    # collapses toward the true zero
    assert abs(got["att"]) < 1.0
    assert got["n_matched"] == got["n_treated"]


def test_planted_att_recovered(spark):
    rows = _with_ids(_confounded_rows(400, effect=2.0))
    got = psm_att(spark.createDataFrame(rows, SCHEMA), id_col="uid",
                  treat_expr="t", outcome_col="y",
                  x1_col="x1", x2_col="x2").head()
    assert got["att"] == pytest.approx(2.0, abs=0.8)


def test_partitioning_invariance(spark):
    rows = _with_ids(_confounded_rows(150, effect=0.5))
    df = spark.createDataFrame(rows, SCHEMA)
    a = psm_att(df.coalesce(1), id_col="uid", treat_expr="t",
                outcome_col="y", x1_col="x1", x2_col="x2").head()
    b = psm_att(df.repartition(7), id_col="uid", treat_expr="t",
                outcome_col="y", x1_col="x1", x2_col="x2").head()
    assert tuple(a) == tuple(b)
