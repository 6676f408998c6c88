"""Poisson IRLS regression (operators/mlfit.poisreg_irls)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.mlfit import poisreg_irls

pytestmark = pytest.mark.usefixtures("spark")

SCHEMA = "y double, x1 double, x2 double"


def _py_pois(rows, iters=2):
    data = [(float(y), round(x1 * 1e6) / 1e6, round(x2 * 1e6) / 1e6)
            for y, x1, x2 in rows]
    b0m = b1m = b2m = 0

    def snap(v):
        a = v * 1e6
        f = math.floor(abs(a) + 0.5)
        return int(math.copysign(f, a))

    for _ in range(iters):
        S = dict(s11=0, s12=0, s13=0, s22=0, s23=0, s33=0,
                 t1=0, t2=0, t3=0)
        for y, x1, x2 in data:
            eta = (float(b0m) + float(b1m) * x1
                   + float(b2m) * x2) / 1e6
            mu = math.exp(eta)
            w = mu
            z = eta + (y - mu) / mu
            S["s11"] += snap(w)
            S["s12"] += snap(w * x1)
            S["s13"] += snap(w * x2)
            S["s22"] += snap(w * x1 * x1)
            S["s23"] += snap(w * x1 * x2)
            S["s33"] += snap(w * x2 * x2)
            S["t1"] += snap(w * z)
            S["t2"] += snap(w * z * x1)
            S["t3"] += snap(w * z * x2)
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
        b0m, b1m, b2m = (snap(det0 / det), snap(det1 / det),
                         snap(det2 / det))
    return len(data), b0m, b1m, b2m


def _rows():
    rows = []
    for i in range(300):
        x1 = (i % 10) / 2.0
        x2 = ((i * 7) % 13) / 4.0
        lam = math.exp(0.2 + 0.3 * x1 - 0.1 * x2)
        # deterministic 'draw': floor of lambda plus a small rotation
        y = math.floor(lam) + (1 if (i * 13) % 7 < 2 else 0)
        rows.append((float(y), x1, x2))
    return rows


def test_sequential_reference_equality(spark):
    rows = _rows()
    got = poisreg_irls(spark.createDataFrame(rows, SCHEMA),
                       x1_col="x1", x2_col="x2",
                       count_expr="y", iters=2).head()
    n, b0, b1, b2 = _py_pois(rows)
    assert (got["n"], got["beta0_micro"], got["beta1_micro"],
            got["beta2_micro"]) == (n, b0, b1, b2)
    assert not got["singular"]


def test_planted_rate_direction(spark):
    got = poisreg_irls(spark.createDataFrame(_rows(), SCHEMA),
                       x1_col="x1", x2_col="x2",
                       count_expr="y", iters=2).head()
    # generating slopes were +0.3 / −0.1
    assert got["beta1_micro"] > 100_000
    assert got["beta2_micro"] < 0


def test_collinear_reports_singular(spark):
    rows = [(float(i % 4), float(i % 7), float(2 * (i % 7)))
            for i in range(60)]
    got = poisreg_irls(spark.createDataFrame(rows, SCHEMA),
                       x1_col="x1", x2_col="x2",
                       count_expr="y", iters=2).head()
    assert got["beta1_micro"] is None


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    a = poisreg_irls(df.coalesce(1), x1_col="x1", x2_col="x2",
                     count_expr="y").head()
    b = poisreg_irls(df.repartition(7), x1_col="x1", x2_col="x2",
                     count_expr="y").head()
    assert tuple(a) == tuple(b)
