"""logreg_irls: sequential numpy-free reference equality (same
snapping discipline), sign/direction sanity on a planted effect, and
partitioning-invariance of the exact fit."""

from __future__ import annotations

import math

from ultraviolet_spark.operators.mlfit import logreg_irls

SCHEMA = "y int, x1 double, x2 double"


def _py_irls(rows, iters=2):
    data = [(float(y),
             round(x1 * 1e6) / 1e6,
             round(x2 * 1e6) / 1e6) for y, x1, x2 in rows]
    b0m = b1m = b2m = 0
    n = len(data)
    for _ in range(iters):
        S = dict(s11=0, s12=0, s13=0, s22=0, s23=0, s33=0,
                 t1=0, t2=0, t3=0)
        for y, x1, x2 in data:
            eta = (float(b0m) + float(b1m) * x1 + float(b2m) * x2) / 1e6
            mu = 1.0 / (1.0 + math.exp(-eta))
            w = mu * (1.0 - mu)
            z = eta + (y - mu) / w

            def snap(v):
                # Java HALF_UP == away-from-zero on ties
                a = v * 1e6
                f = math.floor(abs(a) + 0.5)
                return int(math.copysign(f, a))

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

        def rnd6(v):
            a = v * 1e6
            f = math.floor(abs(a) + 0.5)
            return int(math.copysign(f, a))

        b0m, b1m, b2m = (rnd6(det0 / det), rnd6(det1 / det),
                         rnd6(det2 / det))
    return n, b0m, b1m, b2m


def _rows():
    rows = []
    for i in range(400):
        x1 = float((i * 17) % 50) / 10.0
        x2 = float(i % 24)
        # planted effect: higher x1 → more positives, deterministic
        y = 1 if (x1 * 7 + (i * 13) % 29) > 20 else 0
        rows.append((y, x1, x2))
    return rows


def test_matches_sequential_reference(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = logreg_irls(df, x1_col="x1", x2_col="x2",
                      label_expr="y = 1").head()
    n, b0, b1, b2 = _py_irls(rows)
    assert (got["n"], got["beta0_micro"], got["beta1_micro"],
            got["beta2_micro"]) == (n, b0, b1, b2)


def test_planted_direction(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = logreg_irls(df, x1_col="x1", x2_col="x2",
                      label_expr="y = 1").head()
    assert got["beta1_micro"] > 0          # x1 drives the label up
    assert abs(got["beta2_micro"]) < abs(got["beta1_micro"])


def test_partitioning_invariance(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    a = logreg_irls(df.coalesce(1), x1_col="x1", x2_col="x2",
                    label_expr="y = 1").head()
    b = logreg_irls(df.repartition(7), x1_col="x1", x2_col="x2",
                    label_expr="y = 1").head()
    assert a.asDict() == b.asDict()
