"""Raking / IPF (operators/stats.rake_weights)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ultraviolet_spark.operators.stats import rake_weights

pytestmark = pytest.mark.usefixtures("spark")


def _snap(v):
    a = v
    f = math.floor(abs(a) + 0.5)
    return int(math.copysign(f, a))


def _ref_rake(cells, rt, ct, rounds=2):
    w = {(a, b): n * 1_000_000 for (a, b), n in cells.items()}
    for _ in range(rounds):
        for axis, tgt in ((0, rt), (1, ct)):
            s = {}
            for (a, b), ww in w.items():
                k = (a, b)[axis]
                s[k] = s.get(k, 0) + ww
            for (a, b) in list(w):
                k = (a, b)[axis]
                if s[k] > 0:
                    w[(a, b)] = _snap(float(w[(a, b)])
                                      * (float(tgt[k]) * 1e6)
                                      / float(s[k]))
    return w


def _run(spark, cells, rt, ct, rounds=2):
    cdf = spark.createDataFrame(
        [(a, b, n) for (a, b), n in cells.items()],
        "a string, b string, n long")
    rdf = spark.createDataFrame(list(rt.items()), "a string, t long")
    tdf = spark.createDataFrame(list(ct.items()), "b string, t long")
    out = rake_weights(cdf, rdf, tdf, rounds=rounds).collect()
    return {(r["a"], r["b"]): r["w_micro"] for r in out}


CELLS = {("x", "p"): 10, ("x", "q"): 30, ("y", "p"): 20,
         ("y", "q"): 40, ("z", "p"): 5, ("z", "q"): 0}
RT = {"x": 50, "y": 50, "z": 10}
CT = {"p": 60, "q": 50}


def test_reference_equality(spark):
    got = _run(spark, CELLS, RT, CT)
    want = _ref_rake(CELLS, RT, CT)
    assert got == want


def test_marginals_converge_to_targets(spark):
    got = _run(spark, CELLS, RT, CT, rounds=4)
    rows = {}
    cols = {}
    for (a, b), w in got.items():
        rows[a] = rows.get(a, 0) + w
        cols[b] = cols.get(b, 0) + w
    for a, t in RT.items():
        assert rows[a] / 1e6 == pytest.approx(t, rel=0.02), a
    for b, t in CT.items():
        assert cols[b] / 1e6 == pytest.approx(t, rel=0.02), b


def test_structural_zeros_preserved(spark):
    got = _run(spark, CELLS, RT, CT, rounds=3)
    assert got[("z", "q")] == 0


def test_zero_marginal_guard(spark):
    cells = {("a", "p"): 0, ("a", "q"): 0, ("b", "p"): 10}
    rt = {"a": 5, "b": 10}
    ct = {"p": 10, "q": 5}
    got = _run(spark, cells, rt, ct)
    # row 'a' has zero current marginal with nonzero target: cells
    # stay zero (no division by zero, no invented mass)
    assert got[("a", "p")] == 0 and got[("a", "q")] == 0


def test_partitioning_invariance(spark):
    cdf = spark.createDataFrame(
        [(f"a{i % 5}", f"b{i % 3}", (i * 7) % 13 + 1)
         for i in range(60)], "a string, b string, n long"
    ).groupBy("a", "b").agg(F.sum("n").alias("n"))
    rdf = cdf.groupBy("a").agg((F.sum("n") + 3).alias("t"))
    tdf = cdf.groupBy("b").agg((F.sum("n") + 5).alias("t"))
    x = sorted(tuple(r) for r in rake_weights(
        cdf.coalesce(1), rdf, tdf).collect())
    y = sorted(tuple(r) for r in rake_weights(
        cdf.repartition(7), rdf, tdf).collect())
    assert x == y
