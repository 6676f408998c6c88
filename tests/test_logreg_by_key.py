"""Per-key IRLS logistic regression (operators/mlfit.logreg_by_key)."""

from __future__ import annotations

import pytest

from tests.test_logreg import _py_irls
from ultraviolet_spark.operators.mlfit import logreg_by_key, logreg_irls

pytestmark = pytest.mark.usefixtures("spark")

SCHEMA = "key string, y int, x1 double, x2 double"


def _rows(seed_shift=0):
    rows = []
    for k, slope in (("a", 0.8), ("b", -0.5), ("c", 0.1)):
        for i in range(120):
            x1 = ((i * 13 + seed_shift) % 40) / 4.0
            x2 = ((i * 7) % 23) / 5.0
            y = 1 if (slope * x1 + 0.3 * x2 + (i % 5) * 0.4) > 2.4 else 0
            rows.append((k, y, float(x1), float(x2)))
    return rows


def test_per_key_equals_pooled_on_each_slice(spark):
    """Fitting key k in the grouped operator must equal running the
    POOLED exact fit on that key's slice alone — same integers."""
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["key"]: r for r in logreg_by_key(
        df, key_col="key", x1_col="x1", x2_col="x2",
        label_expr="y = 1", iters=2).collect()}
    for k in ("a", "b", "c"):
        pooled = logreg_irls(df.filter(df.key == k), x1_col="x1",
                             x2_col="x2", label_expr="y = 1",
                             iters=2).head()
        assert got[k]["n"] == pooled["n"]
        for c in ("beta0_micro", "beta1_micro", "beta2_micro"):
            assert got[k][c] == pooled[c], (k, c)
        assert not got[k]["singular"]


def test_sequential_reference_per_key(spark):
    rows = _rows(seed_shift=3)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["key"]: r for r in logreg_by_key(
        df, key_col="key", x1_col="x1", x2_col="x2",
        label_expr="y = 1", iters=2).collect()}
    for k in ("a", "b", "c"):
        want = _py_irls([(y, x1, x2) for kk, y, x1, x2 in rows
                         if kk == k], iters=2)
        assert (got[k]["n"], got[k]["beta0_micro"],
                got[k]["beta1_micro"], got[k]["beta2_micro"]) == want, k


def test_singular_key_is_isolated(spark):
    rows = _rows()
    # key 'z' has x2 = 2·x1 exactly → collinear → singular, but must
    # not poison keys a/b/c
    rows += [("z", i % 2, float(i % 7), float(2 * (i % 7)))
             for i in range(60)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["key"]: r for r in logreg_by_key(
        df, key_col="key", x1_col="x1", x2_col="x2",
        label_expr="y = 1", iters=2).collect()}
    assert got["z"]["beta1_micro"] is None
    assert all(got[k]["beta1_micro"] is not None for k in "abc")


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    a = sorted(tuple(r) for r in logreg_by_key(
        df.coalesce(1), key_col="key", x1_col="x1", x2_col="x2",
        label_expr="y = 1").collect())
    b = sorted(tuple(r) for r in logreg_by_key(
        df.repartition(7), key_col="key", x1_col="x1", x2_col="x2",
        label_expr="y = 1").collect())
    assert a == b
