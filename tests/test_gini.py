"""Gini concentration (operators/stats.gini_concentration)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import gini_concentration

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, v double")


def _ref_gini(vals):
    vm = sorted(round(v * 1e6) for v in vals)
    n, s = len(vm), sum(vm)
    rs = sum((i + 1) * x for i, x in enumerate(vm))
    gini = 2.0 * rs / (n * s) - (n + 1.0) / n
    top = sum(vm[n - n // 10:]) if n // 10 else 0
    return round(gini, 6), round(top / s, 6)


def test_reference_equality(spark):
    vals = [((i * 37) % 50) / 3.0 + 0.5 for i in range(100)]
    got = gini_concentration(_mk(spark, vals), value_col="v",
                             id_col="id").head()
    g, t = _ref_gini(vals)
    assert got["gini"] == g and got["top10_share"] == t
    assert got["n"] == 100


def test_perfect_equality_is_zero(spark):
    got = gini_concentration(_mk(spark, [5.0] * 40), value_col="v",
                             id_col="id").head()
    assert got["gini"] == 0.0
    assert got["top10_share"] == pytest.approx(0.1, abs=1e-6)


def test_total_concentration_approaches_one(spark):
    vals = [0.0] * 99 + [100.0]
    got = gini_concentration(_mk(spark, vals), value_col="v",
                             id_col="id").head()
    assert got["gini"] == pytest.approx(0.99, abs=1e-6)
    assert got["top10_share"] == 1.0


def test_negative_values_rejected_loudly(spark):
    got = gini_concentration(_mk(spark, [1.0, -2.0, 3.0]),
                             value_col="v", id_col="id").head()
    assert got["gini"] is None and got["top10_share"] is None
    assert got["n"] == 3


def test_partitioning_invariance(spark):
    vals = [((i * 13) % 29) / 2.0 for i in range(150)]
    df = _mk(spark, vals)
    a = gini_concentration(df.coalesce(1), value_col="v",
                           id_col="id").head()
    b = gini_concentration(df.repartition(7), value_col="v",
                           id_col="id").head()
    assert tuple(a) == tuple(b)
