"""Unbiased Simpson diversity (operators/corpus.simpson_diversity)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.corpus import simpson_diversity

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def test_known_distribution(spark):
    keys = ["a"] * 3 + ["b"] * 2 + ["c"]           # N=6
    got = simpson_diversity(_mk(spark, keys), key_col="k").head()
    # D = (3*2 + 2*1 + 0) / (6*5) = 8/30
    assert got["d"] == round(8 / 30, 6)
    assert got["inv_simpson"] == round(30 / 8, 6)
    assert (got["n"], got["k"]) == (6, 3)


def test_extremes(spark):
    # single category: two random docs ALWAYS share it -> D = 1
    one = simpson_diversity(_mk(spark, ["x"] * 7), key_col="k").head()
    assert one["d"] == 1.0 and one["inv_simpson"] == 1.0
    # all singletons: never share -> D = 0, inverse undefined
    uniq = simpson_diversity(_mk(spark, [f"u{i}" for i in range(5)]),
                             key_col="k").head()
    assert uniq["d"] == 0.0 and uniq["inv_simpson"] is None


def test_effective_number_semantics(spark):
    # 4 equally-likely categories: inverse Simpson ~ 4 (exact for the
    # unbiased form at equal counts: (N(N-1))/(4*m(m-1)) with N=4m)
    keys = [c for c in "abcd" for _ in range(25)]
    got = simpson_diversity(_mk(spark, keys), key_col="k").head()
    assert got["inv_simpson"] == pytest.approx(4.0, rel=0.05)
