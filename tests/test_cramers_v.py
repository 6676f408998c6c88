"""Cramér's V (operators/stats.cramers_v)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.stats import cramers_v

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in rows], "a string, b string")


def _ref(rows):
    from collections import Counter
    cells = Counter(rows)
    ri = Counter(a for a, _ in rows)
    cj = Counter(b for _, b in rows)
    n = len(rows)
    chi2m = 0
    for a in ri:
        for b in cj:
            nij = cells[(a, b)]
            num = float(n * nij - ri[a] * cj[b])
            chi2m += round(num * num / (n * ri[a] * cj[b]) * 1e6)
    r, c = len(ri), len(cj)
    chi2 = round(chi2m / 1e6, 6)
    mind = min(r - 1, c - 1)
    v = round(math.sqrt(chi2m / 1e6 / (n * mind)), 6) if mind else None
    return chi2, v, r, c


def test_matches_sequential_reference(spark):
    rows = [(f"a{i % 3}", f"b{(i * 7) % 4}") for i in range(90)]
    rows += [("a0", "b0")] * 25          # association mass
    got = cramers_v(_mk(spark, rows), a_col="a", b_col="b").head()
    chi2, v, r, c = _ref(rows)
    assert (got["chi2"], got["v"], got["r"], got["c"]) == (chi2, v, r, c)


def test_perfect_association_v_one(spark):
    rows = [(f"x{i % 4}", f"y{i % 4}") for i in range(80)]
    got = cramers_v(_mk(spark, rows), a_col="a", b_col="b").head()
    assert got["v"] == 1.0


def test_independence_v_near_zero_and_absent_cells_count(spark):
    # exact product structure → chi2 exactly 0
    rows = [(f"a{i % 2}", f"b{j % 3}") for i in range(2)
            for j in range(3) for _ in range(10)]
    got = cramers_v(_mk(spark, rows), a_col="a", b_col="b").head()
    assert got["chi2"] == 0.0 and got["v"] == 0.0
    # a structurally-absent cell must contribute (diagonal design):
    # dropping zero cells would understate chi2 below the v=1 value
    diag = [(f"a{i % 3}", f"b{i % 3}") for i in range(30)]
    got = cramers_v(_mk(spark, diag), a_col="a", b_col="b").head()
    assert got["v"] == 1.0               # only true with completion


def test_degenerate_single_category_null(spark):
    rows = [("only", f"b{i % 3}") for i in range(12)]
    got = cramers_v(_mk(spark, rows), a_col="a", b_col="b").head()
    assert got["v"] is None and got["r"] == 1
