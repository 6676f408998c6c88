"""Bowker's symmetry test (operators/stats.bowker_test)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import bowker_test, mcnemar_test

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in rows], "a string, b string")


def _ref(rows):
    from collections import Counter
    c = Counter(rows)
    keys = sorted({a for a, _ in rows} | {b for _, b in rows})
    b_micro = 0
    used = 0
    for x in range(len(keys)):
        for y in range(x + 1, len(keys)):
            nij = c[(keys[x], keys[y])]
            nji = c[(keys[y], keys[x])]
            if nij + nji > 0:
                used += 1
                b_micro += round((nij - nji) ** 2 / (nij + nji) * 1e6)
    return used, b_micro


def test_matches_reference_3x3(spark):
    rows = ([("a", "b")] * 12 + [("b", "a")] * 4
            + [("a", "c")] * 7 + [("c", "a")] * 7
            + [("b", "c")] * 3 + [("a", "a")] * 20 + [("c", "c")] * 5)
    got = bowker_test(_mk(spark, rows), a_col="a", b_col="b").head()
    used, bm = _ref(rows)
    assert (got["n_pairs_used"], got["b_micro"]) == (used, bm)
    assert got["k"] == 3
    assert got["n"] == len(rows)


def test_k2_reduces_to_uncorrected_mcnemar(spark):
    rows = [("x", "y")] * 15 + [("y", "x")] * 5 + [("x", "x")] * 10
    got = bowker_test(_mk(spark, rows), a_col="a", b_col="b").head()
    assert got["b"] == round((15 - 5) ** 2 / 20, 6)
    m = mcnemar_test(
        _mk(spark, rows).selectExpr("a = 'x' as pa", "b = 'x' as pb"),
        a_col="pa", b_col="pb").head()
    # McNemar's UNcorrected form equals Bowker at k=2; the cc differs
    assert abs(got["b"] - (abs(m["b"] - m["c"]) ** 2 / 20)) < 1e-9


def test_symmetric_table_zero_and_diagonal_only_null(spark):
    sym = [("a", "b")] * 6 + [("b", "a")] * 6 + [("a", "a")] * 3
    got = bowker_test(_mk(spark, sym), a_col="a", b_col="b").head()
    assert got["b"] == 0.0
    diag = [("a", "a")] * 5 + [("b", "b")] * 5
    got = bowker_test(_mk(spark, diag), a_col="a", b_col="b").head()
    assert got["b"] is None and got["n_pairs_used"] == 0
