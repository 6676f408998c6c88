"""Cochran's Q + Cronbach's alpha (operators/stats)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import (
    cochrans_q,
    cronbach_alpha,
    mcnemar_test,
)

pytestmark = pytest.mark.usefixtures("spark")


def _ref_q(rows):
    k = len(rows[0])
    T = sum(sum(r) for r in rows)
    R2 = sum(sum(r) ** 2 for r in rows)
    Cs = [sum(r[j] for r in rows) for j in range(k)]
    num = (k - 1) * sum((k * c - T) ** 2 for c in Cs)
    den = k * (k * T - R2)
    return round(num / den, 6) if den else None


def test_cochran_matches_reference(spark):
    rows = [(1, 0, 1), (1, 1, 0), (0, 0, 1), (1, 0, 0), (1, 1, 1),
            (0, 1, 1), (1, 0, 1), (1, 1, 0), (0, 0, 0), (1, 0, 1)]
    df = spark.createDataFrame(
        [tuple(bool(v) for v in r) for r in rows],
        "a boolean, b boolean, c boolean")
    got = cochrans_q(df, cols=["a", "b", "c"]).head()
    assert got["q"] == _ref_q(rows)
    assert list(got["c_totals"]) == [7, 4, 6]


def test_cochran_k2_reduces_to_uncorrected_mcnemar(spark):
    rows = ([(True, False)] * 14 + [(False, True)] * 6
            + [(True, True)] * 10 + [(False, False)] * 5)
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    got = cochrans_q(df, cols=["a", "b"]).head()
    # McNemar WITHOUT continuity correction: (b-c)^2/(b+c)
    assert got["q"] == round((14 - 6) ** 2 / 20, 6)
    m = mcnemar_test(df, a_col="a", b_col="b").head()
    assert got["q"] != m["chi2_cc"]      # cc version differs, by design


def test_cochran_unanimous_null(spark):
    df = spark.createDataFrame([(True, True, True)] * 6,
                               "a boolean, b boolean, c boolean")
    assert cochrans_q(df, cols=["a", "b", "c"]).head()["q"] is None


def _ref_alpha(rows):
    k = len(rows[0])
    ms = [[round(v * 1e6) for v in r] for r in rows]
    n = len(ms)
    item = 0
    for j in range(k):
        s = sum(r[j] for r in ms)
        ss = sum(r[j] ** 2 for r in ms)
        item += n * ss - s * s
    st = sum(sum(r) for r in ms)
    stt = sum(sum(r) ** 2 for r in ms)
    tv = n * stt - st * st
    if tv <= 0:
        return None
    return round(k / (k - 1) * (1 - item / tv), 6)


def test_alpha_matches_reference(spark):
    rows = [(float(i % 5), float(i % 5) + 0.5 * (i % 3),
             float(i % 5) - 0.25 * (i % 2)) for i in range(40)]
    df = spark.createDataFrame(rows, "x0 double, x1 double, x2 double")
    got = cronbach_alpha(df, cols=["x0", "x1", "x2"]).head()
    assert got["alpha"] == _ref_alpha(rows)
    assert got["alpha"] > 0.8            # items genuinely co-move


def test_alpha_independent_items_low(spark):
    rows = [(float(i % 5), float((i * 7 + 3) % 5),
             float((i * 11 + 1) % 5)) for i in range(60)]
    df = spark.createDataFrame(rows, "x0 double, x1 double, x2 double")
    got = cronbach_alpha(df, cols=["x0", "x1", "x2"]).head()
    assert got["alpha"] == _ref_alpha(rows)
    assert got["alpha"] < 0.4


def test_alpha_constant_total_null(spark):
    df = spark.createDataFrame([(1.0, 2.0, 3.0)] * 5,
                               "x0 double, x1 double, x2 double")
    assert cronbach_alpha(df, cols=["x0", "x1", "x2"]).head()["alpha"] \
        is None
