"""Per-key Theil-Sen robust slope (operators/stats.theil_sen_by_key)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import theil_sen_by_key

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    return spark.createDataFrame(
        [(str(k), float(x), float(y)) for k, x, y in rows],
        "k string, x double, y double")


def _ref(rows):
    from collections import defaultdict
    per = defaultdict(list)
    for k, x, y in rows:
        per[k].append((round(x * 1e6), round(y * 1e6)))
    out = {}
    for k, pts in per.items():
        slopes = []
        for i, (xa, ya) in enumerate(pts):
            for xb, yb in pts:
                if xa < xb:
                    slopes.append(round((yb - ya) * 1e6 / (xb - xa)))
        if not slopes:
            out[k] = (len(pts), 0, None)
            continue
        slopes.sort()
        np_ = len(slopes)
        k1, k2 = (np_ + 1) // 2, (np_ + 2) // 2
        med = int((slopes[k1 - 1] + slopes[k2 - 1]) / 2)
        out[k] = (len(pts), np_, med)
    return out


def test_matches_sequential_reference(spark):
    rows = [("a", i, 2 * i + (i % 3) * 0.5) for i in range(9)]
    rows += [("b", i, 10 - i + (0.7 if i % 2 else 0)) for i in range(6)]
    got = {r["k"]: (r["n"], r["n_pairs"], r["slope_micro"])
           for r in theil_sen_by_key(_mk(spark, rows), x_col="x",
                                     y_col="y", by="k").collect()}
    assert got == _ref(rows)


def test_outlier_robustness_vs_ols(spark):
    # clean slope 1 with two wild outliers: OLS slope is dragged far
    # from 1; Theil-Sen stays on the inlier trend
    pts = [("a", i, float(i)) for i in range(12)]
    pts += [("a", 12, 500.0), ("a", 13, 600.0)]
    got = theil_sen_by_key(_mk(spark, pts), x_col="x", y_col="y",
                           by="k").head()
    assert abs(got["slope_micro"] - 1_000_000) < 120_000
    xs = [x for _, x, _ in pts]
    ys = [y for _, _, y in pts]
    n = len(xs)
    ols = (n * sum(x * y for x, y in zip(xs, ys))
           - sum(xs) * sum(ys)) / (n * sum(x * x for x in xs)
                                   - sum(xs) ** 2)
    assert abs(ols - 1.0) > 2.0     # OLS is wrecked


def test_single_point_and_equal_x_null(spark):
    rows = [("one", 1.0, 5.0), ("same", 2.0, 1.0), ("same", 2.0, 9.0)]
    got = {r["k"]: r for r in
           theil_sen_by_key(_mk(spark, rows), x_col="x", y_col="y",
                            by="k").collect()}
    assert got["one"]["slope_micro"] is None
    assert got["same"]["slope_micro"] is None
    assert got["same"]["n_pairs"] == 0


def test_exact_median_even_pairs(spark):
    # 3 points, 3 pairs (odd) → middle slope exactly
    rows = [("a", 0.0, 0.0), ("a", 1.0, 1.0), ("a", 2.0, 4.0)]
    # slopes: (0,1)=1, (1,2)=3, (0,2)=2 → median 2
    got = theil_sen_by_key(_mk(spark, rows), x_col="x", y_col="y",
                           by="k").head()
    assert got["slope_micro"] == 2_000_000
    assert got["n_pairs"] == 3
