"""ANALYZE-style table_stats: exact counts incl. nulls, NDV, min/max."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark


def test_table_stats_exact(spark):
    from ultraviolet_spark.operators.stats import table_stats
    rows = [(1, "a", None), (2, "b", 5.0), (2, None, 7.5), (4, "a", 5.0)]
    df = spark.createDataFrame(rows, "k long, s string, v double")
    got = {r["column"]: r.asDict() for r in table_stats(df).collect()}
    assert got["k"]["n"] == 4 and got["k"]["n_null"] == 0
    assert got["k"]["n_distinct"] == 3
    assert (got["k"]["min_str"], got["k"]["max_str"]) == ("1", "4")
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert got["v"]["n_null"] == 1 and got["v"]["n_distinct"] == 2
    assert got["v"]["min_str"] == "5.0"


def test_table_stats_single_shuffle_plan(spark):
    from ultraviolet_spark.operators.stats import table_stats
    df = spark.range(100).selectExpr("id", "id % 7 AS m")
    stats = table_stats(df)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    # multi-count-distinct plans as Expand + aggregates; no join stages
    assert "Join" not in plan
    assert {r["column"] for r in stats.collect()} == {"id", "m"}


def test_join_cardinality_exact_vs_real_join(spark):
    from ultraviolet_spark.operators.stats import join_cardinality
    a = spark.createDataFrame([(i % 5,) for i in range(40)], "k long")
    b = spark.createDataFrame([(i % 7,) for i in range(21)], "k long")
    got = join_cardinality(a, b, a_key="k").first()
    real = a.join(b, "k").count()
    assert got["join_rows"] == real
    assert got["matching_keys"] == 5        # keys 0..4 exist in both
    # key 0: a has 8, b has 3 -> 24 = max contribution
    assert got["max_key_rows"] == 24


def test_join_cardinality_empty_intersection(spark):
    from ultraviolet_spark.operators.stats import join_cardinality
    a = spark.createDataFrame([(1,)], "k long")
    b = spark.createDataFrame([(2,)], "k long")
    got = join_cardinality(a, b, a_key="k").first()
    assert (got["join_rows"], got["matching_keys"],
            got["max_key_rows"]) == (0, 0, 0)


def test_weighted_median_hand_case(spark):
    from ultraviolet_spark.operators.stats import weighted_median

    rows = [
        # group a: values 1(w3), 2(w1), 10(w1): W=5, crossing at cum 3
        ("a", 1.0, 3), ("a", 2.0, 1), ("a", 10.0, 1),
        # group b: even W ties exactly at the boundary: 2*cum == W
        # picks the LOWER value (1.0, cum 2 of W 4)
        ("b", 1.0, 2), ("b", 5.0, 2),
        # group c: repeated values merge before the window
        ("c", 7.0, 1), ("c", 7.0, 1), ("c", 3.0, 1),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    got = {r.g: (r.w_total, r.weighted_median) for r in weighted_median(
        df, value_col="v", weight_col="w", by="g").collect()}
    assert got == {"a": (5, 1.0), "b": (4, 1.0), "c": (3, 7.0)}


def test_weighted_median_python_reference(spark):
    import random

    from ultraviolet_spark.operators.stats import weighted_median

    rng = random.Random(5)
    rows = [(str(rng.randrange(4)), float(rng.randrange(100)),
             rng.randrange(1, 9)) for _ in range(400)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    got = {r.g: (r.w_total, r.weighted_median) for r in weighted_median(
        df, value_col="v", weight_col="w", by="g").collect()}
    from collections import defaultdict
    acc = defaultdict(lambda: defaultdict(int))
    for g, v, w in rows:
        acc[g][v] += w
    for g, vw in acc.items():
        W = sum(vw.values())
        cum = 0
        for v in sorted(vw):
            cum += vw[v]
            if 2 * cum >= W:
                assert got[g] == (W, v), g
                break


def test_chi2_feature_selection_brute_force(spark):
    from ultraviolet_spark.operators.stats import chi2_feature_selection

    rows = [
        (1, "spam spam buy now"),     # label 1 docs
        (1, "buy cheap now"),
        (1, "spam offer"),
        (0, "meeting notes agenda"),  # label 0 docs
        (0, "notes from the meeting"),
        (0, "agenda buy"),
    ]
    df = spark.createDataFrame(rows, "y long, text string")
    got = {r["token"]: r for r in
           chi2_feature_selection(df, label_col="y", text_col="text",
                                  top_k=100, min_df=1).collect()}

    def brute(tok):
        a = sum(1 for y, t in rows if y == 1 and tok in t.split())
        b = sum(1 for y, t in rows if y == 0 and tok in t.split())
        c, d = 3 - a, 3 - b
        den = (a + b) * (c + d) * (a + c) * (b + d)
        n = 6
        return (a, b, c, d,
                None if den == 0 else float(n) * (float(a * d - b * c)
                                                  * float(a * d - b * c))
                / float(den))

    for tok in ["spam", "buy", "meeting", "notes", "agenda", "now"]:
        a, b, c, d, chi2 = brute(tok)
        r = got[tok]
        assert (r["a"], r["b"], r["c"], r["d"]) == (a, b, c, d)
        assert r["chi2"] == chi2
    # 'spam' is a perfect positive signal within its margin; 'buy'
    # appears both sides and must score lower
    assert got["spam"]["chi2"] > got["buy"]["chi2"]
    # within-doc duplicate ('spam spam') votes once: presence, not tf
    assert got["spam"]["a"] == 2


def test_chi2_all_doc_token_null_margin(spark):
    from ultraviolet_spark.operators.stats import chi2_feature_selection

    df = spark.createDataFrame(
        [(1, "the cat"), (0, "the dog")], "y long, text string")
    got = {r["token"]: r for r in
           chi2_feature_selection(df, label_col="y", text_col="text",
                                  top_k=10, min_df=1).collect()}
    assert got["the"]["chi2"] is None  # present in every doc: zero margin
    assert got["cat"]["chi2"] == 2.0   # perfect separator of n=2


def test_acf_matches_numpy_definition(spark):
    import numpy as np

    from ultraviolet_spark.operators.stats import acf_by_key

    rng_vals = [5, 9, 2, 8, 1, 7, 3, 9, 2, 8, 1, 7]  # deterministic
    rows = [(1, i, i, v) for i, v in enumerate(rng_vals)]
    rows += [(2, i, i, 4) for i in range(5)]          # constant series
    rows += [(3, 0, 0, 6), (3, 1, 1, 2)]              # n=2: only lag 1
    df = spark.createDataFrame(rows, "k long, t long, id long, x long")
    got = {(r["k"], r["lag"]): r for r in
           acf_by_key(df, key_col="k", order_col="t", value_col="x",
                      tiebreak_col="id", max_lag=3).collect()}

    x = np.array(rng_vals, dtype=np.float64)
    n, m = len(x), x.mean()
    c0 = ((x - m) ** 2).sum()
    for lag in (1, 2, 3):
        expect = ((x[:-lag] - m) * (x[lag:] - m)).sum() / c0
        assert abs(got[(1, lag)]["acf"] - expect) < 1e-12
    # constant series: zero variance -> NULL, never a crash
    assert all(got[(2, lag)]["acf"] is None for lag in (1, 2, 3))
    # n=2 emits only lag 1 (lag >= n suppressed)
    assert (3, 1) in got and (3, 2) not in got and (3, 3) not in got
    # biased estimator: 1 cross pair over 2 squared deviations = -0.5
    assert got[(3, 1)]["acf"] == -0.5


def test_ols_trend_matches_numpy(spark):
    import numpy as np

    from ultraviolet_spark.operators.stats import ols_trend_by_key

    xs = [10000, 10001, 10002, 10003, 10004, 10007]
    ys = [5, 7, 6, 9, 11, 14]
    rows = [("a", x, y) for x, y in zip(xs, ys)]
    rows += [("one_pt", 3, 8)]          # single point: NULL slope
    rows += [("const_y", 1, 4), ("const_y", 2, 4)]  # r2 is 0/0: NULL
    df = spark.createDataFrame(rows, "k string, x long, y long")
    got = {r["k"]: r for r in
           ols_trend_by_key(df, key_col="k", x_col="x", y_col="y").collect()}

    slope, intercept = np.polyfit(np.array(xs, float), np.array(ys, float), 1)
    assert abs(got["a"]["slope"] - slope) < 1e-9
    r = np.corrcoef(xs, ys)[0, 1]
    assert abs(got["a"]["r2"] - r * r) < 1e-9
    assert got["one_pt"]["slope"] is None and got["one_pt"]["r2"] is None
    assert got["const_y"]["slope"] == 0.0 and got["const_y"]["r2"] is None
