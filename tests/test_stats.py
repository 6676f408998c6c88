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
