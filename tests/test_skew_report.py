"""Skew diagnostics: closed-form checks on constructed distributions
plus the suggest_salt -> salted-join contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _df(spark, counts: dict[str, int]):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_skew_report_uniform(spark):
    from ultraviolet_spark.operators.skew import skew_report

    r = skew_report(_df(spark, {c: 4 for c in "abcde"}), "k").first()
    assert (r["n_keys"], r["n_rows"], r["max_cnt"]) == (5, 20, 4)
    assert r["gini"] == 0.0          # perfectly equal
    assert r["imbalance"] == 1.0
    assert r["p50_cnt"] == r["p99_cnt"] == 4


def test_skew_report_pathological(spark):
    from ultraviolet_spark.operators.skew import skew_report

    # one hot key with 96 rows, four singletons
    r = skew_report(_df(spark, {"hot": 96, "a": 1, "b": 1,
                                "c": 1, "d": 1}), "k").first()
    assert r["max_share"] == 0.96
    assert r["imbalance"] == 4.8     # 96 / (100/5)
    # Gini closed form: ranks 1..4 are the singletons, rank 5 the hot
    # key -> (2*(1+2+3+4+5*96) - 6*100) / (5*100) = (980-600)/500
    assert r["gini"] == pytest.approx(0.76)
    assert r["p50_cnt"] == 1 and r["p99_cnt"] == 96


def test_skew_report_counts_null_keys(spark):
    from ultraviolet_spark.operators.skew import skew_report

    df = spark.createDataFrame(
        [(None,), (None,), (None,), ("a",)], "k string")
    r = skew_report(df, "k").first()
    assert (r["n_keys"], r["max_cnt"]) == (2, 3)


def test_hot_keys_order_and_share(spark):
    from ultraviolet_spark.operators.skew import hot_keys

    rows = hot_keys(_df(spark, {"x": 6, "y": 3, "z": 1}), "k",
                    top_n=2).collect()
    assert [(r["k"], r["cnt"], r["share"]) for r in rows] == [
        ("x", 6, 0.6), ("y", 3, 0.3)]


def test_suggest_salt_contract(spark):
    from ultraviolet_spark.operators.skew import suggest_salt

    out = {r["k"]: r["n_salts"] for r in
           suggest_salt(_df(spark, {"hot": 25, "warm": 10, "cold": 3}),
                        "k", target_per_key=10).collect()}
    # ceil(25/10)=3, ceil(10/10)=1 (excluded), ceil(3/10)=1 (excluded)
    assert out == {"hot": 3}
    with pytest.raises(ValueError):
        suggest_salt(_df(spark, {"a": 1}), "k", target_per_key=0)


def test_skew_report_matches_brute_force(spark, sf_dir):
    from ultraviolet_spark.operators.skew import skew_report

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    r = skew_report(ev, "user_id").first()
    counts = sorted(
        c for (c,) in ev.groupBy("user_id").count()
        .select(F.col("count")).collect())
    n, tot = len(counts), sum(counts)
    assert r["n_keys"] == n and r["n_rows"] == tot
    assert r["max_cnt"] == counts[-1]
    import math
    assert r["p90_cnt"] == counts[math.ceil(0.9 * n) - 1]
    gini = (2 * sum((i + 1) * c for i, c in enumerate(counts))
            - (n + 1) * tot) / (n * tot)
    assert r["gini"] == pytest.approx(gini, abs=1e-6)
