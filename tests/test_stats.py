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
