"""Mean reciprocal rank (operators/evalmetrics.mean_reciprocal_rank)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.evalmetrics import mean_reciprocal_rank

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "q string, doc long, score double, rel long")


def test_known_ranks(spark):
    rows = [
        # q1: first relevant at rank 1
        ("q1", 1, 9.0, 1), ("q1", 2, 5.0, 0),
        # q2: first relevant at rank 3
        ("q2", 1, 9.0, 0), ("q2", 2, 8.0, 0), ("q2", 3, 7.0, 1),
        # q3: no relevant at all
        ("q3", 1, 9.0, 0), ("q3", 2, 8.0, 0),
    ]
    got = mean_reciprocal_rank(_mk(spark, rows), query_col="q",
                               score_col="score", label_col="rel",
                               id_col="doc").head()
    assert got["n_queries"] == 3 and got["n_with_hit"] == 2
    # (1 + 1/3 + 0)/3, with 1/3 snapped to 333333 micro
    assert got["rr_sum_micro"] == 1_000_000 + 333_333
    assert got["mrr"] == round((1_000_000 + 333_333) / 3e6, 6)


def test_score_tie_breaks_on_id(spark):
    # equal scores: doc id ascending decides — relevant doc 2 sits at
    # rank 2 behind doc 1
    rows = [("q", 1, 5.0, 0), ("q", 2, 5.0, 1)]
    got = mean_reciprocal_rank(_mk(spark, rows), query_col="q",
                               score_col="score", label_col="rel",
                               id_col="doc").head()
    assert got["rr_sum_micro"] == 500_000


def test_all_miss_zero(spark):
    rows = [("a", 1, 1.0, 0), ("b", 1, 2.0, 0)]
    got = mean_reciprocal_rank(_mk(spark, rows), query_col="q", score_col="score",
                               label_col="rel", id_col="doc").head()
    assert got["mrr"] == 0.0 and got["n_with_hit"] == 0
