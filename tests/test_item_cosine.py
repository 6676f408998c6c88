"""Item-item cosine similarity (operators/funnel.item_cosine)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.funnel import item_cosine

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    return spark.createDataFrame(
        [(int(b), str(i)) for b, i in rows], "b long, i string")


def test_matches_reference_counts(spark):
    rows = []
    for b in range(30):
        rows.append((b, "x"))
        if b % 2 == 0:
            rows.append((b, "y"))
        if b % 3 == 0:
            rows.append((b, "z"))
    got = {(r["item_a"], r["item_b"]): r for r in
           item_cosine(_mk(spark, rows), basket_col="b",
                       item_col="i").collect()}
    r = got[("x", "y")]
    assert (r["n_a"], r["n_b"], r["n_pair"]) == (30, 15, 15)
    assert r["cosine_micro"] == round(15 * 1e6 / math.sqrt(30 * 15))
    r = got[("y", "z")]
    assert r["n_pair"] == 5        # b % 6 == 0
    assert r["cosine_micro"] == round(5 * 1e6 / math.sqrt(15 * 10))


def test_identical_items_cosine_one(spark):
    rows = [(b, i) for b in range(10) for i in ("p", "q")]
    got = item_cosine(_mk(spark, rows), basket_col="b",
                      item_col="i").head()
    assert got["cosine_micro"] == 1_000_000


def test_disjoint_items_absent(spark):
    rows = [(1, "a"), (2, "b")]
    assert item_cosine(_mk(spark, rows), basket_col="b",
                       item_col="i").collect() == []
