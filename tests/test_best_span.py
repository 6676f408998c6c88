"""best_span — Kadane's maximum-sum contiguous span as window passes.

Hand cases pin the tie policy (earliest end, then longest span via the
earliest prefix-argmin) and the all-negative → NULL-span rule; a brute
force over random inputs proves the window formulation IS Kadane.
"""

from __future__ import annotations

import itertools
import random

import pytest

pytestmark = pytest.mark.spark


def _run(spark, rows):
    from ultraviolet_spark.operators.windows import best_span
    df = spark.createDataFrame(rows, "k long, pos long, sc long")
    out = best_span(df, key_col="k", pos_col="pos", score_col="sc")
    return {r["k"]: r.asDict() for r in out.collect()}


def _brute(scores):
    """All O(n^2) spans; best = max sum, tie → earliest end, tie →
    longest (earliest start).  Returns None when every span is <= 0."""
    best = None
    n = len(scores)
    for en in range(1, n + 1):          # earliest end wins ties first
        for st in range(en, 0, -1):     # then longest span (smallest st)
            s = sum(scores[st - 1:en])
            key = (s, -en, en - st)     # maximize sum, then earliest end,
            if best is None or key > best[0]:   # then longest
                best = (key, (s, st, en))
    s, st, en = best[1]
    return None if s <= 0 else (s, st, en, en - st + 1)


def test_hand_case(spark):
    # scores: 1, -2, 3, -1, 2, -5, 1  → best span [3,5] sum 4
    rows = [(1, p, s) for p, s in enumerate([1, -2, 3, -1, 2, -5, 1], 1)]
    got = _run(spark, rows)[1]
    assert (got["best_sum"], got["start_idx"], got["end_idx"], got["len"]) \
        == (4, 3, 5, 3)
    assert got["n_units"] == 7


def test_all_negative_keeps_nothing(spark):
    rows = [(1, p, s) for p, s in enumerate([-1, -3, -2], 1)]
    got = _run(spark, rows)[1]
    assert got["n_units"] == 3
    assert got["best_sum"] is None and got["start_idx"] is None
    assert got["end_idx"] is None and got["len"] is None


def test_tie_earliest_end_then_longest(spark):
    # 2, -2, 2: spans [1,1] and [3,3] both sum 2 → earliest end wins.
    got = _run(spark, [(1, p, s) for p, s in enumerate([2, -2, 2], 1)])[1]
    assert (got["best_sum"], got["start_idx"], got["end_idx"]) == (2, 1, 1)
    # 1, 1, -2, 2: [1,2] and [4,4] both sum 2 → earliest end → [1,2].
    got = _run(spark, [(2, p, s) for p, s in enumerate([1, 1, -2, 2], 1)])[2]
    assert (got["best_sum"], got["start_idx"], got["end_idx"]) == (2, 1, 2)
    # 0, 2 (prefix-min tie between empty prefix 0 and cum_1=0): the
    # earliest argmin (empty prefix, rn 0) wins → span [1,2], len 2.
    got = _run(spark, [(3, p, s) for p, s in enumerate([0, 2], 1)])[3]
    assert (got["best_sum"], got["start_idx"], got["end_idx"], got["len"]) \
        == (2, 1, 2, 2)


def test_brute_force_equivalence(spark):
    rng = random.Random(227)
    rows, want = [], {}
    for k in range(60):
        n = rng.randint(1, 9)
        scores = [rng.randint(-4, 4) for _ in range(n)]
        rows += [(k, p + 1, s) for p, s in enumerate(scores)]
        want[k] = _brute(scores)
    got = _run(spark, rows)
    for k, exp in want.items():
        g = got[k]
        tup = (None if g["best_sum"] is None else
               (g["best_sum"], g["start_idx"], g["end_idx"], g["len"]))
        assert tup == exp, (k, tup, exp)


def test_single_exchange_plan(spark):
    from ultraviolet_spark.operators.windows import best_span
    df = spark.range(200).selectExpr(
        "id % 10 AS k", "id AS pos", "CAST(id % 5 - 2 AS LONG) AS sc")
    plan = best_span(df, key_col="k", pos_col="pos", score_col="sc") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
