"""Bradley–Terry strengths (operators/ranking.bradley_terry)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.ranking import bradley_terry

pytestmark = pytest.mark.usefixtures("spark")


def _snap(v):
    f = math.floor(abs(v) + 0.5)
    return int(math.copysign(f, v))


def _ref_bt(pairs, rounds=3):
    from collections import Counter
    und = Counter()
    wins = Counter()
    for wi, lo in pairs:
        und[(min(wi, lo), max(wi, lo))] += 1
        wins[wi] += 1
    items = sorted({x for p in und for x in p})
    k = len(items)
    th = {it: 1_000_000 for it in items}
    for _ in range(rounds):
        d = {it: 0 for it in items}
        for (i, j), n in und.items():
            t = _snap(float(n) * 1e12 / float(th[i] + th[j]))
            d[i] += t
            d[j] += t
        raw = {it: _snap(float(wins.get(it, 0)) * 1e12 / float(d[it]))
               for it in items}
        s = sum(raw.values())
        th = {it: _snap(float(raw[it]) * (float(k) * 1e6) / float(s))
              for it in items}
    return th


def _run(spark, pairs, rounds=3):
    df = spark.createDataFrame(pairs, "winner string, loser string")
    return {r["item"]: r for r in bradley_terry(
        df, rounds=rounds).collect()}


PAIRS = ([("a", "b")] * 8 + [("b", "a")] * 2 + [("b", "c")] * 7
         + [("c", "b")] * 3 + [("a", "c")] * 9 + [("c", "a")] * 1)


def test_sequential_reference_equality(spark):
    got = _run(spark, PAIRS)
    want = _ref_bt(PAIRS)
    for it, th in want.items():
        assert got[it]["theta_micro"] == th, it
    assert got["a"]["wins"] == 17 and got["a"]["comparisons"] == 20


def test_ranking_follows_dominance(spark):
    got = _run(spark, PAIRS)
    assert (got["a"]["rank"], got["b"]["rank"], got["c"]["rank"]) \
        == (1, 2, 3)
    assert got["a"]["theta_micro"] > got["b"]["theta_micro"] \
        > got["c"]["theta_micro"]
    # BT is calibrated: P(a beats b) ≈ θa/(θa+θb) ≈ observed 8/10
    pa = got["a"]["theta_micro"] / (got["a"]["theta_micro"]
                                    + got["b"]["theta_micro"])
    assert pa == pytest.approx(0.8, abs=0.08)


def test_never_winner_converges_to_zero(spark):
    pairs = [("a", "z")] * 5 + [("b", "z")] * 5 + [("a", "b")] * 3 \
        + [("b", "a")] * 3
    got = _run(spark, pairs, rounds=3)
    assert got["z"]["wins"] == 0
    assert got["z"]["theta_micro"] < 1000        # → 0, its MLE limit
    assert got["z"]["rank"] == 3


def test_symmetric_items_tie(spark):
    pairs = [("p", "q")] * 5 + [("q", "p")] * 5
    got = _run(spark, pairs)
    assert got["p"]["theta_micro"] == got["q"]["theta_micro"]
    assert got["p"]["rank"] == 1 and got["q"]["rank"] == 2  # id tiebreak


def test_partitioning_invariance(spark):
    import itertools
    pairs = []
    for i, (a, b) in enumerate(itertools.product("abcde", "abcde")):
        if a != b:
            pairs += [(a, b)] * ((i * 7) % 5 + 1)
    df1 = spark.createDataFrame(pairs, "winner string, loser string")
    a = sorted(tuple(r) for r in bradley_terry(
        df1.coalesce(1)).collect())
    b = sorted(tuple(r) for r in bradley_terry(
        df1.repartition(7)).collect())
    assert a == b
