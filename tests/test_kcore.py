"""k_core: hand graphs with known cores, fixpoint ≡ fixed-rounds
equivalence, cascade behavior, self-loop/direction handling, and
equality with a brute-force Python peeler on a randomized graph."""

from __future__ import annotations

import random

from ultraviolet_spark.operators.graph import k_core


def _py_kcore(edges, k):
    """Brute-force reference peeler (undirected, self-loops dropped)."""
    und = set()
    for u, v in edges:
        if u != v:
            und.add((u, v))
            und.add((v, u))
    alive = {u for u, _ in und}
    while True:
        deg = {}
        for u, v in und:
            if u in alive and v in alive:
                deg[u] = deg.get(u, 0) + 1
        new = {n for n in alive if deg.get(n, 0) >= k}
        if new == alive:
            break
        alive = new
    deg = {}
    for u, v in und:
        if u in alive and v in alive:
            deg[u] = deg.get(u, 0) + 1
    return {n: deg[n] for n in alive}


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


# triangle (3-core needs deg>=2... it IS the 2-core) + a tail chain
# hanging off it; the chain peels away node by node (cascade)
TRIANGLE_TAIL = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6)]


def test_triangle_with_tail_2core(spark):
    got = {r.node: r.deg
           for r in k_core(_df(spark, TRIANGLE_TAIL), k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_whole_graph_dissolves(spark):
    # a pure chain has no 2-core at all
    got = k_core(_df(spark, [(1, 2), (2, 3), (3, 4)]), k=2).collect()
    assert got == []


def test_self_loops_and_direction_ignored(spark):
    # (a,b) and (b,a) are ONE undirected edge; self-loops add no degree
    edges = [(1, 2), (2, 1), (1, 1), (2, 2), (2, 3), (3, 1)]
    got = {r.node: r.deg for r in k_core(_df(spark, edges), k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_fixed_rounds_equals_fixpoint(spark):
    rng = random.Random(42)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    df = _df(spark, edges)
    fix = sorted(map(tuple, k_core(df, k=3).collect()))
    ten = sorted(map(tuple, k_core(df, k=3, rounds=10).collect()))
    assert fix == ten
    assert fix == sorted(_py_kcore(edges, 3).items())


def test_cascade_needs_multiple_rounds(spark):
    # one peel round is NOT enough on the tail graph: node 5 only drops
    # below k after node 6's removal — a single-round "peel" that
    # reports 4,5 as core members is wrong
    df = _df(spark, TRIANGLE_TAIL)
    one = {r.node for r in k_core(df, k=2, rounds=1).collect()}
    full = {r.node for r in k_core(df, k=2).collect()}
    assert 5 in one and 5 not in full
