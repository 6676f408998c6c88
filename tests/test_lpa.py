"""label_propagation: hand graphs with known community outcomes,
deterministic tie-breaks, isolated-node behavior, equality with a
brute-force Python replay on a random graph."""

from __future__ import annotations

import random

from ultraviolet_spark.operators.graph import label_propagation


def _py_lpa(edges, rounds):
    und = set()
    for u, v in edges:
        if u != v:
            und.add((u, v))
            und.add((v, u))
    nodes = sorted({u for u, _ in und})
    lab = {n: n for n in nodes}
    for _ in range(rounds):
        new = {}
        for n in nodes:
            cnt = {}
            for u, v in und:
                if u == n:
                    cnt[lab[v]] = cnt.get(lab[v], 0) + 1
            if cnt:
                best = min(cnt, key=lambda l: (-cnt[l], l))
                new[n] = best
            else:
                new[n] = lab[n]
        lab = new
    return lab


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_two_cliques_with_bridge(spark):
    # two triangles joined by one bridge edge: labels converge within
    # each triangle; the bridge must not merge them after 5 rounds
    edges = [(1, 2), (2, 3), (3, 1),
             (10, 11), (11, 12), (12, 10),
             (3, 10)]
    lab = {r.node: r.label
           for r in label_propagation(_df(spark, edges),
                                      rounds=5).collect()}
    assert lab[1] == lab[2] == lab[3]
    assert lab[10] == lab[11] == lab[12]
    assert lab[1] != lab[10]


def test_matches_python_reference(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(80)]
    got = {r.node: r.label
           for r in label_propagation(_df(spark, edges),
                                      rounds=4).collect()}
    assert got == _py_lpa(edges, 4)


def test_tie_breaks_to_smallest_label(spark):
    # node 5 has exactly one neighbor in each of two size-1 labels
    # after round 1 dynamics; with equal counts the SMALLER label wins
    edges = [(5, 1), (5, 2)]
    lab = {r.node: r.label
           for r in label_propagation(_df(spark, edges),
                                      rounds=1).collect()}
    assert lab[5] == 1            # counts tie (1 vs 1) → min label


def test_star_adopts_center_majority(spark):
    # star: leaves all adopt the center's label in round 1 (their only
    # neighbor); center adopts the smallest leaf label
    edges = [(0, i) for i in range(1, 6)]
    lab = {r.node: r.label
           for r in label_propagation(_df(spark, edges),
                                      rounds=1).collect()}
    assert all(lab[i] == 0 for i in range(1, 6))
    assert lab[0] == 1
