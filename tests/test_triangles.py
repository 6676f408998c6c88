"""triangle_counts vs brute force."""
from __future__ import annotations

import itertools
import random

from ultraviolet_spark.operators.graph import triangle_counts


def _brute(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    cnt = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for n in (a, b, c):
                cnt[n] += 1
    return cnt


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["n_triangles"]
            for r in triangle_counts(df).collect()}


def test_k4(spark):
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _run(spark, edges)
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # K4: C(3,2)=3 per node


def test_star_no_triangles(spark):
    edges = [(0, i) for i in range(1, 6)]
    got = _run(spark, edges)
    assert set(got.values()) == {0}


def test_random_graph_vs_brute(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(20), rng.randrange(20)) for _ in range(80)]
    # include reversed duplicates and self-loops to test canonicalization
    edges += [(b, a) for a, b in edges[:10]] + [(3, 3), (7, 7)]
    got = _run(spark, edges)
    assert got == _brute(edges)
