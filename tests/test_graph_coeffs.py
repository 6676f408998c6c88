"""Clustering coefficient + degree assortativity (operators/graph)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.graph import (clustering_coefficient,
                                               degree_assortativity)

pytestmark = pytest.mark.usefixtures("spark")


def _edges(spark, pairs):
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs],
                                 "src long, dst long")


def test_clustering_known_graphs(spark):
    # triangle + pendant: 0-1-2 is a triangle, 3 hangs off 0
    tri = _edges(spark, [(0, 1), (1, 2), (0, 2), (0, 3)])
    got = {r["node"]: r for r in clustering_coefficient(tri).collect()}
    assert got[1]["c"] == 1.0 and got[2]["c"] == 1.0
    assert got[0]["c"] == pytest.approx(1 / 3, abs=1e-6)  # d=3, T=1
    assert got[3]["c"] is None                             # degree 1
    # complete K4: every node c = 1
    k4 = _edges(spark, [(a, b) for a in range(4)
                        for b in range(a + 1, 4)])
    assert all(r["c"] == 1.0
               for r in clustering_coefficient(k4).collect())


def test_assortativity_sign(spark):
    # star graph: hub links only leaves -> strongly negative
    star = _edges(spark, [(0, i) for i in range(1, 8)])
    r_star = degree_assortativity(star).head()["r"]
    assert r_star == -1.0
    # two cliques joined by one edge: high-degree nodes mostly link
    # high-degree nodes -> r > r_star and near 0 or positive
    k4a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4b = [(a + 10, b + 10) for a, b in k4a]
    joined = _edges(spark, k4a + k4b + [(0, 10)])
    r_j = degree_assortativity(joined).head()["r"]
    assert r_j > r_star
    # regular graph (cycle): zero degree variance -> NULL
    cyc = _edges(spark, [(i, (i + 1) % 6) for i in range(6)])
    assert degree_assortativity(cyc).head()["r"] is None


def test_reference_pearson(spark):
    import itertools

    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0), (5, 2)]
    und = set(map(lambda p: (min(p), max(p)), pairs))
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in und:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    M = len(xs)
    sx, sxx = sum(xs), sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    want = round((M * sxy - sx * sx) / (M * sxx - sx * sx), 6)
    got = degree_assortativity(_edges(spark, pairs)).head()
    assert got["r"] == want and got["m_und"] == len(und)
