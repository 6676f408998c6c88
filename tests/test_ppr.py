"""Personalized PageRank (operators/graph.personalized_pagerank)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.graph import (
    pagerank,
    personalized_pagerank,
)

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, edges):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "src long, dst long")


def _seeds(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "node long")


def _ref(edges, seeds, iters=3, d=85, scale=1_000_000):
    from collections import defaultdict
    out = defaultdict(list)
    nodes = set()
    for u, v in edges:
        out[u].append(v)
        nodes.update((u, v))
    base = (100 - d) * scale // 100
    r = {n: (scale if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        c = defaultdict(int)
        for u, vs in out.items():
            for v in vs:
                c[v] += (r[u] * d) // (100 * len(vs))
        r = {n: (base if n in seeds else 0) + c.get(n, 0)
             for n in nodes}
    return r


def test_matches_sequential_reference(spark):
    edges = [(i, (i * 7 + 3) % 30) for i in range(30)]
    edges += [(i, (i * 11 + 5) % 30) for i in range(0, 30, 2)]
    edges = list(dict.fromkeys(edges))
    seeds = {0, 1, 2}
    got = {r["node"]: r["rank_micro"]
           for r in personalized_pagerank(
               _mk(spark, edges), _seeds(spark, seeds),
               iters=3).collect()}
    assert got == _ref(edges, seeds)


def test_unreachable_nodes_score_zero(spark):
    # two disjoint directed chains; seeds only in the first
    edges = [(1, 2), (2, 3), (10, 11), (11, 12)]
    got = {r["node"]: r["rank_micro"]
           for r in personalized_pagerank(
               _mk(spark, edges), _seeds(spark, [1]),
               iters=3).collect()}
    assert got[10] == got[11] == got[12] == 0
    assert got[1] > 0 and got[2] > 0
    # global pagerank gives every node its teleport base — different
    g = {r["node"]: r["rank_micro"]
         for r in pagerank(_mk(spark, edges), iters=3).collect()}
    assert g[10] > 0


def test_seed_proximity_beats_global_importance(spark):
    # hub 50 is globally central (everyone cites it) but sits three
    # hops from the seed: the seed's immediate neighborhood outranks
    # the global hub in the personalized view
    edges = [(i, 50) for i in range(20)]          # everyone cites 50
    edges += [(100, 101), (101, 102), (102, 50)]   # seed chain → hub
    got = {r["node"]: r["rank_micro"]
           for r in personalized_pagerank(
               _mk(spark, edges), _seeds(spark, [100]),
               iters=8).collect()}
    assert got[101] > got[50] > 0
    g = {r["node"]: r["rank_micro"]
         for r in pagerank(_mk(spark, edges), iters=8).collect()}
    assert g[50] == max(g.values())               # globally 50 wins


def test_seeds_absent_from_graph_ignored(spark):
    edges = [(1, 2), (2, 1)]
    got = {r["node"]: r["rank_micro"]
           for r in personalized_pagerank(
               _mk(spark, edges), _seeds(spark, [1, 999]),
               iters=2).collect()}
    assert set(got) == {1, 2}
    assert got == _ref(edges, {1, 999}, iters=2)
