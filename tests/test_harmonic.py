"""Bounded-radius harmonic centrality
(operators/graph.harmonic_centrality)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.graph import (
    harmonic_centrality,
    harmonic_centrality_oracle_sql,
)

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, edges):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "src long, dst long")


def _ref(edges, radius):
    from collections import defaultdict, deque
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    out = {}
    for s in adj:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            x = dq.popleft()
            if dist[x] >= radius:
                continue
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    dq.append(y)
        h = sum(round(1e6 / d) for n, d in dist.items() if d > 0)
        n_reached = sum(1 for d in dist.values() if d > 0)
        out[s] = (n_reached, h)
    return out


def test_matches_bfs_reference(spark):
    seed, edges = 4242, []
    for _ in range(70):
        seed = (seed * 1103515245 + 12345) % (2 ** 31)
        u = seed % 40
        seed = (seed * 1103515245 + 12345) % (2 ** 31)
        v = seed % 40
        edges.append((u, v))
    got = {r["node"]: (r["n_reached"], r["h_micro"])
           for r in harmonic_centrality(_mk(spark, edges),
                                        radius=3).collect()}
    assert got == _ref(edges, 3)


def test_path_graph_weights(spark):
    # path 0-1-2-3-4, radius 3, from node 0: d1=1, d2=1, d3=1
    edges = [(i, i + 1) for i in range(4)]
    got = {r["node"]: r for r in
           harmonic_centrality(_mk(spark, edges), radius=3).collect()}
    assert got[0]["n_reached"] == 3
    assert got[0]["h_micro"] == 1000000 + 500000 + 333333
    # center node 2 reaches everything within 2 hops
    assert got[2]["n_reached"] == 4
    assert got[2]["h_micro"] == 2 * 1000000 + 2 * 500000


def test_disconnected_stays_finite(spark):
    # two components: closeness breaks (infinite distances), harmonic
    # just counts what's reachable
    edges = [(1, 2), (10, 11), (11, 12)]
    got = {r["node"]: r for r in
           harmonic_centrality(_mk(spark, edges), radius=3).collect()}
    assert got[1]["n_reached"] == 1
    assert got[11]["n_reached"] == 2
    assert got[10]["h_micro"] == 1000000 + 500000


def test_oracle_sql_replays_identically(spark):
    import duckdb

    edges = [(i, (i * 11 + 2) % 23) for i in range(23)]
    got = {(r["node"], r["n_reached"], r["h_micro"])
           for r in harmonic_centrality(_mk(spark, edges),
                                        radius=3).collect()}
    vals = ", ".join(f"({u}, {v})" for u, v in edges)
    sql = harmonic_centrality_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)", radius=3)
    want = set(duckdb.sql(sql).fetchall())
    assert got == want
