"""Connected components (operators/graph.connected_components)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.graph import (
    connected_components,
    connected_components_oracle_sql,
)

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, edges):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "src long, dst long")


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        if u == v:
            continue
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def test_matches_union_find_on_pseudorandom_graph(spark):
    # deterministic LCG graph: 80 nodes, 100 edges, several components
    seed, edges = 12345, []
    for _ in range(100):
        seed = (seed * 1103515245 + 12345) % (2 ** 31)
        u = seed % 80
        seed = (seed * 1103515245 + 12345) % (2 ** 31)
        v = seed % 80
        edges.append((u, v))
    want = _union_find(edges)
    got = {r["node"]: r["comp"]
           for r in connected_components(_mk(spark, edges),
                                         rounds=8).collect()}
    assert got == want


def test_pointer_doubling_beats_diameter(spark):
    # 0-1-2-…-30 chain: plain min-propagation needs 30 rounds; the
    # pointer-doubled reach covers the 30-hop diameter in 5
    edges = [(i, i + 1) for i in range(30)]
    got = connected_components(_mk(spark, edges), rounds=5).collect()
    assert {r["comp"] for r in got} == {0}
    assert len(got) == 31


def test_circulant_components_are_residue_classes(spark):
    # step-6 circulant mod 36 → gcd(6,36)=6 components, each the
    # residue class with its minimum as the canonical label
    edges = [(i, (i + 6) % 36) for i in range(36)]
    got = {r["node"]: r["comp"]
           for r in connected_components(_mk(spark, edges),
                                         rounds=5).collect()}
    assert got == {i: i % 6 for i in range(36)}


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(1, 2), (2, 1), (1, 2), (3, 3), (4, 5)]
    got = {r["node"]: r["comp"]
           for r in connected_components(_mk(spark, edges),
                                         rounds=3).collect()}
    # 3 has only a self-loop → not a graph member (documented)
    assert got == {1: 1, 2: 1, 4: 4, 5: 4}


def test_oracle_sql_replays_identically(spark):
    import duckdb

    edges = [(i, (i * 7 + 3) % 50) for i in range(50)]
    edges += [(i, (i * 13 + 1) % 50) for i in range(0, 50, 2)]
    got = {(r["node"], r["comp"])
           for r in connected_components(_mk(spark, edges),
                                         rounds=4).collect()}
    vals = ", ".join(f"({u}, {v})" for u, v in edges)
    sql = connected_components_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)", rounds=4)
    want = set(duckdb.sql(sql).fetchall())
    assert got == want
