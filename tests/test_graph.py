"""PageRank: hand-computed tiny graph, exact equality with an
independent Python integer reference, partitioning invariance."""

from __future__ import annotations

from ultraviolet_spark.operators.graph import pagerank


def _py_pagerank(edges, iters=3, damping=85, scale=1_000_000):
    """Slow-but-obvious dict mirror of the integer recurrence."""
    nodes = {n for e in edges for n in e}
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (100 - damping) * scale // 100
    r = {n: scale for n in nodes}
    for _ in range(iters):
        nxt = {n: base for n in nodes}
        for s, d in edges:
            nxt[d] += (r[s] * damping) // (100 * outdeg[s])
        r = nxt
    return r


def test_two_node_chain(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r["node"]: r["rank_micro"] for r in pagerank(e).collect()}
    # hand-computed: B saturates at base + 85% of A's base rank
    assert got == {1: 150_000, 2: 277_500}


def test_matches_python_reference(spark):
    edges = [(i % 13, (i * 7 + 3) % 13) for i in range(40)] + [(5, 5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_micro"]
           for r in pagerank(e, iters=4).collect()}
    assert got == _py_pagerank(edges, iters=4)


def test_partitioning_invariance(spark):
    edges = [(i % 11, (i * 5 + 1) % 11) for i in range(30)]
    e1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    e7 = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    r1 = sorted(map(tuple, pagerank(e1).collect()))
    r7 = sorted(map(tuple, pagerank(e7).collect()))
    assert r1 == r7


def test_damping_zero_is_flat(spark):
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {r["node"]: r["rank_micro"]
           for r in pagerank(e, damping_pct=0).collect()}
    assert got == {1: 1_000_000, 2: 1_000_000, 3: 1_000_000}


# ---------------------------------------------------- redirect chains

def _rr(spark, pairs, **kw):
    from ultraviolet_spark.operators.graph import resolve_redirects

    df = spark.createDataFrame(pairs, "src string, dst string")
    return {r["node"]: (r["final"], r["hops"], r["resolved"])
            for r in resolve_redirects(df, **kw).collect()}


def test_redirect_long_chain_and_hops(spark):
    # 20-hop chain: doubling must cross it in ceil(log2(64)) rounds
    pairs = [(f"n{i}", f"n{i+1}") for i in range(20)]
    got = _rr(spark, pairs)
    for i in range(20):
        assert got[f"n{i}"] == ("n20", 20 - i, True)


def test_redirect_cycle_flagged_not_followed(spark):
    got = _rr(spark, [("a", "b"), ("b", "a"), ("x", "a")])
    # pure cycle members and anything draining INTO the cycle unresolve
    assert got["a"] == (None, None, False)
    assert got["b"] == (None, None, False)
    assert got["x"] == (None, None, False)


def test_redirect_max_hops_cutoff(spark):
    pairs = [(f"m{i}", f"m{i+1}") for i in range(10)]
    got = _rr(spark, pairs, max_hops=4)
    assert got["m8"] == ("m10", 2, True)
    assert got["m0"] == (None, None, False)  # 10 hops > 4


def test_redirect_multi_dst_min_tiebreak(spark):
    got = _rr(spark, [("s", "zz"), ("s", "aa")])
    assert got["s"] == ("aa", 1, True)


# ---------------------------------------------------- HITS

def _py_hits(edges, iters=2, scale=1_000_000):
    """Slow-but-obvious dict mirror of the integer HITS recurrence."""
    nodes = {n for e in edges for n in e}
    n_nodes = len(nodes)

    def renorm(r):
        s = sum(r.values())
        if s == 0:
            return dict(r)
        return {k: (v * n_nodes * scale) // s for k, v in r.items()}

    auth = {n: scale for n in nodes}
    hub = dict(auth)
    for _ in range(iters):
        hub = renorm({n: sum(auth[d] for s_, d in edges if s_ == n)
                      for n in nodes})
        auth = renorm({n: sum(hub[s_] for s_, d in edges if d == n)
                       for n in nodes})
    return hub, auth


def test_hits_matches_python_reference(spark):
    from ultraviolet_spark.operators.graph import hits
    edges = sorted({(i % 13, (i * 7 + 3) % 13) for i in range(40)}
                   | {(5, 5), (1, 12)})
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["hub_micro"], r["auth_micro"])
           for r in hits(e, iters=3).collect()}
    hub, auth = _py_hits(edges, iters=3)
    assert got == {n: (hub[n], auth[n]) for n in hub}


def test_hits_star_graph(spark):
    # hub h points at k sinks: h is the only hub, sinks share authority
    from ultraviolet_spark.operators.graph import hits
    edges = [("h", f"s{i}") for i in range(4)]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: (r["hub_micro"], r["auth_micro"])
           for r in hits(e, iters=2).collect()}
    assert got["h"][0] == 5 * 1_000_000      # all hub mass on h
    assert got["h"][1] == 0                  # nothing links to h
    sink_auths = {got[f"s{i}"][1] for i in range(4)}
    assert sink_auths == {1_250_000}         # N*scale/4 each
    assert all(got[f"s{i}"][0] == 0 for i in range(4))


def test_hits_partitioning_invariance(spark):
    from ultraviolet_spark.operators.graph import hits
    edges = sorted({(i % 11, (i * 5 + 1) % 11) for i in range(30)})
    e1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    e7 = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    assert (sorted(map(tuple, hits(e1).collect()))
            == sorted(map(tuple, hits(e7).collect())))


def test_textrank_hub_beats_leaf(spark, sf_dir):
    """q207 semantics: a token co-occurring with DIVERSE neighbors must
    outrank one that only repeats next to a single partner."""
    from ultraviolet_spark.queries import REGISTRY

    fn = REGISTRY["q207_textrank_keywords"].fn
    top = fn(spark, sf_dir).collect()
    assert len(top) == 20
    ranks = [r["rank_micro"] for r in top]
    assert ranks == sorted(ranks, reverse=True)
    # determinism: same input, same result
    again = fn(spark, sf_dir).collect()
    assert [tuple(r) for r in top] == [tuple(r) for r in again]
