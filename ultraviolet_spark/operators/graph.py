"""Link-graph operators: deterministic PageRank + HITS (crawl prioritization).

PageRank over the domain outlink graph is the canonical crawl-frontier
scheduler signal.  The implementation is a DataFrame power iteration in
EXACT INTEGER arithmetic (ranks in micro-units, floor division) so the
result is bit-identical regardless of partitioning, executor count or
aggregation order — float summation would be order-dependent and
unverifiable across engines.  The same arithmetic unrolls into plain
SQL, giving the driver an exact DuckDB oracle (q96).

Semantics (unnormalized classic formulation, Page et al. 1999):

    r⁰(v)   = scale                      (1.0 in micro-units)
    rᵏ⁺¹(v) = base + Σ_{u→v} (rᵏ(u)·d) // (100·outdeg(u))

with ``base = ((100-d)·scale)//100`` and damping ``d`` in percent.
Dangling-node mass (nodes with no outlinks) is dropped, the standard
simplification for crawl scheduling where relative order is what
matters.

Scale notes (10^8-domain graph): each iteration is one join on ``src``
(rank × outdeg are co-keyed — a single shuffle) plus one ``groupBy(dst)``
with map-side partial sums; lineage is truncated per iteration via
``localCheckpoint`` so the plan does not grow with iteration count
(same pattern as ``operators.dedup.connected_components``).  Hot
domains (everyone links to google.com) skew the dst-side aggregation,
which partial aggregation already absorbs; the src-side join can be
salted with ``operators.asof`` helpers if a single src dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, *, iters: int = 3, damping_pct: int = 85,
             scale: int = 1_000_000, src: str = "src",
             dst: str = "dst") -> DataFrame:
    """``(node, rank_micro)`` for every node appearing as src or dst.

    ``edges`` is taken as-is (dedupe upstream if multi-edges should not
    count multiple times).  ``rank_micro`` is in units of
    ``1/scale``; divide by ``scale`` for the conventional float rank.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # co-key the edge list with its outdegree once; reused every iteration
    e_deg = e.join(outdeg, "src").localCheckpoint(eager=False)
    base = (100 - damping_pct) * scale // 100

    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iters):
        contribs = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .select(F.col("dst").alias("node"),
                    F.expr(f"(rank * {damping_pct}) div (100 * outdeg)")
                     .alias("c"))
            .groupBy("node").agg(F.sum("c").alias("c")))
        ranks = (nodes.join(contribs, "node", "left")
                 .select("node",
                         (F.lit(base) + F.coalesce(F.col("c"), F.lit(0)))
                         .cast("long").alias("rank"))
                 .localCheckpoint(eager=False))
    return ranks.select("node", F.col("rank").alias("rank_micro"))


def hits(edges: DataFrame, *, iters: int = 2, scale: int = 1_000_000,
         src: str = "src", dst: str = "dst") -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the link graph:
    ``(node, hub_micro, auth_micro)`` for every node.

    Complements :func:`pagerank` for crawl scheduling: authority ranks
    *content* pages (linked-to by many hubs), hub ranks *directory*
    pages (linking to many authorities) — a seed-list generator.

    Exactness: the classic algorithm L2-normalizes each half-step,
    which is float and order-dependent.  Here each half-step instead
    renormalizes the INTEGER score vector to total ``N·scale`` via
    ``r ← (r · N · scale) div S`` computed in DECIMAL(38,0) (DuckDB:
    HUGEINT) — bit-identical across engines and partitionings, and the
    same monotone transformation of the L1-normalized iterate, so
    rankings match the textbook algorithm.  Bound: after renorm
    ``r ≤ N·scale``; a sum step multiplies by ≤ max-degree, the renorm
    multiply adds another ``N·scale`` factor — ≤ 10^36 for a 10^8-node
    graph, inside 38 digits.

    Scale: per half-step one equi-join (edges × scores, co-keyed) and
    one partial-aggregated ``groupBy``; the renorm total is a 1-row agg
    broadcast back (no driver collect).  ``localCheckpoint`` truncates
    lineage per iteration as in :func:`pagerank`.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=False))

    def _renorm(scores: DataFrame) -> DataFrame:
        tot = scores.agg(F.sum("r").alias("__s"), F.count("*").alias("__n"))
        return (scores.crossJoin(F.broadcast(tot))
                .select("node", F.expr(
                    f"CASE WHEN __s = 0 THEN r ELSE CAST((CAST(r AS "
                    f"DECIMAL(38,0)) * __n * {scale}) div __s AS BIGINT) "
                    f"END").alias("r")))

    def _pull(scores: DataFrame, key: str, other: str) -> DataFrame:
        # score(key-side node) = Σ over its edges of score(other side)
        summed = (e.join(scores, e[other] == scores["node"])
                  .groupBy(F.col(key).alias("node"))
                  .agg(F.sum("r").alias("r")))
        full = (nodes.join(summed, "node", "left")
                .select("node", F.coalesce("r", F.lit(0)).alias("r")))
        return _renorm(full)

    auth = nodes.select("node", F.lit(scale).cast("long").alias("r"))
    hub = auth
    for _ in range(iters):
        hub = _pull(auth, "src", "dst").localCheckpoint(eager=False)
        auth = _pull(hub, "dst", "src").localCheckpoint(eager=False)
    return (hub.withColumnRenamed("r", "hub_micro")
            .join(auth.withColumnRenamed("r", "auth_micro"), "node"))


def resolve_redirects(edges: DataFrame, *, src: str = "src",
                      dst: str = "dst",
                      max_hops: int = 64) -> DataFrame:
    """Resolve HTTP-redirect chains to their final landing URL with
    POINTER DOUBLING: ``(node, final, hops, resolved)`` for every URL
    that redirects (appears as ``src``).

    A crawl's redirect table is a functional graph (one outgoing edge
    per src — enforced here by keeping the min dst per src, the
    deterministic tie-break).  Chasing chains one hop per pass would
    take O(chain length) shuffles; composing the map with itself
    (``ptr ← ptr's ptr``) needs only ⌈log₂ max_hops⌉ self-joins, each
    one equi-join shuffle, with ``localCheckpoint`` truncating lineage
    per round (same pattern as ``dedup.connected_components``).  Hop
    counts compose additively (hops(x) ← hops(x) + hops(ptr(x))), so
    the output also reports the true chain length.

    Redirect LOOPS (a→b→a — common crawl pathology) never reach a
    terminal node: after the rounds their pointer still has an
    outgoing edge, so they come back ``resolved=false`` with NULL
    final/hops instead of looping forever.  Chains longer than
    ``max_hops`` are reported the same way (crawlers cap redirects at
    5-30 hops anyway; RFC 9110 recommends such a limit).
    """
    import math

    e = (edges.groupBy(F.col(src).alias("node"))
         .agg(F.min(F.col(dst)).alias("ptr"))
         .withColumn("hops", F.lit(1).cast("long")))
    state = e.localCheckpoint(eager=True)
    rounds = max(1, math.ceil(math.log2(max_hops)))
    for _ in range(rounds):
        b = state.select(F.col("node").alias("__bn"),
                         F.col("ptr").alias("__bp"),
                         F.col("hops").alias("__bh"))
        state = (state.join(b, state["ptr"] == b["__bn"], "left")
                 .select("node",
                         F.coalesce("__bp", "ptr").alias("ptr"),
                         (F.col("hops")
                          + F.coalesce("__bh", F.lit(0))).alias("hops"))
                 .localCheckpoint(eager=True))
    # terminal iff the pointer itself has no outgoing edge
    srcs = e.select(F.col("node").alias("__s"))
    out = (state.join(srcs, state["ptr"] == srcs["__s"], "left")
           .withColumn("resolved",
                       F.col("__s").isNull() & (F.col("hops") <= max_hops))
           .select("node",
                   F.when(F.col("resolved"), F.col("ptr")).alias("final"),
                   F.when(F.col("resolved"), F.col("hops")).alias("hops"),
                   "resolved"))
    return out


def triangle_counts(edges: DataFrame, *, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Exact per-node triangle counts via degree-ordered orientation
    (the classic distributed formulation — Suri & Vassilvitskii 2011
    "Counting Triangles and the Curse of the Last Reducer").

    The input edge list is canonicalized to an undirected simple graph
    (self-loops dropped, both directions collapsed).  Each edge is then
    oriented from the lower to the higher endpoint under the total
    order ``(degree, node)``; every triangle has exactly one node with
    two out-edges in this orientation, and the closing edge always
    points low→high — so

        wedges  = E(u,v) ⋈ E(u,w)  with o(v) < o(w)
        closed  = wedges ⋉ E(v,w)

    counts each triangle exactly ONCE, with plain equi-joins.  The
    orientation is what kills the curse-of-the-last-reducer: a hub of
    degree D contributes O(D²) wedges un-oriented, but oriented only
    pairs of its *higher-ordered* neighbors — total wedge count is
    bounded by m^{3/2} regardless of skew.

    Returns ``(node, n_triangles)`` for every node of the graph
    (0 for triangle-free nodes).
    """
    und = (edges.select(F.least(src, dst).alias("a"),
                        F.greatest(src, dst).alias("b"))
           .filter(F.col("a") != F.col("b")).distinct())
    deg = (und.select(F.col("a").alias("node"))
           .unionAll(und.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count("*").alias("d")))
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    j = und.join(da, "a").join(db, "b")
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    ori = j.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lo_first, F.col("da")).otherwise(F.col("db")).alias("du"),
        F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias("dv"))
    e1 = ori.select(F.col("u"), F.col("v"), F.col("dv").alias("d1"))
    e2 = ori.select(F.col("u"), F.col("v").alias("w"),
                    F.col("dv").alias("d2"))
    wedges = (e1.join(e2, "u")
              .filter((F.col("d1") < F.col("d2")) |
                      ((F.col("d1") == F.col("d2")) &
                       (F.col("v") < F.col("w")))))
    closing = ori.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    per_node = (tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
                .groupBy("node").agg(F.count("*").alias("n_triangles")))
    return (deg.select("node").join(per_node, "node", "left")
            .select("node",
                    F.coalesce("n_triangles", F.lit(0)).cast("long")
                    .alias("n_triangles")))


def k_core(edges: DataFrame, *, k: int, rounds: int | None = None,
           src: str = "src", dst: str = "dst") -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983; the
    standard distributed recipe — Quick et al. 2012 use the same
    synchronous peel in Pregel form): repeatedly drop nodes with
    degree < k until the surviving subgraph has minimum degree ≥ k.
    The k-core is the classic "dense, well-linked hub" signal over a
    domain link graph — spam farms and boilerplate rings concentrate
    in high cores, isolated tails peel away.

    Input edges are DIRECTED rows; they are symmetrized and self-loops
    dropped, so degree means undirected distinct-neighbor count.

    ``rounds=None`` peels to the true fixpoint (a driver loop with one
    bounded ``count()`` per round — the peel depth of real graphs is
    small, and each round's survivor set only shrinks).
    ``rounds=R`` runs exactly R synchronous peel rounds with NO driver
    round-trip — the deterministic form an unrolled SQL oracle can
    replay; it equals the fixpoint whenever R ≥ peel depth (pinned by
    tests that run both modes).

    Returns ``(node, deg)`` — survivors with their degree INSIDE the
    core subgraph.

    Scale notes (100 TB): each round is two semi-joins of the edge set
    against the shrinking survivor frame (AQE broadcasts it once it is
    small — which is immediately, for real k) plus one map-side-
    combined degree count; lineage is truncated per round with
    localCheckpoint in fixpoint mode so the plan does not grow with
    peel depth.  No driver-side graph ever exists."""
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .filter(F.col("u") != F.col("v")))
    und = und.union(und.select(F.col("v").alias("u"),
                               F.col("u").alias("v"))).distinct()
    alive = und.select("u").distinct().withColumnRenamed("u", "node")

    def _deg(a):
        return (und
                .join(a.withColumnRenamed("node", "u"), "u", "semi")
                .join(a.withColumnRenamed("node", "v"), "v", "semi")
                .groupBy("u").agg(F.count("*").cast("long").alias("deg")))

    if rounds is not None:
        for _ in range(rounds):
            # lazy localCheckpoint: truncates the logical plan (each
            # round nests 2 joins + an agg over the previous round —
            # un-truncated, optimization cost doubles per round) while
            # deferring materialization to the final action, so fixed
            # mode still has zero driver round-trips
            alive = (_deg(alive).filter(F.col("deg") >= k)
                     .select(F.col("u").alias("node"))
                     .localCheckpoint(eager=False))
    else:
        n = alive.count()
        while True:
            alive = (_deg(alive).filter(F.col("deg") >= k)
                     .select(F.col("u").alias("node"))
                     .localCheckpoint(eager=True))
            m = alive.count()
            if m == n:
                break
            n = m
    return (_deg(alive)
            .select(F.col("u").alias("node"), "deg")
            .join(alive, "node", "semi"))


def k_core_oracle_sql(edges_sql: str, *, k: int, rounds: int) -> str:
    """Unrolled-SQL replay of :func:`k_core` with ``rounds`` fixed
    peel rounds — the same symmetrize → degree → filter algebra as
    chained CTEs, so a correctness gate can diff the Spark peel
    against an independent engine.  ``edges_sql`` must yield directed
    (src, dst) rows."""
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs per
    # reference, and und/a_i are referenced 2-3 times per round — left
    # inline, the expansion is 3^rounds parquet scans (observed as
    # "Too many open files" at rounds=10)
    parts = [
        f"raw AS MATERIALIZED ({edges_sql})",
        "und AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
        "SELECT src AS u, dst AS v FROM raw WHERE src <> dst "
        "UNION SELECT dst, src FROM raw WHERE src <> dst))",
        "a0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM und)"]
    prev = "a0"
    for i in range(1, rounds + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT e.u, COUNT(*) AS deg "
            f"FROM und e JOIN {prev} x ON e.u = x.node "
            f"JOIN {prev} y ON e.v = y.node GROUP BY e.u)")
        parts.append(
            f"a{i} AS MATERIALIZED "
            f"(SELECT u AS node FROM d{i} WHERE deg >= {k})")
        prev = f"a{i}"
    return ("WITH " + ",\n".join(parts) +
            f",\ndf AS (SELECT e.u, COUNT(*) AS deg FROM und e "
            f"JOIN {prev} x ON e.u = x.node "
            f"JOIN {prev} y ON e.v = y.node GROUP BY e.u)\n"
            f"SELECT u AS node, CAST(deg AS BIGINT) AS deg FROM df "
            f"WHERE u IN (SELECT node FROM {prev})")


def label_propagation(edges: DataFrame, *, rounds: int,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007), made DETERMINISTIC: each round every node adopts the
    label most frequent among its neighbors, ties broken by smallest
    label (the published algorithm breaks ties randomly — useless for
    a verifiable pipeline); labels start as node ids.  Communities in
    a domain link graph are the link-ring / mutual-promotion clusters
    k-core density alone cannot separate.

    Runs exactly ``rounds`` synchronous rounds (synchronous LPA can
    oscillate on bipartite-ish structures, so a fixpoint loop is not
    guaranteed to terminate — fixed rounds is the honest contract; the
    classic mitigation, asynchronous updates, sacrifices determinism).

    Returns ``(node, label)``.

    Scale notes: per round one edge×labels equi-join (labels co-keyed
    with edge dst) + one map-side-combined (node, label) count + one
    argmax window per node; lineage truncated per round with lazy
    localCheckpoint (the k_core lesson: un-truncated, optimization
    cost doubles per round).  Isolated nodes keep their own label via
    the left join."""
    from pyspark.sql import Window

    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .filter(F.col("u") != F.col("v")))
    und = und.union(und.select(F.col("v").alias("u"),
                               F.col("u").alias("v"))).distinct()
    nodes = und.select(F.col("u").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("u").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(rounds):
        counts = (und.join(labels.withColumnRenamed("node", "v"), "v")
                  .groupBy("u", "label").agg(F.count("*").alias("c")))
        winners = (counts.withColumn("__rn", F.row_number().over(w))
                   .filter(F.col("__rn") == 1)
                   .select(F.col("u").alias("node"),
                           F.col("label").alias("__new")))
        labels = (labels.join(winners, "node", "left")
                  .select("node", F.coalesce("__new", "label")
                          .alias("label"))
                  .localCheckpoint(eager=False))
    return labels


def label_propagation_oracle_sql(edges_sql: str, *, rounds: int) -> str:
    """Unrolled-SQL replay of :func:`label_propagation`: identical
    symmetrize → neighbor-label count → (count desc, label asc) argmax
    rounds as MATERIALIZED CTEs (the k_core_oracle_sql lesson: DuckDB
    inlines plain CTEs per reference)."""
    parts = [
        f"raw AS MATERIALIZED ({edges_sql})",
        "und AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
        "SELECT src AS u, dst AS v FROM raw WHERE src <> dst "
        "UNION SELECT dst, src FROM raw WHERE src <> dst))",
        "nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM und)",
        "lab0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)"]
    prev = "lab0"
    for i in range(1, rounds + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT e.u, l.label, COUNT(*) AS c "
            f"FROM und e JOIN {prev} l ON l.node = e.v GROUP BY 1, 2)")
        parts.append(
            f"w{i} AS MATERIALIZED (SELECT u AS node, label FROM "
            f"(SELECT u, label, row_number() OVER (PARTITION BY u "
            f"ORDER BY c DESC, label ASC) AS rn FROM c{i}) WHERE rn = 1)")
        parts.append(
            f"lab{i} AS MATERIALIZED (SELECT p.node, "
            f"COALESCE(w.label, p.label) AS label FROM {prev} p "
            f"LEFT JOIN w{i} w ON w.node = p.node)")
        prev = f"lab{i}"
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT node, label FROM {prev}")


def connected_components(edges: DataFrame, *, rounds: int,
                         src: str = "src", dst: str = "dst") -> DataFrame:
    """Connected components by synchronous min-label propagation WITH
    per-round pointer doubling — the missing fundamental next to
    PageRank/k-core/LPA: every node's label converges to the smallest
    node id in its component, so components get canonical, comparable
    names with no randomness anywhere.

    Plain min-propagation needs diameter rounds (a 10^4-hop crawl
    chain would need 10^4 shuffles); each round here takes the min
    over neighbor labels AND THEN jumps to the label's own current
    label (label(label(n)) ≤ label(n) since labels are node ids and
    only decrease — the Hash-to-Min / pointer-doubling idea), so
    reach doubles per round and 2^rounds ≥ diameter suffices.  Fixed
    ``rounds`` is the honest replayable contract (same as
    label_propagation); un-converged labels are still deterministic
    and the oracle replays the identical schedule.

    Returns ``(node, comp)``; isolated nodes (no surviving edge after
    self-loop removal) are not graph members, same convention as the
    other graph operators.

    Scale notes: per round one edge×labels equi-join + one map-side-
    combined min agg + one labels-by-label jump join — all keyed
    shuffles, no window, no collect; lineage truncated per round with
    lazy localCheckpoint (the k_core lesson).  Labels are 8-byte ids;
    the jump join's build side is the labels frame itself, so every
    round is linear in |E| + |V|.
    """
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .filter(F.col("u") != F.col("v")))
    und = und.union(und.select(F.col("v").alias("u"),
                               F.col("u").alias("v"))).distinct()
    nodes = und.select(F.col("u").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(rounds):
        nm = (und.join(labels.select(F.col("node").alias("v"),
                                     F.col("label").alias("__nl")), "v")
              .groupBy("u").agg(F.min("__nl").alias("__nm")))
        cand = (labels.join(nm.withColumnRenamed("u", "node"),
                            "node", "left")
                .select("node",
                        F.least(F.col("label"),
                                F.coalesce(F.col("__nm"),
                                           F.col("label"))).alias("__c")))
        labels = (cand.join(labels.select(F.col("node").alias("__c2"),
                                          F.col("label").alias("__cl")),
                            cand["__c"] == F.col("__c2"))
                  .select("node", F.least(F.col("__c"), F.col("__cl"))
                          .alias("label"))
                  .localCheckpoint(eager=False))
    return labels.select("node", F.col("label").alias("comp"))


def connected_components_oracle_sql(edges_sql: str, *, rounds: int) -> str:
    """Unrolled-SQL replay of :func:`connected_components`: identical
    symmetrize → neighbor-min → pointer-jump rounds as MATERIALIZED
    CTEs (DuckDB inlines plain CTEs per reference — the
    k_core_oracle_sql lesson)."""
    parts = [
        f"raw AS MATERIALIZED ({edges_sql})",
        "und AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
        "SELECT src AS u, dst AS v FROM raw WHERE src <> dst "
        "UNION SELECT dst, src FROM raw WHERE src <> dst))",
        "nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM und)",
        "lab0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)"]
    prev = "lab0"
    for i in range(1, rounds + 1):
        parts.append(
            f"nm{i} AS MATERIALIZED (SELECT e.u, MIN(l.label) AS nm "
            f"FROM und e JOIN {prev} l ON l.node = e.v GROUP BY e.u)")
        parts.append(
            f"cd{i} AS MATERIALIZED (SELECT p.node, "
            f"LEAST(p.label, COALESCE(m.nm, p.label)) AS c "
            f"FROM {prev} p LEFT JOIN nm{i} m ON m.u = p.node)")
        parts.append(
            f"lab{i} AS MATERIALIZED (SELECT c.node, "
            f"LEAST(c.c, l.label) AS label "
            f"FROM cd{i} c JOIN {prev} l ON l.node = c.c)")
        prev = f"lab{i}"
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT node, label AS comp FROM {prev}")


def link_prediction(edges: DataFrame, *, src: str = "src",
                    dst: str = "dst",
                    max_degree: int | None = None) -> DataFrame:
    """Common-neighbors + Adamic-Adar link prediction over an
    undirected graph — the which-edge-is-missing complement of the
    structural operators (PageRank ranks nodes, components name them;
    this scores node PAIRS): for every pair (u, v) reachable through
    at least one shared neighbor z, cn = |N(u) ∩ N(v)| and
    AA = Σ_z 1/ln(deg z), which discounts promiscuous hubs — a shared
    neighbor of degree 2 is strong evidence, a shared hub of degree
    10⁶ is none (Adamic & Adar 2003).

    Exactness: each wedge contributes the µ-nat integer
    round(10⁶/ln(deg z)) — snapped per neighbor BEFORE the per-pair
    sum, so aa_micro is an order-independent exact integer (the
    snap-before-sum rule); deg z ≥ 2 for any wedge (z touches both u
    and v), so ln is never 0.  ``is_edge`` marks pairs already
    connected (scored anyway: re-ranking known edges is the
    confidence view; filter it for pure prediction).

    Scale notes: wedge count is Σ_z deg(z)² — the hub quadratic every
    wedge enumeration has; ``max_degree`` excludes super-hub centers
    (standard practice: a 10⁶-degree hub contributes ~0 AA weight per
    pair but 10¹² wedges).  One keyed self-join on the center + one
    map-side-combined (u,v) agg; degree frame joined keyed, no
    collect, no window.

    Returns ``(u, v, cn, aa_micro, is_edge)`` with u < v.
    """
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .filter(F.col("u") != F.col("v")))
    und = und.union(und.select(F.col("v").alias("u"),
                               F.col("u").alias("v"))).distinct()
    deg = und.groupBy("u").agg(F.count("*").cast("long").alias("__d"))
    half = (und.select(F.col("u").alias("__z"), F.col("v").alias("__a"))
            .join(deg.select(F.col("u").alias("__z"), "__d"), "__z"))
    if max_degree is not None:
        half = half.filter(F.col("__d") <= int(max_degree))
    # a degree-1 center cannot form a wedge — drop it BEFORE the µ-nat
    # weight so ln(1) = 0 never reaches the division (ANSI raises even
    # on rows a later join would discard)
    half = (half.filter(F.col("__d") >= 2)
            .withColumn(
                "__w",
                F.round(F.lit(1e6) / F.log(F.col("__d").cast("double")))
                .cast("long")))
    left = half.select("__z", F.col("__a").alias("u"), "__w")
    right = half.select("__z", F.col("__a").alias("v"))
    scores = (left.join(right, "__z")
              .filter(F.col("u") < F.col("v"))
              .groupBy("u", "v")
              .agg(F.count("*").cast("long").alias("cn"),
                   F.sum("__w").alias("aa_micro")))
    return (scores.join(und.withColumn("__e", F.lit(True)),
                        ["u", "v"], "left")
            .select("u", "v", "cn", "aa_micro",
                    F.coalesce(F.col("__e"), F.lit(False))
                    .alias("is_edge")))


def harmonic_centrality(edges: DataFrame, *, radius: int,
                        src: str = "src", dst: str = "dst") -> DataFrame:
    """Bounded-radius harmonic centrality — the distance view the
    degree/PageRank/component operators don't give: H_R(u) =
    Σ_{v: 0<dist(u,v)≤R} 1/dist(u,v), the centrality that handles
    disconnected graphs where closeness centrality breaks (unreachable
    nodes contribute 0, not ∞).

    Exact multi-source BFS by unrolled rounds: frontier_d holds the
    pairs at EXACTLY distance d (next frontier = neighbors of the
    current one, anti-joined against everything already reached);
    each distance class contributes the µ-integer round(10⁶/d) per
    reached node, so h_micro = Σ_d n_d·round(10⁶/d) is exact integer
    arithmetic — order-independent, engine-exact.

    Scale notes: the state is the reached-pair set — O(Σ_u |N_R(u)|),
    the standard ball-growth cost of any exact distance sweep; keep
    ``radius`` small (2–4, the local-centrality regime) on dense
    graphs.  Per round one keyed join + one distinct + one anti-join,
    lineage truncated with lazy localCheckpoint.

    Returns ``(node, n_reached, h_micro)``.
    """
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .filter(F.col("u") != F.col("v")))
    und = und.union(und.select(F.col("v").alias("u"),
                               F.col("u").alias("v"))).distinct()
    frontier = und                      # pairs at distance exactly 1
    reached = und                       # all pairs with dist ≤ current
    per_d = [frontier.groupBy("u").agg(
        F.count("*").cast("long").alias("__n"))
        .withColumn("__w", F.lit(round(1e6 / 1)).cast("long"))]
    for d in range(2, int(radius) + 1):
        nxt = (frontier.join(und.select(F.col("u").alias("v"),
                                        F.col("v").alias("w")), "v")
               .select("u", F.col("w").alias("v"))
               .filter(F.col("u") != F.col("v"))
               .distinct()
               .join(reached, ["u", "v"], "left_anti")
               .localCheckpoint(eager=False))
        reached = reached.union(nxt).localCheckpoint(eager=False)
        frontier = nxt
        per_d.append(frontier.groupBy("u").agg(
            F.count("*").cast("long").alias("__n"))
            .withColumn("__w", F.lit(round(1e6 / d)).cast("long")))
    from functools import reduce
    stacked = reduce(lambda a, b: a.union(b), per_d)
    return (stacked.groupBy(F.col("u").alias("node"))
            .agg(F.sum("__n").cast("long").alias("n_reached"),
                 F.sum(F.col("__n") * F.col("__w")).cast("long")
                 .alias("h_micro")))


def harmonic_centrality_oracle_sql(edges_sql: str, *,
                                   radius: int) -> str:
    """Unrolled-SQL replay of :func:`harmonic_centrality`: identical
    symmetrize → per-distance frontier (anti-join against reached) →
    weighted count rounds as MATERIALIZED CTEs."""
    parts = [
        f"raw AS MATERIALIZED ({edges_sql})",
        "und AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
        "SELECT src AS u, dst AS v FROM raw WHERE src <> dst "
        "UNION SELECT dst, src FROM raw WHERE src <> dst))",
        "f1 AS MATERIALIZED (SELECT u, v FROM und)",
        "r1 AS MATERIALIZED (SELECT u, v FROM und)"]
    counts = [f"SELECT u, CAST(COUNT(*) AS BIGINT) AS n, "
              f"CAST({round(1e6 / 1)} AS BIGINT) AS w FROM f1 GROUP BY u"]
    prev_f, prev_r = "f1", "r1"
    for d in range(2, int(radius) + 1):
        parts.append(
            f"f{d} AS MATERIALIZED (SELECT DISTINCT f.u, e.v "
            f"FROM {prev_f} f JOIN und e ON e.u = f.v "
            f"WHERE f.u <> e.v AND NOT EXISTS "
            f"(SELECT 1 FROM {prev_r} r WHERE r.u = f.u AND r.v = e.v))")
        parts.append(
            f"r{d} AS MATERIALIZED (SELECT u, v FROM {prev_r} "
            f"UNION ALL SELECT u, v FROM f{d})")
        counts.append(
            f"SELECT u, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST({round(1e6 / d)} AS BIGINT) AS w "
            f"FROM f{d} GROUP BY u")
        prev_f, prev_r = f"f{d}", f"r{d}"
    stacked = " UNION ALL ".join(counts)
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT u AS node, CAST(SUM(n) AS BIGINT) AS n_reached, "
            f"CAST(SUM(n * w) AS BIGINT) AS h_micro "
            f"FROM ({stacked}) GROUP BY u")


def personalized_pagerank(edges: DataFrame, seeds: DataFrame, *,
                          iters: int = 3, damping_pct: int = 85,
                          scale: int = 1_000_000, src: str = "src",
                          dst: str = "dst",
                          seed_col: str = "node") -> DataFrame:
    """Personalized PageRank — :func:`pagerank`'s teleport mass goes
    to EVERY node; here it returns to a seed set, so the ranking
    answers "important RELATIVE TO these pages" (topic-focused crawl
    frontiers, related-page discovery from a trusted whitelist)
    instead of global importance.  Nodes unreachable from the seeds
    score exactly 0 (pinned) — the property global PageRank cannot
    have.

        r⁰(v)   = scale · [v ∈ S]
        rᵏ⁺¹(v) = [v ∈ S]·base + Σ_{u→v} (rᵏ(u)·d) // (100·outdeg u)

    with ``base = ((100−d)·scale·|S|) // (100·|S|)`` …simplified to
    the same integer base as the global operator, paid only at seed
    nodes.  Same exact integer micro-unit arithmetic, floor division,
    per-iteration localCheckpoint; dangling mass dropped (the
    pagerank convention).

    ``seeds`` is a one-column DataFrame (``seed_col``) — broadcast
    into the rank frame, never collected.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    sd = seeds.select(F.col(seed_col).alias("node")).distinct() \
        .withColumn("__is_seed", F.lit(True))
    nodes = (nodes.join(F.broadcast(sd), "node", "left")
             .select("node", F.coalesce("__is_seed", F.lit(False))
                     .alias("__s"))
             .localCheckpoint(eager=False))
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    e_deg = e.join(outdeg, "src").localCheckpoint(eager=False)
    base = (100 - damping_pct) * scale // 100

    ranks = nodes.select(
        "node", "__s",
        F.when(F.col("__s"), F.lit(scale)).otherwise(F.lit(0))
        .cast("long").alias("rank"))
    for _ in range(iters):
        contribs = (
            e_deg.join(ranks.select("node", "rank"),
                       e_deg["src"] == F.col("node"))
            .select(F.col("dst").alias("node"),
                    F.expr(f"(rank * {damping_pct}) div (100 * outdeg)")
                    .alias("c"))
            .groupBy("node").agg(F.sum("c").alias("c")))
        ranks = (nodes.join(contribs, "node", "left")
                 .select("node", "__s",
                         (F.when(F.col("__s"), F.lit(base))
                          .otherwise(F.lit(0))
                          + F.coalesce(F.col("c"), F.lit(0)))
                         .cast("long").alias("rank"))
                 .localCheckpoint(eager=False))
    return ranks.select("node", F.col("rank").alias("rank_micro"))


def clustering_coefficient(edges: DataFrame, *, src: str = "src",
                           dst: str = "dst") -> DataFrame:
    """Per-node local clustering coefficient c = 2T/(d(d−1)) — how
    close each node's neighborhood is to a clique, the community-
    density signal on top of :func:`triangle_counts`' raw T (a hub
    with many triangles can still be locally sparse; c normalizes by
    the d-choose-2 possible closures).  Degree-1 nodes (no possible
    closure) report NULL c, matching the convention that they carry
    no clustering information.

    Exactness: T and d are the exact integer outputs of the
    degree-ordered triangle machinery and one canonicalized degree
    count; c is one double division of exact integers, rounded 6.
    Scale: inherits triangle_counts' m^{3/2} wedge bound; the degree
    join reuses the canonical undirected frame.

    Output: (node, d, n_triangles, c).
    """
    und = (edges.select(F.least(src, dst).alias("a"),
                        F.greatest(src, dst).alias("b"))
           .filter(F.col("a") != F.col("b")).distinct())
    deg = (und.select(F.col("a").alias("node"))
           .unionAll(und.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count("*").cast("long").alias("d")))
    tri = triangle_counts(edges, src=src, dst=dst)
    j = deg.join(tri, "node", "left").withColumn(
        "n_triangles", F.coalesce("n_triangles", F.lit(0).cast("long")))
    c = F.when(F.col("d") >= 2, F.round(
        (2 * F.col("n_triangles")).cast("double")
        / F.when(F.col("d") * (F.col("d") - 1) != 0,
                 (F.col("d") * (F.col("d") - 1)).cast("double")), 6))
    return j.select("node", "d", "n_triangles", c.alias("c"))


def degree_assortativity(edges: DataFrame, *, src: str = "src",
                         dst: str = "dst") -> DataFrame:
    """Newman degree assortativity r — ONE number for "do hubs link
    to hubs?": the Pearson correlation of endpoint degrees over the
    DIRECTED doubling of the canonical undirected edge list (each
    edge contributes (d_u,d_v) and (d_v,d_u), the standard
    convention, which makes the two marginals identical so a single
    (Sx, Sxx, Sxy) triple suffices):

        r = (M·Sxy − Sx²) / (M·Sxx − Sx²),   M = 2m

    Social graphs run positive, the web and infrastructure graphs
    negative (hubs link leaves) — pinned both ways in tests.

    Exactness: degrees are exact integer counts; the three sums
    accumulate in DECIMAL(38,0) (Σd² over M edges crosses int64 at
    web scale) and r is one double division.  Regular graphs (zero
    degree variance) report NULL r.  Scale: one degree agg + two
    broadcast-joinable degree lookups + one M-row agg; no wedges.

    Output one row: (m_und, r).
    """
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    nz = lambda den: F.when(den != 0, den)  # noqa: E731
    und = (edges.select(F.least(src, dst).alias("a"),
                        F.greatest(src, dst).alias("b"))
           .filter(F.col("a") != F.col("b")).distinct())
    deg = (und.select(F.col("a").alias("node"))
           .unionAll(und.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count("*").cast("long").alias("d")))
    dup = und.unionAll(und.select(F.col("b").alias("a"),
                                  F.col("a").alias("b")))
    j = (dup.join(deg.select(F.col("node").alias("a"),
                             F.col("d").alias("du")), "a")
         .join(deg.select(F.col("node").alias("b"),
                          F.col("d").alias("dv")), "b"))
    agg = j.agg(
        F.count("*").cast("long").alias("__M"),
        F.sum(d38(F.col("du"))).alias("__sx"),
        F.sum(d38(F.col("du")) * d38(F.col("du"))).alias("__sxx"),
        F.sum(d38(F.col("du")) * d38(F.col("dv"))).alias("__sxy"))
    num = d38(F.col("__M")) * F.col("__sxy") - F.col("__sx") * F.col("__sx")
    den = d38(F.col("__M")) * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    r = F.when(den != 0, F.round(
        num.cast("double") / nz(den.cast("double")), 6))
    return agg.select(F.expr("CAST(__M div 2 AS BIGINT)").alias("m_und"),
                      r.alias("r"))


def rich_club(edges: DataFrame, *, thresholds: list[int],
              src: str = "src", dst: str = "dst") -> DataFrame:
    """Rich-club coefficient φ(k) per degree threshold — do the
    high-degree domains preferentially link to EACH OTHER, on top of
    what their degrees already force?  The hub-subgraph density view
    next to :func:`degree_assortativity` (one global correlation) and
    :func:`k_core` (membership): for each k in the caller's
    ``thresholds``,

        φ(k) = 2·E_k / (N_k·(N_k − 1))

    with N_k = #nodes of degree > k and E_k = #undirected edges with
    BOTH endpoints of degree > k.  φ rising with k = an oligarchy of
    interlinked hubs; flat/falling = hubs are mere broadcasters.

    Exactness: N_k, E_k are exact integer counts per threshold; φ is
    one double division.  N_k < 2 → NULL φ (no possible edge).

    Scale: one degree agg + two degree lookups on the canonical
    undirected edge list, then one broadcast cross with the
    |thresholds|-row literal frame (metadata-sized) and two
    map-side-combined aggs keyed by k.  Output per threshold:
    (k, n_k, e_k, phi).
    """
    nz = lambda den: F.when(den != 0, den)  # noqa: E731
    spark = edges.sparkSession
    ks = sorted(set(int(k) for k in thresholds))
    tf = spark.createDataFrame([(k,) for k in ks], "k int")
    und = (edges.select(F.least(src, dst).alias("a"),
                        F.greatest(src, dst).alias("b"))
           .filter(F.col("a") != F.col("b")).distinct())
    deg = (und.select(F.col("a").alias("node"))
           .unionAll(und.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count("*").cast("long").alias("d")))
    nk = (deg.crossJoin(F.broadcast(tf))
          .groupBy("k")
          .agg(F.sum(F.when(F.col("d") > F.col("k"), 1).otherwise(0))
               .cast("long").alias("n_k")))
    j = (und.join(deg.select(F.col("node").alias("a"),
                             F.col("d").alias("da")), "a")
         .join(deg.select(F.col("node").alias("b"),
                          F.col("d").alias("db")), "b"))
    ek = (j.crossJoin(F.broadcast(tf))
          .groupBy("k")
          .agg(F.sum(F.when((F.col("da") > F.col("k"))
                            & (F.col("db") > F.col("k")), 1)
                     .otherwise(0)).cast("long").alias("e_k")))
    out = nk.join(ek, "k")
    phi = F.when(F.col("n_k") >= 2, F.round(
        (2 * F.col("e_k")).cast("double")
        / nz((F.col("n_k") * (F.col("n_k") - 1)).cast("double")), 6))
    return out.select("k", "n_k", "e_k", phi.alias("phi"))


def partition_modularity(edges: DataFrame, parts: DataFrame, *,
                         src: str = "src", dst: str = "dst",
                         node_col: str = "node",
                         part_col: str = "community") -> DataFrame:
    """Newman modularity Q of a GIVEN partition — the quality score
    every community detector optimizes, exposed directly so any
    labelling (label_propagation's output, a TLD grouping, a crawl
    shard map) can be graded on the same scale:

        Q = Σ_c [ e_c/m − (d_c / 2m)² ]
          = Σ_c (4m·e_c − d_c²)  /  4m²

    (e_c intra-community undirected edges, d_c total degree of c's
    nodes, m total undirected edges).  The second form is the
    exactness contract: every per-community numerator is an exact
    DECIMAL(38,0) integer, their sum is order-independent, and Q is
    ONE double division — no per-community float folds.  Unassigned
    nodes form implicit singleton communities (their d_c² still
    subtracts, the standard convention via a COALESCE to a
    per-node sentinel).  m = 0 → NULL.

    Scale: one degree agg + two partition lookups on the edge list +
    one community agg; partition frame joins on node (broadcast when
    small).  Output one row: (m, n_communities, q_modularity).
    """
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    nz = lambda den: F.when(den != 0, den)  # noqa: E731
    und = (edges.select(F.least(src, dst).alias("a"),
                        F.greatest(src, dst).alias("b"))
           .filter(F.col("a") != F.col("b")).distinct())
    deg = (und.select(F.col("a").alias("node"))
           .unionAll(und.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count("*").cast("long").alias("d")))
    p = parts.select(F.col(node_col).alias("node"),
                     F.col(part_col).cast("string").alias("__c"))
    labelled = (deg.join(p, "node", "left")
                .withColumn("__c", F.coalesce(
                    F.col("__c"),
                    F.concat(F.lit("__singleton_"),
                             F.col("node").cast("string")))))
    dc = labelled.groupBy("__c").agg(F.sum("d").cast("long").alias("dc"))
    ea = (und.join(labelled.select(F.col("node").alias("a"),
                                   F.col("__c").alias("__ca")), "a")
          .join(labelled.select(F.col("node").alias("b"),
                                F.col("__c").alias("__cb")), "b"))
    ec = (ea.filter(F.col("__ca") == F.col("__cb"))
          .groupBy(F.col("__ca").alias("__c"))
          .agg(F.count("*").cast("long").alias("ec")))
    m = und.agg(F.count("*").cast("long").alias("m"))
    per_c = (dc.join(ec, "__c", "left")
             .withColumn("ec", F.coalesce("ec", F.lit(0).cast("long")))
             .crossJoin(F.broadcast(m)))
    num_c = (F.lit(4).cast("decimal(38,0)") * d38(F.col("m"))
             * d38(F.col("ec")) - d38(F.col("dc")) * d38(F.col("dc")))
    agg = per_c.agg(F.max("m").alias("m"),
                    F.count("*").cast("long").alias("n_communities"),
                    F.sum(num_c).alias("__num"))
    den = F.lit(4).cast("decimal(38,0)") * d38(F.col("m")) * d38(F.col("m"))
    qm = F.when(F.col("m") > 0, F.round(
        F.col("__num").cast("double") / nz(den.cast("double")), 6))
    return agg.select("m", "n_communities", qm.alias("q_modularity"))
