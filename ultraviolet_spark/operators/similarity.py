"""Similarity search over embedding columns (array<float>).

* cosine_sim / cosine_topk — exact brute-force baseline, pure Catalyst
  expressions (zip_with + aggregate fold → JVM codegen, no Python).
  Oracle-checkable against DuckDB list functions.
* knn_join — exact k-NN of many queries via crossJoin + window top-k
  (broadcast the query side).
* lsh_ann_topk — the scale path: random-hyperplane (sign) LSH buckets +
  multiprobe re-rank.  Candidate generation shuffles only (bucket)
  keys; exact distances computed on candidates only.

Scale notes (100 TB): brute force is O(N) per query with a broadcast of
the query vectors — right up to ~10^4 queries; beyond that, LSH buckets
cut the scanned fraction to bands/2^bits.  All vector math on the LSH
path is one numpy matmul per Arrow batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    """Sequential left-fold dot product in double — same operation order
    as the SQL oracle's list_dot_product, so results match bitwise."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_sim(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(df: DataFrame, query_vec: list[float], *, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_id: int | None = None) -> DataFrame:
    """Exact top-k by cosine to one query vector.  Catalyst plans this
    as scan → project (codegen) → TakeOrderedAndProject: no shuffle of
    the data, only a k-row reduction to the driver."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = df.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return out.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def knn_join(queries: DataFrame, corpus: DataFrame, *, k: int = 5,
             q_id: str = "q_id", c_id: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Exact k-NN for every query row: broadcast(queries) × corpus →
    per-query window top-k.  Shuffle = one hash exchange on q_id."""
    from pyspark.sql import Window

    qd = queries.select(F.col(q_id), F.col(vec_col).alias("__qv"))
    pairs = corpus.crossJoin(F.broadcast(qd)).select(
        F.col(q_id), F.col(c_id),
        F.round(cosine_sim(F.col(vec_col), F.col("__qv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(c_id))
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k).drop("__rn")
    )


def cosine_dup_pairs(df: DataFrame, *, threshold: float = 0.9,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     use_lsh: bool = False, bits: int = 8, tables: int = 16,
                     seed: int = 7) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ τ).

    ``use_lsh=False``: exact all-pairs — the small-scale oracle path
    (O(n²), broadcast one side).  ``use_lsh=True``: the 100 TB path —
    candidates share ≥1 random-hyperplane bucket (shuffle on uniform
    bucket keys only), then exact-cosine verify on candidates; recall
    is governed by (bits, tables) like lsh_ann_topk."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    if use_lsh:
        sig = hyperplane_signatures(df, dim=len(df.select(vec_col).head()[0]),
                                    bits=bits, tables=tables, seed=seed,
                                    id_col=id_col, vec_col=vec_col)
        sa = sig.select(F.col(id_col).alias("id_a"), "table", "bucket")
        sb = sig.select(F.col(id_col).alias("id_b"), "table", "bucket")
        cand = (sa.join(sb, on=["table", "bucket"])
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b").distinct())
        pairs = cand.join(a, "id_a").join(b, "id_b")
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    sim = cosine_sim(F.col("__va"), F.col("__vb"))
    return (
        pairs.withColumn("__sim", sim)
        .filter(F.col("__sim") >= threshold)
        .select("id_a", "id_b", F.round("__sim", 6).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# ---------------------------------------------------------------------------

def hyperplane_signatures(df: DataFrame, *, dim: int, bits: int = 16,
                          tables: int = 8, seed: int = 7,
                          id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, table, bucket): random-hyperplane sign LSH.  One numpy
    matmul (batch × dim @ dim × tables·bits) per Arrow batch."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, tables * bits))
    weights = (1 << np.arange(bits, dtype=np.uint64))

    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("table", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)  # (B, dim)
            signs = (V @ planes) > 0                                   # (B, T*bits)
            signs = signs.reshape(len(pdf), tables, bits)
            buckets = (signs * weights).sum(axis=2).astype(np.int64)   # (B, T)
            ids = np.repeat(pdf[id_col].to_numpy(), tables)
            yield pd.DataFrame({
                id_col: ids,
                "table": np.tile(np.arange(tables, dtype=np.int32), len(pdf)),
                "bucket": buckets.ravel(),
            })

    return df.select(id_col, vec_col).mapInPandas(gen, schema=schema)


def lsh_ann_topk(df: DataFrame, query_vec: list[float], *, k: int = 10,
                 bits: int = 16, tables: int = 8, seed: int = 7,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 exclude_id: int | None = None) -> DataFrame:
    """Approximate top-k: scan only vectors sharing ≥1 LSH bucket with
    the query, exact-rerank those.  Recall vs cosine_topk asserted in
    tests/test_similarity.py."""
    dim = len(query_vec)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, tables * bits))
    weights = (1 << np.arange(bits, dtype=np.uint64))
    qsigns = (np.asarray(query_vec, dtype=np.float64) @ planes) > 0
    qbuckets = (qsigns.reshape(tables, bits) * weights).sum(axis=1).astype(np.int64)

    sig = hyperplane_signatures(df, dim=dim, bits=bits, tables=tables, seed=seed,
                                id_col=id_col, vec_col=vec_col)
    probe = F.array(*[
        F.struct(F.lit(int(t)).alias("table"), F.lit(int(b)).alias("bucket"))
        for t, b in enumerate(qbuckets)
    ])
    cand = (
        sig.filter(F.arrays_overlap(
            F.array(F.struct(F.col("table"), F.col("bucket"))), probe))
        .select(id_col).distinct()
    )
    hits = df.join(cand, on=id_col, how="left_semi")
    return cosine_topk(hits, query_vec, k=k, id_col=id_col, vec_col=vec_col,
                       exclude_id=exclude_id)


def fixed_hyperplanes(spark, *, dim: int, bits: int, tables: int) -> DataFrame:
    """(dim, t, b, w, coef): DETERMINISTIC integer hyperplanes for the
    exact-replay sign-LSH twin (the q277/q52 discipline applied to
    random-hyperplane LSH).  Coefficient for slot i = rank of
    md5(str(i)) over all S = tables·bits·dim slots, centered to
    [-S/2, S/2) — a pseudo-random permutation of a centered integer
    range, reproducible in any engine with md5 + ROW_NUMBER (no RNG,
    no float).  Uniform-coefficient hyperplanes preserve the sign-LSH
    bucketing semantics (Gaussian directions are only needed for the
    closed-form collision probability, not for correctness of the
    candidates-share-a-bucket contract).

    The frame is S rows (compile-time constant, ≤ ~10^4) — broadcast
    metadata; the single partitionless ROW_NUMBER window is bounded by
    the same constant (plan-audit whitelisted)."""
    from pyspark.sql import Window

    S = tables * bits * dim
    half = S // 2
    return (spark.range(S).select(F.col("id").alias("i"))
            .withColumn("t", F.expr(f"CAST(i div {bits * dim} AS INT)"))
            .withColumn("b", F.expr(f"CAST((i div {dim}) % {bits} AS INT)"))
            .withColumn("dim", F.expr(f"CAST(i % {dim} AS INT)"))
            .withColumn("w", F.expr("shiftleft(CAST(1 AS BIGINT), b)"))
            .withColumn("coef", F.row_number().over(
                Window.orderBy(F.expr("md5(CAST(i AS STRING))"), "i"))
                .cast("long") - 1 - half))


def hyperplane_signatures_fixed(df: DataFrame, *, dim: int, bits: int = 8,
                                tables: int = 16, id_col: str = "vec_id",
                                vec_col: str = "embedding") -> DataFrame:
    """(id, t, bucket) sign-LSH signatures over the FIXED integer
    hyperplanes — pure Catalyst, exactly SQL-replayable: components
    µ-snap to int64 (round(x·1e6), the shared embedding snap), dot
    products are exact integer sums (|dot| ≤ dim·10^9·S/2 ≪ 2^63),
    bucket = Σ_b 2^b·[dot_b > 0].

    Scale: posexplode → broadcast join with the S-row plane frame →
    two map-side-combined aggs keyed (id, t, b) then (id, t).  The
    intermediate is rows × dim × tables·bits but collapses in the
    partial agg; no data-sized shuffle beyond the (id, t, b) keys.
    The numpy matmul variant (:func:`hyperplane_signatures`) remains
    the serving path; this is its exact-oracle twin."""
    sl = fixed_hyperplanes(df.sparkSession, dim=dim, bits=bits,
                           tables=tables)
    xm = (df.select(F.col(id_col),
                    F.posexplode(F.col(vec_col)).alias("dim", "__x"))
          .select(id_col, F.col("dim").cast("int").alias("dim"),
                  F.round(F.col("__x").cast("double") * 1e6)
                  .cast("long").alias("__v")))
    dots = (xm.join(F.broadcast(sl), "dim")
            .groupBy(id_col, "t", "b")
            .agg(F.max("w").alias("w"),
                 F.sum(F.col("__v") * F.col("coef")).alias("__dot")))
    return (dots.groupBy(id_col, "t")
            .agg(F.sum(F.when(F.col("__dot") > 0, F.col("w"))
                       .otherwise(F.lit(0).cast("long")))
                 .alias("bucket")))


def lsh_ann_topk_fixed(df: DataFrame, query_vec: list[float], *,
                       query_id: int, k: int = 10, bits: int = 6,
                       tables: int = 12, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """LSH ANN top-k on the FIXED hyperplanes — same probe-and-rerank
    shape as :func:`lsh_ann_topk`, but candidate generation is a pure
    function of the data that a SQL oracle replays move-for-move: the
    query's signature is computed IN-PLAN (filter on ``query_id``)
    through the identical integer pipeline, candidates share ≥1
    (table, bucket), rerank is the exact cosine top-k.  Promotes the
    hyperplane-LSH path from rows-only to exact (VERDICT r4 #2)."""
    sig = hyperplane_signatures_fixed(df, dim=len(query_vec), bits=bits,
                                      tables=tables, id_col=id_col,
                                      vec_col=vec_col)
    qs = sig.filter(F.col(id_col) == query_id).select("t", "bucket")
    cand = (sig.join(F.broadcast(qs), ["t", "bucket"])
            .filter(F.col(id_col) != query_id)
            .select(id_col).distinct())
    hits = df.join(cand, on=id_col, how="left_semi")
    return cosine_topk(hits, query_vec, k=k, id_col=id_col,
                       vec_col=vec_col, exclude_id=query_id)


def cosine_dup_pairs_fixed_lsh(df: DataFrame, *, threshold: float = 0.4,
                               dim: int, bits: int = 8, tables: int = 16,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup pairs over the FIXED hyperplanes — the
    exact-replay twin of ``cosine_dup_pairs(use_lsh=True)``: candidates
    share ≥1 (table, bucket) of the deterministic integer signatures,
    then the exact-cosine verify (filter on the unrounded similarity,
    round-6 output — the q35 contract).  Candidate generation shuffles
    only (table, bucket) keys; the verify touches candidates only."""
    sig = hyperplane_signatures_fixed(df, dim=dim, bits=bits,
                                      tables=tables, id_col=id_col,
                                      vec_col=vec_col)
    sa = sig.select(F.col(id_col).alias("id_a"), "t", "bucket")
    sb = sig.select(F.col(id_col).alias("id_b"), "t", "bucket")
    cand = (sa.join(sb, ["t", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    a = df.select(F.col(id_col).alias("id_a"),
                  F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"),
                  F.col(vec_col).alias("__vb"))
    sim = cosine_sim(F.col("__va"), F.col("__vb"))
    return (cand.join(a, "id_a").join(b, "id_b")
            .withColumn("__sim", sim)
            .filter(F.col("__sim") >= threshold)
            .select("id_a", "id_b", F.round("__sim", 6).alias("cos_sim")))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

def ivf_train_centroids(df: DataFrame, *, n_centroids: int = 16,
                        iters: int = 8, sample: int = 2048, seed: int = 11,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> np.ndarray:
    """Deterministic spherical k-means on a BOUNDED sample — the IVF
    "train" step (same split as FAISS: train on a sample, assign the
    full corpus distributed).  The only driver-side collect is the
    sample itself (≤ ``sample`` rows, chosen by hash order so it is
    stable across partitionings); at 100 TB this is the standard recipe
    — centroid count and sample size are independent of corpus size."""
    rows = (df.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col))).limit(sample).collect())
    X = np.array([r[vec_col] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)              # cosine == dot (unit)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                m = members.sum(axis=0)
                C[j] = m / max(np.linalg.norm(m), 1e-12)
    return C


def ivf_assign(df: DataFrame, centroids: np.ndarray, *,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, list_id): nearest-centroid assignment — one (batch × dim) @
    (dim × C) matmul per Arrow batch, shuffle-free and row-parallel."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)

    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("list_id", T.IntegerType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "list_id": (V @ C.T).argmax(axis=1).astype(np.int32),
            })

    return df.select(id_col, vec_col).mapInPandas(gen, schema=schema)


def ivf_ann_topk(df: DataFrame, query_vec: list[float], *, k: int = 10,
                 n_centroids: int = 16, nprobe: int = 4, iters: int = 8,
                 sample: int = 2048, seed: int = 11, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 exclude_id: int | None = None,
                 centroids: np.ndarray | None = None) -> DataFrame:
    """IVF ANN top-k: probe the ``nprobe`` inverted lists nearest the
    query, exact-rerank only their members — scans ~nprobe/n_centroids
    of the corpus.  Pass precomputed ``centroids`` (ivf_train_centroids)
    to amortize training across queries, as a real serving path would."""
    if centroids is None:
        centroids = ivf_train_centroids(
            df, n_centroids=n_centroids, iters=iters, sample=sample,
            seed=seed, id_col=id_col, vec_col=vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(centroids @ q))[:nprobe].tolist()

    assign = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    cand = assign.filter(F.col("list_id").isin(probe)).select(id_col)
    hits = df.join(cand, on=id_col, how="left_semi")
    return cosine_topk(hits, query_vec, k=k, id_col=id_col, vec_col=vec_col,
                       exclude_id=exclude_id)


def ivf_ann_topk_exact(df: DataFrame, query_vec: list[float], *,
                       k: int = 10, n_centroids: int = 16,
                       nprobe: int = 4, rounds: int = 2,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       exclude_id: int | None = None) -> DataFrame:
    """IVF ANN top-k on the EXACT-REPLAY trainer: same probe-and-rerank
    shape as :func:`ivf_ann_topk`, but the coarse quantizer is
    ``kmeans_fixed_centroids`` (md5 seeding, exact integer distances,
    unrolled rounds) instead of the numpy-sampled FAISS-style train —
    so the entire pipeline, training included, is a pure function of
    the data that a SQL oracle can replay move-for-move (the q277
    discipline; promotes the IVF path from rows-only to exact).

    Probe selection runs IN-PLAN: the query vector snaps to micro
    units with decimal HALF_UP (emulating F.round on the identical
    double — the cross-engine round contract), exact DECIMAL(38,0)
    distances to the k centroids, top-``nprobe`` by (distance, cid).
    Candidates are the members of the probed lists (broadcast
    semi-join); rerank is the exact cosine top-k.

    Scale: identical to ivf_ann_topk's serving shape — centroids and
    the nprobe-row probe frame ride broadcasts, candidates scan
    ~nprobe/n_centroids of the corpus, rerank is scan + TakeOrdered.
    Training costs 2·rounds+1 full scans (vs the bounded sample), the
    documented price of exactness; amortize across queries by reusing
    the centroid frame.
    """
    from decimal import ROUND_HALF_UP, Decimal

    from ultraviolet_spark.operators.mlfit import (kmeans_assign,
                                                   kmeans_fixed_centroids)

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cents = kmeans_fixed_centroids(df, id_col=id_col, vec_col=vec_col,
                                   k=n_centroids, rounds=rounds)
    qm = [int(Decimal(repr(float(x) * 1e6))
              .quantize(Decimal(1), rounding=ROUND_HALF_UP))
          for x in query_vec]
    qarr = F.array(*[F.lit(v).cast("long") for v in qm])
    dq = F.aggregate(
        F.zip_with(F.col("__c"), qarr, lambda a, b: a - b),
        F.lit(0).cast("decimal(38,0)"),
        lambda s, v: s + dec(v) * dec(v))
    probe = (cents.select("cid", dq.alias("__dq"))
             .orderBy("__dq", "cid").limit(int(nprobe))
             .select(F.col("cid").alias("cluster")))
    assign = kmeans_assign(df, cents, id_col=id_col, vec_col=vec_col)
    cand = (assign.join(F.broadcast(probe), "cluster")
            .select(F.col("id").alias(id_col)))
    hits = df.join(cand, on=id_col, how="left_semi")
    return cosine_topk(hits, query_vec, k=k, id_col=id_col,
                       vec_col=vec_col, exclude_id=exclude_id)


# ---------------------------------------------------------------------------
# embedding storage ops: normalize + symmetric int8 quantization
# ---------------------------------------------------------------------------

def quantize_embeddings(df: DataFrame, *, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        bits: int = 8) -> DataFrame:
    """Per-vector symmetric integer quantization — the storage op that
    shrinks an embedding table 4× before a 100 TB ANN index build.

    scale = max|x| / (2^(bits-1) − 1); q_i = floor(x_i/scale + 0.5)
    (explicit half-up — engines disagree on round()'s tie policy, so the
    oracle mirrors the same floor form).  Pure Catalyst: transform /
    array_max / aggregate, no Python.  Zero vectors get scale 0 and
    all-zero codes."""
    qmax = float((1 << (bits - 1)) - 1)
    x = F.col(vec_col)
    absmax = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double"))))
    scale = (absmax / F.lit(qmax))
    q = F.when(
        scale > 0,
        F.transform(x, lambda v: F.floor(v.cast("double") / scale + F.lit(0.5))
                    .cast("long")),
    ).otherwise(F.transform(x, lambda v: F.lit(0).cast("long")))
    l2 = F.sqrt(F.aggregate(
        F.zip_with(x, x, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))
    return df.select(
        F.col(id_col),
        F.round(scale, 9).alias("scale"),
        F.round(l2, 6).alias("l2_norm"),
        q.alias("codes"),
    )


def semdedup(df: DataFrame, *, threshold: float = 0.95,
             n_centroids: int = 16, iters: int = 8, sample: int = 2048,
             seed: int = 11, id_col: str = "vec_id",
             vec_col: str = "embedding",
             trainer: str = "sample") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): semantic deduplication of
    an embedding corpus — k-means cluster the embeddings, then mark
    ε-similar pairs WITHIN each cluster only and keep one document per
    similar group (transitive closure, min-id keeper — the same keeper
    policy as exact_dedup / dup_clusters).

    Returns ``(id, list_id, component, keep)``: ``component`` is the
    semantic-duplicate class (its min member id), ``keep`` marks the
    class representative.  Docs similar across cluster boundaries are
    missed by construction — that is the paper's accepted recall trade
    for making pairwise work O(Σ cluster²) instead of O(corpus²); the
    ``n_centroids=1`` configuration degrades to EXACT embedding
    near-dup clustering (property-tested ≡ cosine_dup_pairs +
    connected_components).

    Scale notes (100 TB): train is the bounded-sample collect of
    ivf_train_centroids; assignment is shuffle-free matmul; the only
    data shuffle is the within-cluster self-join keyed on list_id —
    size n_centroids to keep clusters ~10^4-10^5 rows (the paper uses
    50k clusters for LAION) so per-cluster pairwise stays tractable;
    the component pass runs on the (far smaller) pair graph.

    ``trainer="sample"`` (default) clusters with the FAISS-style
    numpy-sampled ivf_train_centroids — the cheap serving path.
    ``trainer="exact"`` clusters with ``kmeans_fixed_centroids``
    (md5-seeded, exact-integer, unrolled rounds — the q277
    discipline), making the WHOLE dedup a pure function of the data
    that a SQL oracle replays move-for-move; training then costs
    2·rounds+1 full scans instead of one bounded sample.
    """
    from ultraviolet_spark.operators.dedup import connected_components

    if trainer == "exact":
        from ultraviolet_spark.operators.mlfit import (
            kmeans_assign, kmeans_fixed_centroids)
        cents_df = kmeans_fixed_centroids(
            df, id_col=id_col, vec_col=vec_col, k=n_centroids, rounds=2)
        assign = (kmeans_assign(df, cents_df, id_col=id_col,
                                vec_col=vec_col)
                  .select(F.col("id").alias(id_col),
                          F.col("cluster").alias("list_id")))
    else:
        cents = ivf_train_centroids(df, n_centroids=n_centroids,
                                    iters=iters, sample=sample,
                                    seed=seed, id_col=id_col,
                                    vec_col=vec_col)
        assign = ivf_assign(df, cents, id_col=id_col, vec_col=vec_col)
    withc = df.select(F.col(id_col), F.col(vec_col)).join(assign, on=id_col)
    a = withc.select("list_id", F.col(id_col).alias("id_a"),
                     F.col(vec_col).alias("__va"))
    b = withc.select("list_id", F.col(id_col).alias("id_b"),
                     F.col(vec_col).alias("__vb"))
    pairs = (a.join(b, on="list_id")
             .filter(F.col("id_a") < F.col("id_b"))
             .filter(F.round(cosine_sim(F.col("__va"), F.col("__vb")), 6)
                     >= threshold)
             .select("id_a", "id_b"))
    cc = connected_components(pairs)
    comp = F.coalesce(F.col("component"), F.col(id_col))
    return (withc.select(F.col(id_col), "list_id")
            .join(cc.withColumnRenamed("node", id_col), on=id_col,
                  how="left")
            .select(F.col(id_col), "list_id",
                    comp.alias("component"),
                    (comp == F.col(id_col)).alias("keep")))


# ---------------------------------------------------------------------------
# product quantization (Jégou et al. 2011) — the third leg of the
# FAISS-style stack next to int8 quantization and IVF
# ---------------------------------------------------------------------------

def pq_train(df: DataFrame, *, m: int = 4, ksub: int = 16, iters: int = 10,
             sample: int = 2048, seed: int = 11, id_col: str = "vec_id",
             vec_col: str = "embedding") -> np.ndarray:
    """Train PQ codebooks: the vector is split into ``m`` contiguous
    subvectors and an independent L2 k-means with ``ksub`` centroids is
    fit per subspace (Jégou, Douze, Schmid 2011, public).  Returns
    ``(m, ksub, dsub)`` codebooks.  Like ivf_train_centroids, the only
    collect is the bounded hash-ordered sample — train cost is
    independent of corpus size, the FAISS recipe."""
    rows = (df.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col))).limit(sample).collect())
    X = np.array([r[vec_col] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for s in range(m):
        Xs = X[:, s * dsub:(s + 1) * dsub]
        C = Xs[rng.choice(len(Xs), size=min(ksub, len(Xs)), replace=False)]
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(len(C)):
                members = Xs[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books[s, :len(C)] = C
        if len(C) < ksub:           # degenerate tiny-sample case
            books[s, len(C):] = C[-1]
    return books


def pq_encode(df: DataFrame, codebooks: np.ndarray, *,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, codes): nearest-centroid code per subspace — ``m`` small
    matmuls per Arrow batch, shuffle-free and row-parallel.  Storage is
    m bytes/vector at ksub ≤ 256 (vs 4·dim for float32)."""
    B = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, ksub, dsub = B.shape

    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("codes", T.ArrayType(T.IntegerType())),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(V), m), dtype=np.int32)
            for s in range(m):
                Vs = V[:, s * dsub:(s + 1) * dsub]
                # ||v - c||² = ||v||² - 2 v·c + ||c||²; ||v||² constant
                # over the argmin -> argmin(||c||² - 2 v·c)
                d = (B[s] ** 2).sum(axis=1)[None, :] - 2.0 * (Vs @ B[s].T)
                codes[:, s] = d.argmin(axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "codes": list(codes),
            })

    return df.select(id_col, vec_col).mapInPandas(gen, schema=schema)


def pq_adc_topk(df: DataFrame, codebooks: np.ndarray,
                query_vec: list[float], *, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_id: int | None = None,
                codes: DataFrame | None = None) -> DataFrame:
    """Asymmetric-distance top-k: the query stays full-precision; each
    database vector is its PQ reconstruction, so the distance is a sum
    of ``m`` per-subspace table lookups (the LUT is m×ksub, built once
    driver-side).  Pass a precomputed ``codes`` frame (pq_encode) to
    amortize encoding, as a serving path would.  Returns
    ``(id, adc_dist)`` ascending — approximate L2 ranking over the
    compressed corpus; scan cost is m lookups/vector, no shuffle."""
    B = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, ksub, dsub = B.shape
    q = np.asarray(query_vec, dtype=np.float64)
    lut = np.stack([((B[s] - q[s * dsub:(s + 1) * dsub]) ** 2).sum(axis=1)
                    for s in range(m)])           # (m, ksub)
    if codes is None:
        codes = pq_encode(df, codebooks, id_col=id_col, vec_col=vec_col)

    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("adc_dist", T.DoubleType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            C = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            d = lut[np.arange(m)[None, :], C].sum(axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "adc_dist": np.round(d, 6),
            })

    out = codes.mapInPandas(gen, schema=schema)
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return out.orderBy(F.col("adc_dist").asc(), F.col(id_col)).limit(k)


def pq_adc_topk_exact(df: DataFrame, query_vec: list[float], *,
                      k: int = 10, m: int = 4, ksub: int = 16,
                      rounds: int = 2, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      exclude_id: int | None = None) -> DataFrame:
    """PQ-ADC top-k on the EXACT-REPLAY trainer (the q52/q277
    discipline applied to product quantization, VERDICT r4 #2): each
    of the ``m`` contiguous subspaces trains an independent
    ``kmeans_fixed_centroids`` (md5 seeding, exact integer µ-unit
    distances, ``rounds`` unrolled Lloyd updates) on the SLICED
    vectors, codes are the exact-nearest centroid per subspace, and
    the asymmetric distance is the exact integer micro² L2 between the
    µ-snapped query subvector and the assigned centroid — summed over
    subspaces entirely in DECIMAL(38,0), so a SQL oracle replays
    training, encoding, LUT build and ranking move-for-move.

    Returns ``(id, adc_d2)`` ascending (integer micro² units — the
    exact twin reports the lossless quantity; the float serving path
    :func:`pq_adc_topk` reports double original-unit distances).

    Scale: per subspace the trainer is 2·rounds+1 scans of a
    dsub-wide slice; codes and LUTs ride ksub-row broadcasts; the
    final rank is one m-way union-agg keyed on id + TakeOrdered."""
    from decimal import ROUND_HALF_UP, Decimal

    from ultraviolet_spark.operators.mlfit import (kmeans_assign,
                                                   kmeans_fixed_centroids)

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dim = len(query_vec)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    qm = [int(Decimal(repr(float(x) * 1e6))
              .quantize(Decimal(1), rounding=ROUND_HALF_UP))
          for x in query_vec]
    per_sub = []
    for s in range(m):
        sub = df.select(F.col(id_col),
                        F.slice(F.col(vec_col), s * dsub + 1, dsub)
                        .alias(vec_col))
        cents = kmeans_fixed_centroids(sub, id_col=id_col,
                                       vec_col=vec_col, k=ksub,
                                       rounds=rounds)
        qarr = F.array(*[F.lit(v).cast("long")
                         for v in qm[s * dsub:(s + 1) * dsub]])
        dq = F.aggregate(
            F.zip_with(F.col("__c"), qarr, lambda a, b: a - b),
            F.lit(0).cast("decimal(38,0)"),
            lambda acc, v: acc + dec(v) * dec(v))
        lut = cents.select(F.col("cid").alias("cluster"),
                           dq.alias("__d"))
        assign = (kmeans_assign(sub, cents, id_col=id_col,
                                vec_col=vec_col)
                  .select("id", "cluster"))
        per_sub.append(assign.join(F.broadcast(lut), "cluster")
                       .select("id", "__d"))
    allsub = per_sub[0]
    for f in per_sub[1:]:
        allsub = allsub.unionAll(f)
    out = (allsub.groupBy("id")
           .agg(F.sum("__d").cast("long").alias("adc_d2"))
           .select(F.col("id").alias(id_col), "adc_d2"))
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return out.orderBy(F.col("adc_d2").asc(), F.col(id_col)).limit(k)


def sparse_cosine_pairs(docs: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id", threshold: float = 0.5,
                        max_df: int | None = None) -> DataFrame:
    """EXACT tf-weighted cosine similarity pairs through the inverted
    index (the Bayardo/AllPairs sparse-vector family) — the sparse
    complement of the dense-embedding :func:`cosine_dup_pairs`: docs
    are bag-of-words tf vectors, and pairs meet only on the tokens
    they share, so disjoint docs cost NOTHING (a dense all-pairs scan
    prices every pair).

    Candidate volume is Σ_t df_t² — dominated by stop-words, so
    ``max_df`` drops tokens appearing in more than that many docs
    from PAIRING (ubiquitous, no signal).  Their tf still counts in
    the norms, so the capped cosine is a strict LOWER BOUND of the
    full-vector cosine: the cap can only remove stop-word-inflated
    pairs, never invent one.  With the cap the shape is
    corpus-linear per token-bucket and hash-uniform — the 100 TB
    shuffle is the token equi-join, never docs².

    Determinism: dot products and squared norms are exact int64
    (integer tf), and ``cosine = dot / (sqrt(na²)·sqrt(nb²))`` is the
    same correctly-rounded IEEE op sequence on any engine — no float
    accumulation order anywhere.  Returns ``(id_a, id_b, dot,
    norm_sq_a, norm_sq_b, cosine)`` with ``id_a < id_b``.
    """
    toks = (docs.select(F.col(id_col).alias("__id"),
                        F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                          r"\s+")).alias("__t"))
            .filter(F.col("__t") != ""))
    tf = toks.groupBy("__id", "__t").agg(
        F.count("*").cast("long").alias("__tf"))
    norms = tf.groupBy("__id").agg(
        F.sum(F.col("__tf") * F.col("__tf")).cast("long").alias("__n2"))
    pairing = tf
    if max_df is not None:
        dfreq = tf.groupBy("__t").agg(F.count("*").alias("__df"))
        pairing = (tf.join(dfreq.filter(F.col("__df") <= max_df)
                           .select("__t"), "__t"))
    a = pairing.select(F.col("__id").alias("__ia"), "__t",
                       F.col("__tf").alias("__tfa"))
    b = pairing.select(F.col("__id").alias("__ib"), "__t",
                       F.col("__tf").alias("__tfb"))
    dots = (a.join(b, "__t")
            .filter(F.col("__ia") < F.col("__ib"))
            .groupBy("__ia", "__ib")
            .agg(F.sum(F.col("__tfa") * F.col("__tfb"))
                 .cast("long").alias("dot")))
    na = norms.select(F.col("__id").alias("__ia"),
                      F.col("__n2").alias("norm_sq_a"))
    nb = norms.select(F.col("__id").alias("__ib"),
                      F.col("__n2").alias("norm_sq_b"))
    cos = (F.col("dot").cast("double")
           / (F.sqrt(F.col("norm_sq_a").cast("double"))
              * F.sqrt(F.col("norm_sq_b").cast("double"))))
    return (dots.join(na, "__ia").join(nb, "__ib")
            .withColumn("cosine", cos)
            .filter(F.col("cosine") >= threshold)
            .select(F.col("__ia").alias("id_a"),
                    F.col("__ib").alias("id_b"),
                    "dot", "norm_sq_a", "norm_sq_b", "cosine"))
