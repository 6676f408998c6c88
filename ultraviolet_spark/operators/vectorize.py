"""Feature hashing (the "hashing trick", Weinberger et al. 2009):
token/n-gram → fixed-dimension sparse feature vectors with NO
vocabulary — the only vectorizer shape that works at 100 TB, because a
vocabulary build is a full extra pass plus a giant broadcast, while
hashing is stateless and embarrassingly parallel.

Output is the exploded sparse form ``(id, feature_idx, tf,
signed_tf)`` — the layout downstream distributed ML wants (and the
only layout an exact SQL oracle can hash): ``tf`` is the plain bucket
count, ``signed_tf`` the sign-hashed sum whose inner products are
unbiased estimates of the true ones (the ±1 sign kills the collision
bias; see the paper's Lemma 2).

Everything is pure Catalyst — md5 is evaluated JVM-side, the single
shuffle is the partial-aggregated groupBy on (id, feature_idx) — and
every hash decision is reproducible cross-engine: ``feature_idx`` is
the first 8 md5 hex chars as an integer mod ``dim``; the sign bit is
the top bit of the 9th hex nibble.  DuckDB computes the identical
values via ``CAST('0x' || substr(md5(t), …) AS UBIGINT)``, which is
what makes the driver oracle exact rather than rows-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str) -> Column:
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def _ngrams(toks: Column, n: int) -> Column:
    if n == 1:
        return toks
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + k + 1) for k in range(n)]))
    # sequence(0, size-n) DESCENDS when size < n — short docs must
    # yield an empty gram array, not an out-of-bounds element_at
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>"))


def hashed_features(df: DataFrame, *, dim: int = 2 ** 18, n: int = 1,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """``(id, feature_idx, tf, signed_tf)`` sparse rows per doc.

    One explode + one partial-aggregated shuffle on (id, feature_idx);
    docs with no tokens produce zero rows (a doc of pure whitespace has
    an empty feature vector, same as the sklearn HashingVectorizer
    convention).
    """
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    toks = _ngrams(_tokens(text_col), n)
    tok = F.col("__tok")
    md5 = F.md5(F.encode(tok, "UTF-8"))
    idx = (F.conv(F.substring(md5, 1, 8), 16, 10).cast("long")
           % F.lit(dim)).alias("feature_idx")
    sgn = (F.when(F.conv(F.substring(md5, 9, 1), 16, 10)
                  .cast("int") < 8, F.lit(1))
           .otherwise(F.lit(-1)))
    return (df
            .filter(F.length(F.trim(F.col(text_col))) > 0)
            .select(F.col(id_col), F.explode(toks).alias("__tok"))
            .filter(tok != "")
            .select(F.col(id_col), idx, sgn.alias("__sgn"))
            .groupBy(id_col, "feature_idx")
            .agg(F.count("*").alias("tf"),
                 F.sum("__sgn").cast("long").alias("signed_tf")))


def _rp_signs(in_dim: int, out_dim: int) -> list[list[int]]:
    """±1 projection matrix derived from md5 — the same nibble rule as
    :func:`hashed_features`'s sign bit, so Spark, DuckDB and the Python
    driver all rebuild the identical matrix with no shipped state."""
    import hashlib

    return [[1 if int(hashlib.md5(f"{j}_{k}".encode()).hexdigest()[0],
                      16) < 8 else -1
             for j in range(in_dim)]
            for k in range(out_dim)]


def random_projection(df: DataFrame, *, in_dim: int, out_dim: int = 16,
                      emb_col: str = "embedding",
                      id_col: str = "vec_id",
                      micro: int = 1_000_000) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction ``(id,
    proj_micro: array<long>[out_dim])`` with a DETERMINISTIC dense ±1
    sign matrix (Achlioptas 2003, density-1 variant): inner products are
    unbiased estimates of the originals scaled by ``out_dim``, distances
    are preserved within the JL bound — the cheap pre-step before ANN /
    clustering when 100 TB of float64 embeddings won't fit the shuffle.

    Exactness across engines: inputs snap to integer micro-units
    (``floor(x·1e6)`` — floor, not round, to dodge tie-policy skew), the
    dot products are integer sums, and the matrix is md5-derived, so the
    DuckDB oracle recomputes every output bit-for-bit.

    Scale: the matrix is a plan literal (in_dim×out_dim ≤ a few K ints —
    broadcast-free), each row's projection is pure Catalyst arithmetic
    (zip_with + aggregate), zero shuffles, zero Python.  Embeddings
    shorter than ``in_dim`` contribute only their present entries.
    """
    if in_dim <= 0 or out_dim <= 0:
        raise ValueError("in_dim and out_dim must be positive")
    signs = F.array(*[F.array(*[F.lit(s) for s in row])
                      for row in _rp_signs(in_dim, out_dim)])
    emb_micro = F.transform(
        F.col(emb_col),
        lambda x: F.floor(x.cast("double") * micro).cast("long"))
    proj = F.transform(signs, lambda srow: F.aggregate(
        F.zip_with(emb_micro, srow, lambda x, s: x * s),
        F.lit(0).cast("long"),
        lambda acc, v: acc + F.coalesce(v, F.lit(0))))
    return df.select(F.col(id_col), proj.alias("proj_micro"))


def hashed_vector(df: DataFrame, *, dim: int = 2 ** 18, n: int = 1,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Dense-map form ``(id, features: map<bigint,bigint>)`` of the
    signed vector — for callers that want one row per doc (e.g. to zip
    with an embedding).  Same plan as :func:`hashed_features` plus one
    more partial-agg on id."""
    sparse = hashed_features(df, dim=dim, n=n, text_col=text_col,
                             id_col=id_col)
    return (sparse.groupBy(id_col)
            .agg(F.map_from_entries(
                F.sort_array(F.collect_list(
                    F.struct("feature_idx", "signed_tf"))))
                .alias("features")))


def quantile_normalize(df: DataFrame, *, vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       n_buckets: int = 64) -> DataFrame:
    """Quantile normalization across embedding dimensions — force every
    dimension to share ONE reference distribution (the per-rank mean),
    the classic fix for dimensions with wildly different scales before
    cosine/L2 retrieval or per-dim quantization.

    Semantics (deterministic row_number variant): within each
    dimension, values rank by (value, id) — the id tiebreak replaces
    the textbook tie-averaging with a reproducible total order — and
    the normalized value at rank r is the mean over dimensions of each
    dimension's r-th smallest value, emitted as one fixed-order double
    division of exact int64s (micro-snapped values; the per-rank sum
    over d dimensions of ±~10^6 micro-values stays far inside int64).

    Scale shape: a naive ``Window.partitionBy(dim)`` rank puts an
    ENTIRE dimension's 10^9+ values in one task.  Instead the rank is
    two-phase within each dimension: in-(dim, value-bucket) row_number
    (the exchange key is (dim, bucket) — parallelism d × n_buckets),
    plus an exclusive per-dim prefix over the d·n_buckets-row bucket
    counts, broadcast back.  No data-sized single-partition — or even
    single-dimension — window exists.  Returns (id, dim, rk, norm).
    """
    from pyspark.sql import Window

    e = df.select(F.col(id_col).alias("id"),
                  F.posexplode(vec_col).alias("dim", "v0"))
    e = e.withColumn(
        "v", F.round(F.col("v0").cast("double") * 1e6).cast("long"))
    bounds = e.agg(F.min("v").alias("__lo"), F.max("v").alias("__hi"))
    e = (e.crossJoin(F.broadcast(bounds))
         .withColumn("__b", F.expr(
             f"(v - __lo) div ((__hi - __lo) div {int(n_buckets)} + 1)")))
    o_in = Window.partitionBy("dim", "__b").orderBy("v", "id")
    e = e.withColumn("__rn_in", F.row_number().over(o_in).cast("long"))
    btot = e.groupBy("dim", "__b").agg(F.count("*").alias("__bc"))
    w_b = (Window.partitionBy("dim").orderBy("__b")
           .rowsBetween(Window.unboundedPreceding, -1))
    boff = btot.select(
        "dim", "__b",
        F.coalesce(F.sum("__bc").over(w_b), F.lit(0)).alias("__oc"))
    e = (e.join(F.broadcast(boff), ["dim", "__b"])
         .withColumn("rk", F.col("__oc") + F.col("__rn_in")))
    ref = e.groupBy("rk").agg(F.sum("v").alias("__sum_v"),
                              F.count("*").alias("__n_dims"))
    out = (e.join(ref, "rk")
           .withColumn("norm", F.round(
               F.col("__sum_v").cast("double")
               / F.col("__n_dims").cast("double") / F.lit(1e6), 6)))
    return out.select(F.col("id").alias(id_col), "dim", "rk", "norm")
