"""Exact distributed covariance + PCA whitening for embedding tables.

Covariance at scale is a per-partition Gram-matrix accumulation: each
partition folds its batch of vectors into ONE d×d partial (numpy
``einsum`` over the Arrow batch), partials merge with a (dim_i, dim_j)
groupBy — so the shuffle moves P·d² tiny rows, never n·d² (the
explode-join formulation the q167 oracle uses is exactly what this
operator exists to avoid at 10^12 rows).

Exactness: embeddings are quantized to fixed-point milli-units with the
repo's explicit half-up (``floor(x·1000 + 0.5)``, the engines-disagree-
on-round() policy q57 established), and every sum is int64 — the
covariance NUMERATOR ``n·Σxy − Σx·Σy`` is bit-exact cross-engine, no
float summation order anywhere.  (At 10^9+ rows the int64 headroom for
``n·Σxy`` runs out — swap the final combine to DECIMAL(38,0) like the
HITS/PageRank integer pipelines; partials stay int64.)

Whitening: the d×d exact numerator table is a BOUNDED collect (d² rows
— same regime as the IVF training sample); eigendecomposition runs on
the driver (numpy ``eigh``), eigenvector signs are canonicalized
(largest-|component| positive) so the transform is deterministic, and
the projection is one broadcast matmul per Arrow batch.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _quant(mat: np.ndarray, unit: int) -> np.ndarray:
    return np.floor(mat.astype(np.float64) * unit + 0.5).astype(np.int64)


def embedding_covariance_exact(df: DataFrame, *, vec_col: str = "embedding",
                               unit: int = 1000) -> DataFrame:
    """Tall exact covariance-numerator table over ``vec_col``:
    ``(dim_i, dim_j, n, cov_num)`` for the upper triangle (1-based,
    i ≤ j), where ``cov_num = n·Σ(x_i·x_j) − Σx_i·Σx_j`` in
    ``unit``⁻²-fixed-point.  Population covariance = cov_num / n²·unit².
    """
    out_schema = ("dim_i int, dim_j int, n_part bigint, "
                  "s1i bigint, s1j bigint, s2 bigint")

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = None
        s1 = None
        n = 0
        for pdf in batches:
            if pdf.empty:
                continue
            m = _quant(np.stack(pdf[vec_col].to_numpy()), unit)
            if gram is None:
                d = m.shape[1]
                gram = np.zeros((d, d), np.int64)
                s1 = np.zeros(d, np.int64)
            gram += m.T @ m
            s1 += m.sum(axis=0)
            n += len(m)
        if gram is None:
            return
        d = gram.shape[0]
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame({
            "dim_i": (iu + 1).astype(np.int32),
            "dim_j": (ju + 1).astype(np.int32),
            "n_part": np.full(iu.size, n, np.int64),
            "s1i": s1[iu], "s1j": s1[ju], "s2": gram[iu, ju],
        })

    part = df.select(vec_col).mapInPandas(partials, out_schema)
    agg = (part.groupBy("dim_i", "dim_j")
           .agg(F.sum("n_part").alias("n"), F.sum("s1i").alias("t1i"),
                F.sum("s1j").alias("t1j"), F.sum("s2").alias("t2")))
    return agg.select(
        "dim_i", "dim_j", F.col("n").cast("long").alias("n"),
        (F.col("n") * F.col("t2") - F.col("t1i") * F.col("t1j"))
        .cast("long").alias("cov_num"))


def pca_model(df: DataFrame, *, vec_col: str = "embedding",
              k: int = 8, unit: int = 1000, eps: float = 1e-9):
    """Driver-side PCA model from the exact covariance table: returns
    ``(mean, components, eigenvalues)`` where ``components`` is (k, d)
    with canonical signs, eigenvalues descending."""
    tall = embedding_covariance_exact(df, vec_col=vec_col,
                                      unit=unit).collect()
    d = max(r["dim_j"] for r in tall)
    n = tall[0]["n"]
    cov = np.zeros((d, d))
    for r in tall:
        v = r["cov_num"] / (n * n * unit * unit)
        cov[r["dim_i"] - 1, r["dim_j"] - 1] = v
        cov[r["dim_j"] - 1, r["dim_i"] - 1] = v
    mean_rows = (df.select(F.posexplode(vec_col).alias("i", "v"))
                 .groupBy("i").agg(F.sum(F.col("v").cast("double"))
                                   .alias("s"), F.count("*").alias("c"))
                 .collect())
    mean = np.zeros(d)
    for r in mean_rows:
        mean[r["i"]] = r["s"] / r["c"]
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    evals, comps = w[order], v[:, order].T
    # canonical sign: the largest-|x| component of each vector positive
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1
    return mean, comps, np.maximum(evals, 0.0) + eps


def pca_whiten(df: DataFrame, *, vec_col: str = "embedding",
               id_col: str = "vec_id", k: int = 8,
               unit: int = 1000) -> DataFrame:
    """Project + whiten every vector onto the top-k principal
    components: ``z = Λ^(−1/2) · C · (x − μ)``.  One broadcast matmul
    per Arrow batch; output ``(vec_id, pc array<double>)``."""
    mean, comps, evals = pca_model(df, vec_col=vec_col, k=k, unit=unit)
    wmat = (comps / np.sqrt(evals)[:, None])

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            z = (m - mean) @ wmat.T
            yield pd.DataFrame({id_col: pdf[id_col],
                                "pc": list(z)})

    return (df.select(id_col, vec_col)
            .mapInPandas(proj, f"{id_col} long, pc array<double>"))
