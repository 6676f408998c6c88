"""Exact covariance + PCA whitening vs direct numpy."""
from __future__ import annotations

import numpy as np
import pytest

from ultraviolet_spark.operators.pca import (embedding_covariance_exact,
                                             pca_model, pca_whiten)


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(7)
    # anisotropic Gaussian so PCA has real structure
    a = rng.normal(size=(6, 6))
    return (rng.normal(size=(300, 6)) @ a).astype(np.float32)


@pytest.fixture(scope="module")
def vdf(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")


def test_covariance_exact_vs_numpy(vdf, vecs):
    rows = embedding_covariance_exact(vdf).collect()
    q = np.floor(vecs.astype(np.float64) * 1000 + 0.5).astype(np.int64)
    n = len(q)
    for r in rows:
        i, j = r["dim_i"] - 1, r["dim_j"] - 1
        expect = n * int((q[:, i] * q[:, j]).sum()) \
            - int(q[:, i].sum()) * int(q[:, j].sum())
        assert r["cov_num"] == expect, (i, j)
    assert len(rows) == 6 * 7 // 2  # upper triangle incl. diagonal


def test_covariance_partitioning_invariant(spark, vecs):
    a = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    got1 = {(r["dim_i"], r["dim_j"]): r["cov_num"]
            for r in embedding_covariance_exact(a.coalesce(1)).collect()}
    got8 = {(r["dim_i"], r["dim_j"]): r["cov_num"]
            for r in embedding_covariance_exact(a.repartition(8)).collect()}
    assert got1 == got8


def test_model_matches_numpy(vdf, vecs):
    mean, comps, evals = pca_model(vdf, k=6)
    q = np.floor(vecs.astype(np.float64) * 1000 + 0.5) / 1000
    cov = np.cov(q.T, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    assert np.allclose(evals - 1e-9, w[order], rtol=1e-9, atol=1e-12)
    assert np.allclose(mean, vecs.astype(np.float64).mean(axis=0),
                       atol=1e-12)
    for k_ in range(6):
        ref = v[:, order[k_]]
        jmax = int(np.argmax(np.abs(ref)))
        if ref[jmax] < 0:
            ref = -ref
        assert np.allclose(comps[k_], ref, atol=1e-9)


def test_whiten_identity_covariance(vdf, vecs):
    out = pca_whiten(vdf, k=4).collect()
    z = np.stack([r["pc"] for r in sorted(out, key=lambda r: r["vec_id"])])
    assert z.shape == (300, 4)
    zc = np.cov(z.T, bias=True)
    # whitened quantized data has identity covariance up to the
    # quantization delta between q-space (model) and raw floats (proj)
    assert np.allclose(zc, np.eye(4), atol=5e-3)


def test_whiten_on_real_table(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = pca_whiten(df, k=3).limit(5).collect()
    assert all(len(r["pc"]) == 3 for r in out)
