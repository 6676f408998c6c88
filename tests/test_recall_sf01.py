"""sf0.1 recall curves for the probabilistic candidate-generation paths
(VERDICT r3 #6): the driver only row-counts the LSH/ANN queries, so a
kernel change could silently degrade recall without failing anything.
These tests pin the recall CURVE at two parameter points each — the
stingy point must not beat the generous point, and the generous point
must clear an absolute floor — at the largest local scale (sf0.1), so
the assertion covers the bucket statistics a 500-row corpus can't.

Ground truth is always the engine's own EXACT path (prefix-filter
Jaccard / brute-force cosine), never a Python reimplementation — these
are curve pins, not semantics oracles (pytest + the exact-oracle twins
cover semantics).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.usefixtures("spark")

SF01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def docs01(spark):
    return (spark.read.parquet(f"{SF01}/documents.parquet")
            .select("doc_id", "text"))


@pytest.fixture(scope="module")
def emb01(spark):
    return spark.read.parquet(f"{SF01}/embeddings.parquet")


def test_minhash_lsh_recall_curve(docs01):
    from ultraviolet_spark.operators import dedup as D

    tau = 0.5
    want = set(map(tuple, D.ngram_jaccard_pairs(
        docs01, n=3, threshold=tau)
        .select("id_a", "id_b").toPandas().itertuples(index=False)))
    assert want, "sf0.1 corpus must contain true near-dup pairs"
    recalls = {}
    for num_perm, bands in [(64, 8), (128, 32)]:
        got = set(map(tuple, D.minhash_lsh_pairs(
            docs01, n=3, num_perm=num_perm, bands=bands, threshold=tau)
            .select("id_a", "id_b").toPandas().itertuples(index=False)))
        # exact-verify step => precision 1 by construction
        assert got <= want, (num_perm, bands)
        recalls[(num_perm, bands)] = len(got) / len(want)
    # stingy banding cannot beat generous banding, and the generous
    # point keeps the documented >=0.95 recall at corpus scale
    assert recalls[(64, 8)] <= recalls[(128, 32)] + 1e-9, recalls
    assert recalls[(128, 32)] >= 0.95, recalls


def test_ivf_ann_recall_curve(emb01):
    from ultraviolet_spark.operators import similarity as S

    q = emb01.orderBy("vec_id").select("embedding").head()[0]
    exact = list(S.cosine_topk(emb01, list(q), k=10)
                 .toPandas()["vec_id"])

    def recall(n_centroids, nprobe):
        got = S.ivf_ann_topk(emb01, list(q), k=10,
                             n_centroids=n_centroids,
                             nprobe=nprobe).toPandas()
        return len(set(got["vec_id"]) & set(exact)) / 10

    r_stingy = recall(16, 2)
    r_generous = recall(16, 8)
    assert r_stingy <= r_generous + 1e-9, (r_stingy, r_generous)
    assert r_generous >= 0.8, (r_stingy, r_generous)
    # nprobe == n_centroids scans every list => exact result
    assert recall(8, 8) == 1.0


def test_hyperplane_lsh_ann_recall_curve(emb01):
    from ultraviolet_spark.operators import similarity as S

    q = emb01.orderBy("vec_id").select("embedding").head()[0]
    exact = list(S.cosine_topk(emb01, list(q), k=10)
                 .toPandas()["vec_id"])

    def recall(bits, tables):
        got = S.lsh_ann_topk(emb01, list(q), k=10, bits=bits,
                             tables=tables).toPandas()
        return len(set(got["vec_id"]) & set(exact)) / 10

    r_stingy = recall(8, 4)
    r_generous = recall(2, 32)
    assert r_stingy <= r_generous + 1e-9, (r_stingy, r_generous)
    assert r_generous >= 0.9, (r_stingy, r_generous)
