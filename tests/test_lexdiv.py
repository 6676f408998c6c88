"""lexical_diversity: hand-counted reference equality including the
Good–Turing and Chao1 identities, and the V₂ = 0 finiteness guard."""

from __future__ import annotations

from ultraviolet_spark.operators.textstats import lexical_diversity

SCHEMA = "doc_id long, text string"


def _run(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), SCHEMA)
    return lexical_diversity(df).head().asDict()


def test_hand_counted_reference(spark):
    # tokens: a×4, b×2, c×1, d×1  →  N=8, V=4, V1=2, V2=1
    got = _run(spark, ["a a b c", "a A b d", "   "])
    assert (got["n_tokens"], got["n_types"], got["v1"], got["v2"]) \
        == (8, 4, 2, 1)
    assert got["p0_unseen"] == round(2 / 8, 6)
    assert got["chao1"] == round(4 + 2 * 1 / (2 * 2), 6)
    # Σf(f−1) = 12+2 = 14 ; Σf² = 16+4+1+1 = 22
    assert got["simpson_micro"] == round(14 / (8 * 7) * 1e6, 6)
    assert got["yule_k_micro"] == round((22 - 8) / 64 * 1e10, 6)


def test_chao1_finite_without_doubletons(spark):
    # all hapax: V2 = 0 — bias-corrected form must stay finite
    got = _run(spark, ["x y z w"])
    assert got["v2"] == 0
    assert got["chao1"] == round(4 + 4 * 3 / 2, 6)


def test_uniform_corpus_extremes(spark):
    # one type repeated: V1 = 0 → p0 = 0; Simpson = 1
    got = _run(spark, ["q q q q q"])
    assert got["p0_unseen"] == 0.0
    assert got["simpson_micro"] == 1e6
