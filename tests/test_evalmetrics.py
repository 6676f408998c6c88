"""cohens_kappa / roc_auc vs plain-Python references."""
from __future__ import annotations

import math
import random
from collections import Counter

from ultraviolet_spark.operators.evalmetrics import cohens_kappa, roc_auc


def _ref_kappa(pairs):
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ra, cb = Counter(a for a, _ in pairs), Counter(b for _, b in pairs)
    pe = sum(ra[k] * cb.get(k, 0) for k in ra)
    num, den = n * agree - pe, n * n - pe
    return num / den if den else None


def _ref_auc(rows):
    # midrank AUC
    scores = sorted(set(s for s, _ in rows))
    rank = {}
    start = 1
    for s in scores:
        cnt = sum(1 for x, _ in rows if x == s)
        rank[s] = start + (cnt - 1) / 2
        start += cnt
    pos = [s for s, p in rows if p]
    neg = [s for s, p in rows if not p]
    r = sum(rank[s] for s in pos)
    return (r - len(pos) * (len(pos) + 1) / 2) / (len(pos) * len(neg))


def test_kappa_perfect_and_random(spark):
    perfect = [(c, c) for c in "aabbccdd"]
    df = spark.createDataFrame(perfect, "x string, y string")
    row = cohens_kappa(df, col_a="x", col_b="y").collect()[0]
    assert row["kappa"] == 1.0 and row["n_agree"] == 8

    rng = random.Random(3)
    pairs = [(rng.choice("abc"), rng.choice("abc")) for _ in range(200)]
    df = spark.createDataFrame(pairs, "x string, y string")
    row = cohens_kappa(df, col_a="x", col_b="y").collect()[0]
    assert math.isclose(row["kappa"], _ref_kappa(pairs), abs_tol=1e-12)
    assert abs(row["kappa"]) < 0.25  # independent labelings ⇒ κ ≈ 0


def test_kappa_degenerate_constant(spark):
    df = spark.createDataFrame([("a", "a")] * 5, "x string, y string")
    row = cohens_kappa(df, col_a="x", col_b="y").collect()[0]
    assert row["kappa"] is None  # pe = 1 ⇒ undefined


def test_auc_reference_with_ties(spark):
    rng = random.Random(5)
    rows = [(rng.randrange(20), rng.random() < 0.4) for _ in range(300)]
    df = spark.createDataFrame([(s, int(p)) for s, p in rows],
                               "score long, is_pos int")
    got = roc_auc(df, score_col="score", label_col="is_pos").collect()[0]
    assert math.isclose(got["auc"], _ref_auc(rows), abs_tol=1e-12)


def test_auc_separable_and_degenerate(spark):
    rows = [(i, i >= 50) for i in range(100)]
    df = spark.createDataFrame([(s, int(p)) for s, p in rows],
                               "score long, is_pos int")
    assert roc_auc(df, score_col="score",
                   label_col="is_pos").collect()[0]["auc"] == 1.0
    df1 = spark.createDataFrame([(1, 1), (2, 1)], "score long, is_pos int")
    assert roc_auc(df1, score_col="score",
                   label_col="is_pos").collect()[0]["auc"] is None


def test_calibration_report_hand_case(spark):
    from ultraviolet_spark.operators.evalmetrics import calibration_report

    # bin 0: p=50000 twice, one positive → mean_p 0.05, frac_pos 0.5
    # (p=100000 would land in bin 1 — the boundary belongs to the
    # upper bin, floor semantics)
    # bin 9: p=950000 twice, both positive → mean_p 0.95, frac_pos 1.0
    rows = [(50_000, 0), (50_000, 1), (950_000, 1), (950_000, 1)]
    df = spark.createDataFrame(rows, "p_micro long, label long")
    out = {r.bin: r for r in calibration_report(
        df, p_micro_col="p_micro", label_col="label").collect()}
    assert set(out) == {0, 9}
    assert out[0].mean_p == 0.05 and out[0].frac_pos == 0.5
    assert out[9].mean_p == 0.95 and out[9].frac_pos == 1.0
    want_brier = 50_000**2 + 950_000**2 + 2 * 50_000**2
    assert out[0].brier_num == want_brier
    assert abs(out[0].brier - want_brier / (4 * 1e12)) < 1e-15
    # ece_num (cross-bin total): bin0 |1e5−1e6|=9e5; bin9 |1.9e6−2e6|=1e5
    assert out[0].ece_num == 1_000_000
    assert abs(out[0].ece - 1_000_000 / (4 * 1e6)) < 1e-15


def test_calibration_report_python_reference(spark):
    import random

    from ultraviolet_spark.operators.evalmetrics import calibration_report

    rng = random.Random(11)
    rows = [(rng.randrange(1_000_000), rng.randrange(2))
            for _ in range(500)]
    df = spark.createDataFrame(rows, "p_micro long, label long")
    got = {r.bin: r for r in calibration_report(
        df, p_micro_col="p_micro", label_col="label").collect()}
    bins = {}
    for p, y in rows:
        b = min(p // 100_000, 9)
        n, np_, sp = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, np_ + y, sp + p)
    assert set(got) == set(bins)
    brier_num = sum((p - 1_000_000 * y) ** 2 for p, y in rows)
    ece_num = sum(abs(sp - 1_000_000 * np_) for _, np_, sp in bins.values())
    for b, (n, np_, sp) in bins.items():
        r = got[b]
        assert (r.n, r.n_pos, r.sum_p_micro) == (n, np_, sp)
        assert r.brier_num == brier_num and r.ece_num == ece_num


def test_ndcg_matches_brute_force(spark):
    import hashlib

    from ultraviolet_spark.operators.evalmetrics import (
        NDCG_DISCOUNT_MICRO, ndcg_at_k)

    # deterministic pseudo-random data: 5 queries x 14 candidates with
    # score ties and zero gains
    rows = []
    for i in range(70):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        rows.append((i % 5, i, h % 7, (i * 3) % 4))  # (q, id, score, gain)
    df = spark.createDataFrame(rows, "q long, id long, score long, gain long")
    got = {r["q"]: r for r in
           ndcg_at_k(df, query_col="q", score_col="score", gain_col="gain",
                     id_col="id", k=10).collect()}

    for qid in range(5):
        cand = [r for r in rows if r[0] == qid]
        by_score = sorted(cand, key=lambda r: (-r[2], r[1]))[:10]
        by_gain = sorted(cand, key=lambda r: (-r[3], r[1]))[:10]
        dcg = sum(r[3] * NDCG_DISCOUNT_MICRO[i + 1]
                  for i, r in enumerate(by_score))
        idcg = sum(r[3] * NDCG_DISCOUNT_MICRO[i + 1]
                   for i, r in enumerate(by_gain))
        assert got[qid]["dcg_micro"] == dcg
        assert got[qid]["idcg_micro"] == idcg
        assert got[qid]["ndcg"] == (dcg / idcg if idcg else None)
    # perfect ranking == 1.0 exactly; scored <= ideal always
    assert all(r["ndcg"] is None or 0.0 <= r["ndcg"] <= 1.0
               for r in got.values())


def test_ndcg_all_zero_gain_is_null_and_k_guard(spark):
    import pytest

    from ultraviolet_spark.operators.evalmetrics import ndcg_at_k

    df = spark.createDataFrame(
        [(0, 1, 9, 0), (0, 2, 5, 0)], "q long, id long, score long, gain long")
    [r] = ndcg_at_k(df, query_col="q", score_col="score", gain_col="gain",
                    id_col="id", k=10).collect()
    assert r["idcg_micro"] == 0 and r["ndcg"] is None
    with pytest.raises(ValueError, match="discount table"):
        ndcg_at_k(df, query_col="q", score_col="score", gain_col="gain",
                  id_col="id", k=11)


def _rbo_reference(ranks, k=10, p=0.9):
    # truncated RBO normalized so identical prefixes score 1:
    # Σ_d w_d·(overlap_d/d) / Σ_d w_d, with the same nano-rounded
    # integer weights the operator uses
    w = [round(1e9 * (1 - p) * p ** (d - 1)) for d in range(1, k + 1)]
    num = 0
    for d in range(1, k + 1):
        ov = sum(1 for ra, rb in ranks if max(ra, rb) <= d)
        num += w[d - 1] * (2520 // d) * ov
    return num / (2520 * sum(w))


def test_rbo_identical_and_reversed(spark):
    from ultraviolet_spark.operators.evalmetrics import rbo_at_k
    ident = [("q1", i, i, i) for i in range(1, 11)]
    rev = [("q2", i, i, 11 - i) for i in range(1, 11)]
    df = spark.createDataFrame(ident + rev,
                               "q string, item long, ra long, rb long")
    got = {r["query"]: r for r in rbo_at_k(
        df, query_col="q", item_col="item", rank_a_col="ra",
        rank_b_col="rb").collect()}
    assert got["q1"]["rbo"] == 1.0           # identical prefixes: exact 1
    assert got["q1"]["n_both_topk"] == 10
    ref = _rbo_reference([(i, 11 - i) for i in range(1, 11)])
    assert got["q2"]["rbo"] == ref           # same integer arithmetic
    # reversal scores LOW (≈0.25) despite full overlap at depth 10 —
    # top-weighting is the whole point: the heads disagree maximally
    assert 0.0 < got["q2"]["rbo"] < 0.5


def test_rbo_partial_overlap_and_absent_queries(spark):
    from ultraviolet_spark.operators.evalmetrics import rbo_at_k
    rows = [
        # q1: item ranked 1 in A, 3 in B; another in A-top only (rb=15)
        ("q1", 1, 1, 3), ("q1", 2, 2, 15), ("q1", 3, 12, 1),
        # q2: zero items inside both top-10 → query absent by contract
        ("q2", 1, 1, 11), ("q2", 2, 11, 1),
        # NULL ranks never contribute
        ("q1", 4, None, 2),
    ]
    df = spark.createDataFrame(rows, "q string, item long, ra long, rb long")
    got = {r["query"]: r for r in rbo_at_k(
        df, query_col="q", item_col="item", rank_a_col="ra",
        rank_b_col="rb").collect()}
    assert set(got) == {"q1"}
    assert got["q1"]["n_both_topk"] == 1
    assert got["q1"]["rbo"] == _rbo_reference([(1, 3)])


def test_rbo_rejects_untabled_parameters(spark):
    import pytest as _pytest
    from ultraviolet_spark.operators.evalmetrics import rbo_at_k
    df = spark.createDataFrame([("q", 1, 1, 1)],
                               "q string, item long, ra long, rb long")
    with _pytest.raises(NotImplementedError):
        rbo_at_k(df, query_col="q", item_col="item", rank_a_col="ra",
                 rank_b_col="rb", k=5)
