"""Fellegi–Sunter weights + scoring (operators/fuzzy.py)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.fuzzy import (fs_field_weights,
                                               fs_score_pairs)

pytestmark = pytest.mark.usefixtures("spark")

REC_SCHEMA = "id long, city string, zip string"
PAIR_SCHEMA = ("id_a long, id_b long, city_a string, city_b string, "
               "zip_a string, zip_b string, is_anchor boolean")


def _snap_nat(v):
    a = v * 1e6
    f = math.floor(abs(a) + 0.5)
    return int(math.copysign(f, a))


def _ref_weights(recs, pairs, fields):
    from collections import Counter
    out = {}
    n = len(recs)
    for fi, f in enumerate(fields):
        hist = Counter(r[fi] for r in recs)
        ag = sum(c * c for c in hist.values()) - n
        u_num, u_den = 2 * ag + 1, 2 * (n * n - n) + 2
        anch = [p for p in pairs if p[-1]]
        agree = sum(1 for p in anch if p[2 * fi + 2] == p[2 * fi + 3]
                    or (p[2 * fi + 2] is None and p[2 * fi + 3] is None))
        m_num, m_den = 2 * agree + 1, 2 * len(anch) + 2
        wa = _snap_nat(math.log(m_num) - math.log(m_den)
                       - math.log(u_num) + math.log(u_den))
        wd = _snap_nat(math.log(m_den - m_num) - math.log(m_den)
                       - math.log(u_den - u_num) + math.log(u_den))
        out[f] = (wa, wd)
    return out


@pytest.fixture()
def linkage(spark):
    recs = [(1, "rome", "00100"), (2, "rome", "00100"),
            (3, "oslo", "00100"), (4, "oslo", "11000"),
            (5, "lima", "22000"), (6, "lima", "22000"),
            (7, "rome", "33000"), (8, None, "33000")]
    pairs = [
        (1, 2, "rome", "rome", "00100", "00100", True),
        (3, 4, "oslo", "oslo", "00100", "11000", True),
        (5, 6, "lima", "lima", "22000", "22000", True),
        (1, 3, "rome", "oslo", "00100", "00100", False),
        (4, 7, "oslo", "rome", "11000", "33000", False),
        (7, 8, "rome", None, "33000", "33000", False),
    ]
    return (spark.createDataFrame(recs, REC_SCHEMA),
            spark.createDataFrame(pairs, PAIR_SCHEMA),
            recs, pairs)


def test_weights_match_reference(spark, linkage):
    rec_df, pair_df, recs, pairs = linkage
    fields = ["city", "zip"]
    w = {r["field"]: r for r in fs_field_weights(
        rec_df.select("city", "zip"), pair_df,
        fields=fields).collect()}
    want = _ref_weights([(r[1], r[2]) for r in recs], pairs, fields)
    for f in fields:
        assert (w[f]["w_agree_micro"], w[f]["w_disagree_micro"]) \
            == want[f], f
        assert w[f]["w_agree_micro"] > 0 > w[f]["w_disagree_micro"]


def test_scores_order_matching_pairs_first(spark, linkage):
    rec_df, pair_df, recs, pairs = linkage
    fields = ["city", "zip"]
    w = fs_field_weights(rec_df.select("city", "zip"), pair_df,
                         fields=fields)
    scored = {(r["id_a"], r["id_b"]): r["score_micro"]
              for r in fs_score_pairs(pair_df, w,
                                      fields=fields).collect()}
    # full agreement beats partial beats none
    assert scored[(1, 2)] > scored[(3, 4)] > scored[(4, 7)]
    # score decomposes: agree+agree vs agree+disagree differ by
    # exactly (wa_zip − wd_zip)
    wrow = {r["field"]: r for r in w.collect()}
    assert scored[(1, 2)] - scored[(3, 4)] == \
        wrow["zip"]["w_agree_micro"] - wrow["zip"]["w_disagree_micro"]


def test_null_pairs_agree_null_safely(spark, linkage):
    rec_df, pair_df, recs, pairs = linkage
    fields = ["city", "zip"]
    w = fs_field_weights(rec_df.select("city", "zip"), pair_df,
                         fields=fields)
    scored = {(r["id_a"], r["id_b"]): r["score_micro"]
              for r in fs_score_pairs(pair_df, w,
                                      fields=fields).collect()}
    # (7, 8): city rome vs NULL → disagree; zip agrees
    wrow = {r["field"]: r for r in w.collect()}
    assert scored[(7, 8)] == (wrow["city"]["w_disagree_micro"]
                              + wrow["zip"]["w_agree_micro"])


def test_high_cardinality_field_earns_more(spark):
    # 'uid' almost never agrees by chance → bigger agreement weight
    # than the 2-value 'coin' field, for the same anchor agreement
    recs = [(i, f"u{i % 50}", "h" if i % 2 else "t")
            for i in range(100)]
    pairs = [(i, i + 50, f"u{i}", f"u{i}", "h" if i % 2 else "t",
              "h" if i % 2 else "t", True) for i in range(10)]
    rec_df = spark.createDataFrame(recs, "id long, uid string, coin string")
    pair_df = spark.createDataFrame(
        pairs, "id_a long, id_b long, uid_a string, uid_b string, "
               "coin_a string, coin_b string, is_anchor boolean")
    w = {r["field"]: r for r in fs_field_weights(
        rec_df.select("uid", "coin"), pair_df,
        fields=["uid", "coin"]).collect()}
    assert w["uid"]["w_agree_micro"] > w["coin"]["w_agree_micro"]
