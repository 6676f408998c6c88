"""woe_iv: hand-derivation equality, smoothing keeps empty cells
finite, sign semantics, and an all-one-class column."""

from __future__ import annotations

import math

from ultraviolet_spark.operators.stats import woe_iv

SCHEMA = "cat string, y int"


def _py(rows):
    cats = sorted({c for c, _ in rows})
    k = len(cats)
    pt = sum(1 for _, y in rows if y)
    nt = sum(1 for _, y in rows if not y)
    out = {}
    for c in cats:
        pc = sum(1 for cc, y in rows if cc == c and y)
        nc = sum(1 for cc, y in rows if cc == c and not y)
        a, b, cc_, d = 2 * pc + 1, 2 * pt + k, 2 * nc + 1, 2 * nt + k
        woe = round((math.log(a) - math.log(b)
                     - math.log(cc_) + math.log(d)) * 1e6)
        contrib = round((a / b - cc_ / d) * (woe / 1e6) * 1e6)
        out[c] = (pc, nc, woe, contrib)
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = woe_iv(df, cat_col="cat", label_expr="y = 1")
    return {r["cat"]: (r["pos_c"], r["neg_c"], r["woe_micro"],
                       r["iv_contrib_micro"]) for r in got.collect()}


def test_matches_hand_math(spark):
    rows = ([("a", 1)] * 8 + [("a", 0)] * 2
            + [("b", 1)] * 3 + [("b", 0)] * 7
            + [("c", 1)] * 5 + [("c", 0)] * 5)
    assert _run(spark, rows) == _py(rows)


def test_empty_cell_stays_finite(spark):
    rows = [("pure_pos", 1)] * 5 + [("pure_neg", 0)] * 5
    got = _run(spark, rows)
    assert got == _py(rows)
    assert all(abs(w) < 10_000_000 for _, _, w, _ in got.values())


def test_sign_semantics(spark):
    # category enriched in positives → WOE > 0; enriched in negatives
    # → WOE < 0; every IV contribution is non-negative
    rows = ([("hi", 1)] * 9 + [("hi", 0)] * 1
            + [("lo", 1)] * 1 + [("lo", 0)] * 9)
    got = _run(spark, rows)
    assert got["hi"][2] > 0 > got["lo"][2]
    assert all(v[3] >= 0 for v in got.values())
