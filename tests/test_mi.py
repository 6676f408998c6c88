"""mutual_information: hand-math equality, the independence →
zero-MI property, the deterministic-function → MI = H(A) identity."""

from __future__ import annotations

import math

from ultraviolet_spark.operators.stats import mutual_information

SCHEMA = "a string, b string"


def _py(rows):
    from collections import Counter
    cells = Counter(rows)
    na = Counter(a for a, _ in rows)
    nb = Counter(b for _, b in rows)
    n = len(rows)
    out = {}
    for (a, b), c in cells.items():
        pmi = round((math.log(n * c) - math.log(na[a] * nb[b])) * 1e6)
        out[(a, b)] = (c, na[a], nb[b], pmi, round(c / n * pmi))
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = mutual_information(df, col_a="a", col_b="b")
    return {(r["a"], r["b"]): (r["n_ab"], r["n_a"], r["n_b"],
                               r["pmi_micro"], r["mi_contrib_micro"])
            for r in got.collect()}


def test_matches_hand_math(spark):
    rows = ([("en", "web")] * 6 + [("en", "book")] * 2
            + [("de", "web")] * 1 + [("de", "book")] * 5
            + [("fr", "web")] * 3)
    assert _run(spark, rows) == _py(rows)


def test_independent_columns_zero_mi(spark):
    # perfectly independent 2×2 design: every PMI is exactly 0
    rows = [(a, b) for a in ("x", "y") for b in ("u", "v")
            for _ in range(10)]
    got = _run(spark, rows)
    assert all(v[3] == 0 and v[4] == 0 for v in got.values())


def test_deterministic_function_gives_entropy(spark):
    # B = f(A), uniform over 4 values → MI = H(A) = ln 4
    rows = [(c, c.upper()) for c in "abcd" for _ in range(5)]
    got = _run(spark, rows)
    total = sum(v[4] for v in got.values())
    assert abs(total - round(math.log(4) * 1e6)) <= 4  # per-cell snap
