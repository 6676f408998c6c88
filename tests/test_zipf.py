"""zipf_fit vs a numpy least-squares reference."""
from __future__ import annotations

import math

import numpy as np

from ultraviolet_spark.operators.stats import zipf_fit


def test_zipf_fit_reference(spark):
    # deterministic frequencies: "w0"*32, "w1"*16, ... "w5"*1
    words = []
    for i in range(6):
        words += [f"w{i}"] * (2 ** (5 - i))
    docs = [(0, " ".join(words[:30])), (1, " ".join(words[30:]))]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = zipf_fit(df).collect()[0]

    from collections import Counter

    c = Counter(words)
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.log(np.arange(1, len(ranked) + 1, dtype=float))
    y = np.log(np.array([f for _, f in ranked], dtype=float))
    slope, _ = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]

    assert row["n_vocab"] == 6
    assert row["n_tokens"] == len(words)
    assert math.isclose(row["zipf_slope"], slope, abs_tol=2e-6)
    assert math.isclose(row["zipf_r2"], r * r, abs_tol=2e-6)
    # an exact power law (freq = 32 * rank^-log2 ratios) is close to
    # linear in log-log, so the fit must be strongly negative
    assert row["zipf_slope"] < -1.0 and row["zipf_r2"] > 0.9


def test_zipf_ignores_blank_docs(spark):
    df = spark.createDataFrame(
        [(0, "a a b"), (1, "   "), (2, "")], "doc_id long, text string")
    row = zipf_fit(df).collect()[0]
    assert row["n_vocab"] == 2 and row["n_tokens"] == 3


def test_benford_reference(spark):
    import math

    from ultraviolet_spark.operators.stats import benford_digits

    vals = [1.5, 19.0, 2.0, 0.0031, 923.0, 12.0, 0.0, -5.0, 88.8]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = {r["digit"]: r for r in
            benford_digits(df, value_col="v").collect()}
    assert len(rows) == 9
    # leading digits of positives: 1,1,2,3,9,1,8 → n=7
    expect_obs = {1: 3, 2: 1, 3: 1, 8: 1, 9: 1}
    for d in range(1, 10):
        assert rows[d]["n_obs"] == expect_obs.get(d, 0)
        e = 7 * math.log10(1 + 1 / d)
        assert math.isclose(rows[d]["expected"], round(e, 6), abs_tol=1e-9)
        assert math.isclose(rows[d]["chi2_term"],
                            round((rows[d]["n_obs"] - e) ** 2 / e, 6),
                            abs_tol=1e-5)
