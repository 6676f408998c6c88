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
