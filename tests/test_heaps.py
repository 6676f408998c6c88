"""heaps_fit: exact equality with a sequential Python reference
(cumulative vocab growth + µ-nat OLS), two-phase-prefix ≡ global
semantics, sanity of β on synthetic power-law growth."""

from __future__ import annotations

import math

from ultraviolet_spark.operators.textstats import heaps_fit


def _py_fit(docs):
    """Sequential reference: walk docs in id order, track vocab."""
    seen = set()
    pts = []
    n = 0
    for _, text in sorted(docs):
        toks = text.lower().strip().split()
        if not toks:
            continue
        n += len(toks)
        seen.update(toks)
        x = round(math.log(n) * 1e6)
        y = round(math.log(len(seen)) * 1e6)
        pts.append((x, y))
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    k = len(pts)
    beta = round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
    return dict(n_points=k, sum_x=sx, sum_y=sy, sum_xx=sxx,
                sum_xy=sxy, beta=beta)


def test_matches_sequential_reference(spark):
    docs = [(i, f"w{i % 7} w{i % 13} common w{i} w{i}")
            for i in range(40)] + [(100, "   ")]   # empty doc skipped
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = heaps_fit(df).head().asDict()
    want = _py_fit(docs)
    assert got == want


def test_beta_recovers_sublinear_growth(spark):
    # vocabulary grows ~sqrt(n): every doc adds 3 tokens, a NEW word
    # only on square numbers → fitted beta well below 1
    rows = []
    for i in range(1, 200):
        w = f"new{i}" if int(i ** 0.5) ** 2 == i else "old"
        rows.append((i, f"{w} filler filler"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    beta = heaps_fit(df).head()["beta"]
    assert 0.0 < beta < 0.8


def test_constant_vocab_beta_near_zero(spark):
    df = spark.createDataFrame(
        [(i, "same words every time") for i in range(50)],
        "doc_id long, text string")
    beta = heaps_fit(df).head()["beta"]
    assert abs(beta) < 0.05


def test_no_global_single_partition_window(spark):
    df = spark.createDataFrame([(i, f"a b{i}") for i in range(10)],
                               "doc_id long, text string")
    out = heaps_fit(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "extended")
    # the data-sized per-doc cumsum (the sums of n_toks/new_toks) must
    # run inside a Window PARTITIONED on the bucket column __b — the
    # two-phase prefix sum.  Only the 64-row bucket-offset window may
    # be unpartitioned.
    data_windows = [ln for ln in plan.splitlines()
                    if "Window [" in ln and "sum(n_toks" in ln]
    assert data_windows, "expected a Window node computing sum(n_toks)"
    for ln in data_windows:
        assert "[__b#" in ln, f"data-sized window not bucketed: {ln}"
    # and the bucketed path is fed by a hash exchange on __b, never by
    # a data-sized SinglePartition exchange
    assert "hashpartitioning(__b#" in plan
