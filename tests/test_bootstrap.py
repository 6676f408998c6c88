"""poisson_bootstrap_ci: exact equality with a sequential md5-replay
reference, CI sanity, determinism, and the weight distribution's
first moment."""

from __future__ import annotations

import hashlib

from ultraviolet_spark.operators.stats import (
    _POIS1_T48,
    poisson_bootstrap_ci,
)

SCHEMA = "event_id long, value double"


def _u48(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _w(id_, b):
    u = _u48(f"{id_}:{b}:")
    return sum(1 for t in _POIS1_T48 if u >= t)


def _py_ref(rows, B):
    xs = {str(i): round(v * 1e6) for i, v in rows}
    n = len(xs)
    mean_est = round(sum(xs.values()) / n / 1e6, 6)
    means = []
    for b in range(B):
        swx = sum(_w(i, b) * x for i, x in xs.items())
        sw = sum(_w(i, b) for i in xs)
        means.append((round(swx / sw / 1e6, 6), b))
    means.sort()
    k_lo = (B * 25) // 1000 + 1
    k_hi = (B * 975 + 999) // 1000
    return dict(n=n, mean_est=mean_est, b_reps=B,
                ci_lo=means[k_lo - 1][0], ci_hi=means[k_hi - 1][0])


def test_matches_sequential_reference(spark):
    rows = [(i, float((i * 31) % 57) / 3.0 + 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, SCHEMA)
    for B in (12, 40):
        got = poisson_bootstrap_ci(df, value_col="value",
                                   id_col="event_id",
                                   n_reps=B).head().asDict()
        assert got == _py_ref(rows, B), B


def test_ci_brackets_estimate_and_is_deterministic(spark):
    rows = [(i, float((i * 7) % 23)) for i in range(300)]
    df = spark.createDataFrame(rows, SCHEMA)
    a = poisson_bootstrap_ci(df, value_col="value",
                             id_col="event_id").head().asDict()
    b = poisson_bootstrap_ci(df, value_col="value",
                             id_col="event_id").head().asDict()
    assert a == b
    assert a["ci_lo"] <= a["mean_est"] <= a["ci_hi"]
    assert a["ci_lo"] < a["ci_hi"]


def test_poisson_weights_first_moment(spark):
    # E[w] = 1: over many (row, replicate) draws the average weight
    # must be within a few σ/√N of 1 (σ = 1 for Poisson(1))
    N = 20000
    avg = sum(_w(i, i % 40) for i in range(N)) / N
    assert abs(avg - 1.0) < 0.03
