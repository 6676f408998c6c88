"""rmst: sequential area-under-KM reference, no-censoring mean
identity, τ clamping, all-censored → τ, and the exhausted tail."""

from __future__ import annotations

import math

from ultraviolet_spark.operators.survival import rmst

SCHEMA = "dur long, died boolean"


def _py(rows, tau):
    times = sorted({t for t, e in rows if e})
    if not times:
        return min(tau, tau)  # S=1 throughout → RMST = τ
    area = min(times[0], tau)            # [0, t₁) at S = 1
    ln = 0
    for i, t in enumerate(times):
        n_risk = sum(1 for tt, _e in rows if tt >= t)
        dd = sum(1 for tt, e in rows if tt == t and e)
        nxt = times[i + 1] if i + 1 < len(times) else tau
        seg = max(min(nxt, tau) - t, 0)
        if n_risk == dd:
            s_here = 0.0
        else:
            ln += round((math.log(n_risk - dd) - math.log(n_risk)) * 1e6)
            s_here = math.exp(ln / 1e6)
        area += round(s_here * seg)
    return area


def _run(spark, rows, tau):
    df = spark.createDataFrame(rows, SCHEMA)
    return rmst(df, duration_col="dur", event_col="died",
                tau=tau).head().asDict()


def test_matches_sequential_reference(spark):
    rows = [(3, True), (3, True), (4, False), (5, True),
            (8, False), (9, True), (15, False)]
    for tau in (6, 10, 100):
        got = _run(spark, rows, tau)
        assert got["rmst_us"] == _py(rows, tau), tau
        assert got["tau_us"] == tau


def test_no_censoring_large_tau_is_mean(spark):
    # without censoring and τ beyond the last death, RMST = mean
    # duration (up to the per-step µ-snap)
    durs = [2, 5, 5, 11, 17]
    rows = [(t, True) for t in durs]
    got = _run(spark, rows, 1000)
    assert abs(got["rmst_us"] - sum(durs) / len(durs)) <= 1


def test_all_censored_gives_tau(spark):
    rows = [(7, False), (9, False)]
    got = _run(spark, rows, 50)
    assert got["rmst_us"] == 50 and got["rmst_share"] == 1.0


def test_tau_before_first_death(spark):
    rows = [(100, True), (200, True)]
    got = _run(spark, rows, 40)
    assert got["rmst_us"] == 40  # S = 1 on all of [0, τ)
