"""competing_risks: sequential Aalen–Johansen reference equality, the
CIF₁ + CIF₂ + S ≈ 1 identity, and the 1−KM overstatement contrast."""

from __future__ import annotations

import math

from ultraviolet_spark.operators.survival import (
    competing_risks,
    kaplan_meier,
)

SCHEMA = "dur long, cause int"

ROWS = [(2, 1), (3, 2), (3, 1), (5, 0), (6, 2), (8, 1),
        (9, 0), (11, 2), (12, 1)]


def _py(rows):
    times = sorted({t for t, c in rows if c in (1, 2)})
    n_tot = len(rows)
    ln = 0
    c1 = c2 = 0
    out = {}
    for t in times:
        n_risk = sum(1 for tt, _c in rows if tt >= t)
        d1 = sum(1 for tt, c in rows if tt == t and c == 1)
        d2 = sum(1 for tt, c in rows if tt == t and c == 2)
        dd = d1 + d2
        s_before = math.exp(ln / 1e6)
        c1 += round(s_before * d1 / n_risk * 1e6)
        c2 += round(s_before * d2 / n_risk * 1e6)
        out[t] = (n_risk, d1, d2, c1, c2)
        if n_risk > dd:
            ln += round((math.log(n_risk - dd) - math.log(n_risk)) * 1e6)
        else:
            ln = None  # exhausted: no later death times can exist
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["t"]: (r["n_risk"], r["d1"], r["d2"], r["cif1_micro"],
                     r["cif2_micro"])
            for r in competing_risks(df, duration_col="dur",
                                     cause_col="cause").collect()}


def test_matches_sequential_reference(spark):
    assert _run(spark, ROWS) == _py(ROWS)


def test_cif_sum_plus_survival_is_one(spark):
    got = _run(spark, ROWS)
    t_last = max(got)
    n_risk, d1, d2, c1, c2 = got[t_last]
    # all-cause KM at the last death time
    df = spark.createDataFrame([(t, c != 0) for t, c in ROWS],
                               "dur long, died boolean")
    km = {r["t"]: r["surv"] for r in kaplan_meier(
        df, duration_col="dur", event_col="died").collect()}
    assert abs((c1 + c2) / 1e6 + km[t_last] - 1.0) < 1e-4


def test_one_minus_km_overstates_single_cause(spark):
    # naive 1 − KM(cause-1 only, competitor treated as censoring)
    # must exceed the proper CIF₁ whenever cause 2 exists
    got = _run(spark, ROWS)
    t_last = max(got)
    cif1 = got[t_last][3] / 1e6
    df = spark.createDataFrame([(t, c == 1) for t, c in ROWS],
                               "dur long, died boolean")
    km1 = [r["surv"] for r in kaplan_meier(
        df, duration_col="dur", event_col="died").collect()
        if r["surv"] is not None]
    naive = 1.0 - min(km1)
    assert naive > cif1
