"""kaplan_meier: textbook hand case with censoring, all-deaths curve
hitting exactly 0, censoring-extends-survival property, and the
survivorship-bias contrast."""

from __future__ import annotations

import math

from ultraviolet_spark.operators.survival import kaplan_meier

SCHEMA = "dur long, died boolean"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["t"]: (r["n_risk"], r["d"], r["ln_surv_micro"], r["surv"])
            for r in kaplan_meier(df, duration_col="dur",
                                  event_col="died").collect()}


def test_textbook_hand_case(spark):
    # classic: deaths at 3 (n=6), 5 (n=4, after censor at 4), 9 (n=2)
    rows = [(3, True), (3, True), (4, False), (5, True),
            (8, False), (9, True)]
    got = _run(spark, rows)
    assert set(got) == {3, 5, 9}
    assert (got[3][0], got[3][1]) == (6, 2)
    assert (got[5][0], got[5][1]) == (3, 1)
    assert (got[9][0], got[9][1]) == (1, 1)        # exhausted
    s3 = round(math.log(4) * 1e6 - math.log(6) * 1e6)  # per-step snap
    step3 = round((math.log(4) - math.log(6)) * 1e6)
    step5 = round((math.log(2) - math.log(3)) * 1e6)
    assert got[3][2] == step3
    assert got[5][2] == step3 + step5
    assert got[3][3] == round(math.exp(step3 / 1e6), 6)
    assert got[5][3] == round(math.exp((step3 + step5) / 1e6), 6)
    assert got[9][2] is None and got[9][3] == 0.0


def test_censoring_extends_survival(spark):
    # same death times; converting a death to a censor at t=5 must
    # RAISE survival at later times (the survivorship-bias fix)
    deaths = [(3, True), (5, True), (7, True), (9, True)]
    cens = [(3, True), (5, False), (7, True), (9, True)]
    sd = _run(spark, deaths)
    sc_ = _run(spark, cens)
    assert sc_[7][3] > sd[7][3]


def test_no_censoring_reaches_zero(spark):
    rows = [(t, True) for t in (1, 2, 3, 4)]
    got = _run(spark, rows)
    assert got[4][3] == 0.0 and got[4][2] is None
    # and the empirical survival matches 1 - ECDF at each earlier step
    for i, t in enumerate((1, 2, 3), start=1):
        assert abs(got[t][3] - (4 - i) / 4) < 1e-5
