"""cox_score_step: sequential reference equality, the binary-covariate
↔ log-rank U equivalence, planted-hazard sign, and the S0 = 1 null
information increment."""

from __future__ import annotations

from ultraviolet_spark.operators.survival import cox_score_step

SCHEMA = "dur long, died boolean, x long"


def _py(rows):
    times = sorted({t for t, e, _ in rows if e})
    U = I = nd = 0
    for t in times:
        risk = [(x) for tt, _e, x in rows if tt >= t]
        s0, s1, s2 = len(risk), sum(risk), sum(x * x for x in risk)
        dd = sum(1 for tt, e, _x in rows if tt == t and e)
        sxd = sum(x for tt, e, x in rows if tt == t and e)
        nd += dd
        U += round((sxd * s0 - dd * s1) / s0 * 1e6)
        I += round(dd * (s2 * s0 - s1 * s1) / (s0 * s0) * 1e6)
    du, di = U / 1e6, I / 1e6
    beta = round(du / di, 6) if I else None
    chi2 = round(du * du / di, 6) if I else None
    return dict(n_deaths=nd, u_micro=U, i_micro=I,
                beta1=beta, score_chi2=chi2)


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return cox_score_step(df, duration_col="dur", event_col="died",
                          x_col="x").head().asDict()


def test_matches_sequential_reference(spark):
    rows = [(3, True, 5), (3, True, 2), (5, False, 7), (6, True, 1),
            (8, True, 9), (9, False, 3), (11, True, 4), (11, True, 6),
            (14, True, 2)]
    assert _run(spark, rows) == _py(rows)


def test_binary_covariate_matches_logrank_u(spark):
    """With x ∈ {0,1} (x=1 ⇔ cohort A), the Cox score U at β=0 IS the
    log-rank observed−expected statistic — the two operators must
    agree on u_micro."""
    from ultraviolet_spark.operators.survival import logrank_test

    rows = [(3, True, 1), (4, True, 0), (6, False, 1), (7, True, 0),
            (9, True, 1), (12, True, 0), (12, True, 1)]
    cox = _run(spark, rows)
    lr_rows = [(t, e, "A" if x else "B") for t, e, x in rows]
    df = spark.createDataFrame(lr_rows, "dur long, died boolean, grp string")
    lr = logrank_test(df, duration_col="dur", event_col="died",
                      group_col="grp", group_a="A",
                      group_b="B").head()
    assert cox["u_micro"] == lr["u_micro"]


def test_planted_hazard_sign(spark):
    # high-x subjects die first → at each early death the dying x
    # exceeds the risk-set mean → U > 0 and β̂ > 0
    rows = [(t, True, 100 - t) for t in range(1, 40)]
    got = _run(spark, rows)
    assert got["u_micro"] > 0 and got["beta1"] > 0


def test_last_subject_contributes_zero_information(spark):
    # the final death has S0 = 1: S2·S0 = S1², so its I increment is
    # exactly 0 and U increment is exactly 0 — by algebra, not guard
    rows = [(1, True, 4), (2, True, 9)]
    got = _run(spark, rows)
    assert got == _py(rows)
    one = [(5, True, 7)]
    got1 = _run(spark, one)
    assert got1["u_micro"] == 0 and got1["i_micro"] == 0
