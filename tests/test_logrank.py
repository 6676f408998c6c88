"""logrank_test: sequential reference equality (same snapping),
identical-cohorts null (U = 0), planted-hazard direction, and the
n = 1 risk-set guard."""

from __future__ import annotations

from ultraviolet_spark.operators.survival import logrank_test

SCHEMA = "dur long, died boolean, grp string"


def _py_ref(rows):
    na = sum(1 for *_x, g in rows if g == "A")
    nb = len(rows) - na
    times = sorted({t for t, e, _ in rows if e})
    U = V = da_tot = db_tot = 0
    for t in times:
        n_a = sum(1 for tt, _e, g in rows if tt >= t and g == "A")
        n_b = sum(1 for tt, _e, g in rows if tt >= t and g == "B")
        d_a = sum(1 for tt, e, g in rows if tt == t and e and g == "A")
        d_b = sum(1 for tt, e, g in rows if tt == t and e and g == "B")
        da_tot += d_a
        db_tot += d_b
        dd, nn = d_a + d_b, n_a + n_b
        if nn > 1:
            U += round((d_a * nn - dd * n_a) / nn * 1e6)
            V += round(dd * n_a * n_b * (nn - dd)
                       / (nn * nn * (nn - 1)) * 1e6)
    chi2 = round((U / 1e6) * (U / 1e6) / (V / 1e6), 6)
    return dict(n_obs_a=na, n_obs_b=nb, deaths_a=da_tot,
                deaths_b=db_tot, u_micro=U, v_micro=V, chi2=chi2)


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return logrank_test(df, duration_col="dur", event_col="died",
                        group_col="grp", group_a="A",
                        group_b="B").head().asDict()


def test_matches_sequential_reference(spark):
    rows = [(3, True, "A"), (3, True, "B"), (5, False, "A"),
            (6, True, "B"), (8, True, "A"), (9, False, "B"),
            (11, True, "A"), (11, True, "B"), (14, True, "B")]
    assert _run(spark, rows) == _py_ref(rows)


def test_identical_cohorts_null(spark):
    spells = [(2, True), (4, True), (6, False), (9, True)]
    rows = [(t, e, g) for t, e in spells for g in ("A", "B")]
    got = _run(spark, rows)
    assert got["u_micro"] == 0 and got["chi2"] == 0.0


def test_planted_hazard_direction(spark):
    # A dies much earlier than B → observed A deaths exceed expected
    # early on → U (observed − expected for A) is positive and large
    rows = [(t, True, "A") for t in range(1, 21)] + \
           [(t, True, "B") for t in range(100, 120)]
    got = _run(spark, rows)
    assert got["u_micro"] > 0
    assert got["chi2"] > 10.0


def test_single_subject_risk_set_contributes_zero(spark):
    # the last death leaves n = 1: must contribute 0/0-free zeros
    rows = [(1, True, "A"), (2, True, "B")]
    got = _run(spark, rows)
    assert got == _py_ref(rows)
    assert got["v_micro"] >= 0
