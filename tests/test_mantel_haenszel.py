"""mantel_haenszel: hand-math equality and the Simpson's-paradox
demonstration (every stratum favors the group, the collapsed table
reverses, MH sides with the strata)."""

from __future__ import annotations

from ultraviolet_spark.operators.stats import mantel_haenszel

SCHEMA = "stratum string, g int, y int"


def _mk(stratum, a, b, c, d):
    return ([(stratum, 1, 1)] * a + [(stratum, 1, 0)] * b
            + [(stratum, 0, 1)] * c + [(stratum, 0, 0)] * d)


def _py(cells):
    num = den = 0
    pa = pb = pc = pd_ = 0
    for a, b, c, d in cells:
        n = a + b + c + d
        num += round(a * d / n * 1e6)
        den += round(b * c / n * 1e6)
        pa, pb, pc, pd_ = pa + a, pb + b, pc + c, pd_ + d
    return dict(n_strata=len(cells), mh_num_micro=num,
                mh_den_micro=den,
                or_mh=round(num / den, 6) if den else None,
                or_naive=round(pa * pd_ / (pb * pc), 6)
                if pb and pc else None)


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return mantel_haenszel(df, stratum_col="stratum",
                           group_expr="g = 1",
                           outcome_expr="y = 1").head().asDict()


def test_matches_hand_math(spark):
    cells = [(8, 2, 5, 5), (3, 7, 1, 9), (10, 10, 4, 16)]
    rows = []
    for i, cell in enumerate(cells):
        rows += _mk(f"s{i}", *cell)
    assert _run(spark, rows) == _py(cells)


def test_simpsons_paradox_resolved(spark):
    # classic construction: in BOTH strata the treated group has the
    # higher odds (OR > 1), but treatment concentrates in the
    # low-base-rate stratum, so the collapsed table shows OR < 1
    cells = [
        (9, 1, 80, 20),       # easy stratum: OR = 9·20/(1·80) = 2.25
        (30, 70, 2, 8),       # hard stratum: OR = 30·8/(70·2) ≈ 1.71
        # treated concentrate in the hard stratum → collapsed
        # OR = 39·28/(71·82) ≈ 0.19: reversed
    ]
    rows = []
    for i, cell in enumerate(cells):
        rows += _mk(f"s{i}", *cell)
    got = _run(spark, rows)
    assert got == _py(cells)
    assert got["or_mh"] > 1.0          # strata agree: effect positive
    assert got["or_naive"] < 1.0       # collapsed table lies
