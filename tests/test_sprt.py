"""sprt_decision: sequential trajectory-walk equality, first-crossing
(not deepest-crossing) semantics, planted accept-H1 and accept-H0
streams, and the continue case."""

from __future__ import annotations

from datetime import datetime, timedelta

from ultraviolet_spark.operators.stats import sprt_decision

SCHEMA = "grp string, ts timestamp, event_id long, y int"
LR1, LR0 = 223144, -64539
U, L = 2944439, -2944439


def _py(rows):
    out = {}
    for g in sorted({r[0] for r in rows}):
        seq = sorted([r for r in rows if r[0] == g],
                     key=lambda r: (r[1], r[2]))
        cum, up, dn = 0, None, None
        for idx, (_g, _t, _i, y) in enumerate(seq, start=1):
            cum += LR1 if y else LR0
            if up is None and cum >= U:
                up = idx
            if dn is None and cum <= L:
                dn = idx
        if up is not None and (dn is None or up <= dn):
            dec, cross = "accept_h1", up
        elif dn is not None:
            dec, cross = "accept_h0", dn
        else:
            dec, cross = "continue", None
        out[g] = (len(seq), sum(r[3] for r in seq), cum, cross, dec)
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = sprt_decision(df, ts_col="ts", id_col="event_id",
                        success_expr="y = 1", group_col="grp",
                        lr1_micro=LR1, lr0_micro=LR0,
                        upper_micro=U, lower_micro=L)
    return {r["grp"]: (r["n"], r["successes"], r["final_llr_micro"],
                       r["cross_idx"], r["decision"])
            for r in got.collect()}


def _mk(g, ys, start=0):
    t0 = datetime(2024, 6, 1)
    return [(g, t0 + timedelta(minutes=start + k), 1000 + start + k, y)
            for k, y in enumerate(ys)]


def test_matches_sequential_walk(spark):
    # mixed stream that wanders, crosses up, then wanders back down —
    # the FIRST crossing must win even though the trajectory re-enters
    ys_a = [1] * 14 + [0] * 60 + [1] * 5      # up-cross at obs 14
    ys_b = [0] * 50 + [1] * 3                 # down-cross early
    ys_c = [1, 0, 1, 0, 1, 0]                 # never crosses
    rows = _mk("A", ys_a) + _mk("B", ys_b) + _mk("C", ys_c)
    got = _run(spark, rows)
    want = _py(rows)
    assert got == want
    assert got["A"][4] == "accept_h1" and got["A"][3] == 14
    assert got["B"][4] == "accept_h0"
    assert got["C"][4] == "continue" and got["C"][3] is None


def test_crossing_is_first_not_final(spark):
    # final LLR is deeply negative but the up-boundary was hit first
    ys = [1] * 14 + [0] * 200
    got = _run(spark, _mk("A", ys))
    assert got["A"][4] == "accept_h1"
    assert got["A"][2] < L            # final value is far below lower
