"""Target encoding: sequential-Python equality, the zero-leakage
property (future / same-timestamp labels never influence a row's
encoding), NULL policies, and the two-phase-prefix plan shape."""

from __future__ import annotations

from ultraviolet_spark.operators.targetenc import (
    loo_target_encode,
    pit_target_encode,
)

from datetime import datetime

SCHEMA = "event_id long, event_type string, ts timestamp, value double"

_T = lambda m: datetime(2024, 1, 1, 0, m, 0)

ROWS = [
    (1, "a", _T(0), 10.0),
    (2, "b", _T(1), 20.0),
    (3, "a", _T(2), 30.0),
    # same-timestamp pair: must not see each other
    (4, "a", _T(3), 40.0),
    (5, "a", _T(3), 50.0),
    (6, "b", _T(4), 60.0),
    (7, "c", _T(5), 70.0),  # singleton category
]


def _py_pit(rows, m=20):
    out = {}
    ordered = sorted(rows, key=lambda r: (r[2], r[0]))
    for i, (eid, cat, _, _v) in enumerate(ordered):
        ts_i = ordered[i][2]
        past = [r for r in ordered if r[2] < ts_i]   # strictly earlier TIME
        t = [round(r[3] * 1e6) for r in past]
        tc = [round(r[3] * 1e6) for r in past if r[1] == cat]
        if not t:
            out[eid] = (0, 0, None)
            continue
        prior = float(sum(t)) / len(t)
        enc = round((float(sum(tc)) + m * prior) / (len(tc) + m) / 1e6, 6)
        out[eid] = (len(tc), len(t), enc)
    return out


def _run_pit(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = pit_target_encode(df, cat_col="event_type", ts_col="ts",
                            target_col="value")
    return {r["event_id"]: (r["n_past_cat"], r["n_past_all"], r["enc_pit"])
            for r in got.collect()}


def test_pit_matches_sequential_reference(spark):
    assert _run_pit(spark, ROWS) == _py_pit(ROWS)


def test_pit_zero_leakage(spark):
    """Perturbing any FUTURE target must not move an earlier row's
    encoding; and row 4's encoding equals row 5's (same ts, neither
    sees the other)."""
    base = _run_pit(spark, ROWS)
    assert base[4] == base[5]
    perturbed = [(e, c, ts, v + 1000.0 if e >= 6 else v)
                 for e, c, ts, v in ROWS]
    got = _run_pit(spark, perturbed)
    for eid in (1, 2, 3, 4, 5):
        assert got[eid] == base[eid], eid


def test_pit_first_row_null(spark):
    got = _run_pit(spark, ROWS)
    assert got[1] == (0, 0, None)


def test_loo_brute_force_and_singleton_null(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {r["event_id"]: (r["n_other"], r["enc_loo"])
           for r in loo_target_encode(
               df, cat_col="event_type",
               target_col="value").collect()}
    for eid, cat, _, v in ROWS:
        others = [round(r[3] * 1e6) for r in ROWS
                  if r[1] == cat and r[0] != eid]
        if not others:
            assert got[eid] == (0, None)
        else:
            want = round(float(sum(others)) / len(others) / 1e6, 6)
            assert got[eid] == (len(others), want)


def test_global_prefix_is_bucketed(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = pit_target_encode(df, cat_col="event_type", ts_col="ts",
                            target_col="value")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "extended")
    # the global-prefix windows (the ones computing __n_in; the sum
    # twin is aliased _we0 by Catalyst) must be partitioned on the
    # time bucket __b, fed by a hash exchange — never a data-sized
    # SinglePartition window
    data_windows = [ln for ln in plan.splitlines()
                    if "Window [" in ln and "__n_in#" in ln]
    assert data_windows
    for ln in data_windows:
        assert "[__b#" in ln, ln
    assert "hashpartitioning(__b#" in plan
