"""resample_grid LOCF semantics on a hand-built event log."""
from __future__ import annotations

import datetime as dt

from ultraviolet_spark.operators.history import resample_grid


def test_resample_grid_hand_case(spark):
    T = dt.datetime
    rows = [
        # user 1: obs at 00:30 and 07:10
        (1, T(2024, 1, 1, 0, 30), 10.0),
        (1, T(2024, 1, 1, 7, 10), 20.0),
        # user 2: single obs
        (2, T(2024, 1, 2, 3, 0), 5.0),
        # user 2 duplicate-ts tie: max wins deterministically
        (2, T(2024, 1, 2, 3, 0), 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {(r["user_id"], r["grid_ts"]): (r["last_value"], r["gap_us"])
           for r in resample_grid(df, every_hours=6).collect()}
    # user 1 grid: 00:00, 06:00 (t1=07:10 ⇒ 12:00 exceeds t1, excluded)
    assert got[(1, T(2024, 1, 1, 0, 0))] == (None, None)  # before 1st obs
    assert got[(1, T(2024, 1, 1, 6, 0))] == (10.0, int(5.5 * 3600 * 1e6))
    # user 2 grid: 03:00 only; tie collapsed to max
    assert got[(2, T(2024, 1, 2, 3, 0))] == (7.0, 0)
    assert len(got) == 3
