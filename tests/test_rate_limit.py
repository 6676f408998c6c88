"""rate_limit_schedule: the max-plus closed form must equal the
imperative recursion sched = max(ready, prev_sched + delay) exactly;
burst/idle/mixed patterns, single-exchange plan."""

from __future__ import annotations

import datetime as dt

from ultraviolet_spark.operators.windows import rate_limit_schedule

EPOCH = dt.datetime(2024, 1, 1)


def _py_schedule(ready_list, delay_s):
    d = delay_s * 1_000_000
    out = []
    next_free = None
    for r in sorted(ready_list):
        b = int((r - EPOCH).total_seconds() * 1_000_000) + int(
            (r - EPOCH).microseconds % 1)  # exact µs below anyway
        b = (r - EPOCH) // dt.timedelta(microseconds=1)
        sched = b if next_free is None else max(b, next_free)
        next_free = sched + d
        out.append((r, EPOCH + dt.timedelta(microseconds=sched),
                    sched - b))
    return out


SERIES = {
    # burst: all ready at once → pure spacing
    "burst": [EPOCH] * 5,
    # idle: far apart → zero waits
    "idle": [EPOCH + dt.timedelta(seconds=100 * i) for i in range(4)],
    # mixed: a burst, a gap shorter than delay, a long gap
    "mixed": [EPOCH, EPOCH, EPOCH + dt.timedelta(seconds=3),
              EPOCH + dt.timedelta(seconds=4),
              EPOCH + dt.timedelta(seconds=500)],
}


def test_matches_imperative_recursion(spark):
    rows = [(k, i, t) for k, s in SERIES.items()
            for i, t in enumerate(s)]
    df = spark.createDataFrame(rows, "k string, i long, ready timestamp")
    got = rate_limit_schedule(df, by="k", ready_col="ready",
                              delay_s=10, tiebreak="i")
    by_key = {}
    for r in got.collect():
        by_key.setdefault(r.k, []).append(r)
    for k, series in SERIES.items():
        want = _py_schedule(series, 10)
        rs = sorted(by_key[k], key=lambda r: (r.ready, r.i))
        assert len(rs) == len(want)
        for r, (ready, sched, wait) in zip(rs, want):
            assert r.sched_ts == sched, (k, r.ready, r.sched_ts, sched)
            assert r.sched_wait_us == wait, (k, r.ready)


def test_burst_spacing_exact(spark):
    df = spark.createDataFrame(
        [("h", i, EPOCH) for i in range(4)],
        "k string, i long, ready timestamp")
    got = sorted(rate_limit_schedule(df, by="k", ready_col="ready",
                                     delay_s=7, tiebreak="i").collect(),
                 key=lambda r: r.sched_ts)
    waits = [r.sched_wait_us for r in got]
    assert waits == [0, 7_000_000, 14_000_000, 21_000_000]


def test_idle_requests_never_wait(spark):
    df = spark.createDataFrame(
        [("h", i, EPOCH + dt.timedelta(seconds=60 * i))
         for i in range(5)],
        "k string, i long, ready timestamp")
    got = rate_limit_schedule(df, by="k", ready_col="ready",
                              delay_s=10, tiebreak="i")
    assert all(r.sched_wait_us == 0 for r in got.collect())


def test_single_key_exchange(spark):
    df = spark.createDataFrame([("k", 0, EPOCH)],
                               "k string, i long, ready timestamp")
    out = rate_limit_schedule(df, by="k", ready_col="ready", delay_s=5)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert plan.count(") Exchange") <= 1, plan
