"""Kleinberg two-state burst detection
(operators/windows.kleinberg_bursts)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from ultraviolet_spark.operators.windows import kleinberg_bursts

pytestmark = pytest.mark.usefixtures("spark")

BASE = dt.datetime(2024, 1, 1)


def _mk(spark, series):
    rows = [(k, t) for k, ts in series.items() for t in ts]
    return spark.createDataFrame(rows, "k string, ts timestamp_ntz")


def _ref(ts_list, s=2, gamma=1.0):
    """Sequential reference of the integer Viterbi pipeline."""
    ts = sorted(int(t.timestamp() * 1e6) for t in ts_list)
    if len(ts) < 2:
        return []
    g = [b - a for a, b in zip(ts, ts[1:])]
    n = len(g)
    m = max(sum(g) // n, 1)
    T = round(1e6 * gamma * math.log(n + 1))
    INF = 1 << 60
    c0, c1, decs = 0, INF, []
    for x in g:
        e0 = round(1e6 * (x / m + math.log(m)))
        e1 = round(1e6 * (s * x / m + math.log(m) - math.log(s)))
        enter = c0 + T
        d = (0 if c0 <= c1 else 1) + 2 * (1 if c1 <= enter else 0)
        c0, c1 = e0 + min(c0, c1), e1 + min(c1, enter)
        decs.append(d)
    j = 1 if c1 < c0 else 0
    states = [j]
    for d in reversed(decs[1:]):
        j = (d >> j) & 1
        states.append(j)
    states.reverse()
    return list(zip(range(1, n + 1), g, states))


def _series_with_burst():
    ts, t = [], BASE
    for _ in range(8):
        ts.append(t)
        t += dt.timedelta(hours=1)
    for _ in range(10):
        ts.append(t)
        t += dt.timedelta(minutes=1)
    for _ in range(8):
        ts.append(t)
        t += dt.timedelta(hours=1)
    return ts


def test_matches_sequential_reference(spark):
    seed, t, ts = 99, BASE, []
    for _ in range(40):
        ts.append(t)
        seed = (seed * 1103515245 + 12345) % (2 ** 31)
        t += dt.timedelta(minutes=1 + seed % 120)
    got = sorted((r["pos"], r["gap_us"], r["burst"]) for r in
                 kleinberg_bursts(_mk(spark, {"a": ts}), ts_col="ts",
                                  by="k").collect())
    assert got == _ref(ts)


def test_burst_run_is_one_interval(spark):
    ts = _series_with_burst()
    got = {r["pos"]: r["burst"] for r in
           kleinberg_bursts(_mk(spark, {"a": ts}), ts_col="ts",
                            by="k").collect()}
    assert [got[p] for p in sorted(got)] == [0] * 8 + [1] * 10 + [0] * 7
    assert got == {p: s for p, _, s in _ref(ts)}


def test_uniform_gaps_no_burst(spark):
    ts = [BASE + dt.timedelta(hours=i) for i in range(20)]
    got = kleinberg_bursts(_mk(spark, {"a": ts}), ts_col="ts",
                           by="k").collect()
    assert all(r["burst"] == 0 for r in got)


def test_single_short_gap_does_not_pay_entry(spark):
    # one mildly short gap amid hourly events: the gamma*ln(n+1) entry
    # cost is not worth a single observation — stays base (the reason
    # this is an interval detector, not a point thresholder)
    ts = [BASE + dt.timedelta(hours=i) for i in range(10)]
    ts.append(ts[-1] + dt.timedelta(minutes=30))
    got = kleinberg_bursts(_mk(spark, {"a": ts}), ts_col="ts",
                           by="k").collect()
    assert all(r["burst"] == 0 for r in got)
    assert {(r["pos"], r["burst"]) for r in got} == \
        {(p, s) for p, _, s in _ref(ts)}


def test_degenerate_keys(spark):
    series = {"one": [BASE], "same": [BASE, BASE, BASE]}
    got = kleinberg_bursts(_mk(spark, series), ts_col="ts",
                           by="k").collect()
    ks = {r["k"] for r in got}
    assert "one" not in ks                  # < 2 events → nothing
    assert all(r["gap_us"] == 0 for r in got if r["k"] == "same")
