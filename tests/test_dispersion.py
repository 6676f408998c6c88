"""Fano factor (operators/stats.dispersion_index_by_key)."""

from __future__ import annotations

import datetime as dt

import pytest

from ultraviolet_spark.operators.stats import dispersion_index_by_key

pytestmark = pytest.mark.usefixtures("spark")

BASE = dt.datetime(2024, 1, 1)


def _mk(spark, series):
    rows = [(k, BASE + dt.timedelta(seconds=s))
            for k, secs in series.items() for s in secs]
    return spark.createDataFrame(rows, "k string, ts timestamp")


def test_regular_vs_bursty_vs_reference(spark):
    # one event every hour for 24h: variance 0 -> D = 0
    regular = [3600 * i + 10 for i in range(24)]
    # all 24 events in ONE hour of a 24h span (plus a span marker):
    # maximal clumping
    bursty = [5 + i for i in range(24)] + [3600 * 23 + 5]
    got = {r["k"]: r for r in dispersion_index_by_key(
        _mk(spark, {"reg": regular, "burst": bursty}), by="k",
        ts_col="ts").collect()}
    assert got["reg"]["d"] == 0.0
    assert got["burst"]["d"] > 10
    # sequential reference for the bursty series, zeros included
    counts = [0] * 24
    for s in bursty:
        counts[s // 3600] += 1
    H, N = 24, len(bursty)
    want = round((H * sum(c * c for c in counts) - N * N) / (H * N), 6)
    assert got["burst"]["d"] == want


def test_empty_hours_count_via_span(spark):
    # 2 events in hour 0, 2 in hour 9: the 8 empty hours between MUST
    # deflate the mean and inflate D vs the observed-hours-only view
    vals = [10, 20, 9 * 3600 + 10, 9 * 3600 + 20]
    got = dispersion_index_by_key(_mk(spark, {"a": vals}), by="k",
                                  ts_col="ts").head()
    assert got["n_buckets"] == 10
    # H=10, counts 2,0*8,2: D = (10*8 - 16)/(10*4) = 1.6
    assert got["d"] == 1.6


def test_single_bucket_null(spark):
    got = dispersion_index_by_key(_mk(spark, {"a": [1, 2, 3]}), by="k",
                                  ts_col="ts").head()
    assert got["d"] is None and got["n_buckets"] == 1
