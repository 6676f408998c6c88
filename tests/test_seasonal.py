"""Seasonal profile + MAD anomalies (operators/stats.seasonal_anomalies)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from ultraviolet_spark.operators.stats import seasonal_anomalies

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_seasonal_pattern_absorbed_spike_flagged(spark):
    # nightly value 100, daytime value 10 — a plain threshold would
    # alarm every night; one daytime spike of 100 must be the ONLY
    # anomaly
    t0 = datetime(2025, 1, 1)
    rows = []
    for day in range(10):
        for h in range(24):
            ts = t0 + timedelta(days=day, hours=h)
            base = 100.0 if h < 6 else 10.0
            v = base + (day % 3) * 0.25
            rows.append(("m", ts, v))
    rows.append(("m", t0 + timedelta(days=4, hours=12, minutes=30),
                 100.0))   # daytime spike
    out = seasonal_anomalies(_mk(spark, rows), key_col="k", ts_col="ts",
                             value_col="v").collect()
    anom = [r for r in out if r["is_anomaly"]]
    assert len(anom) == 1
    assert anom[0]["value"] == 100.0 and anom[0]["pos"] == 12
    # night rows are NOT anomalous despite being 10x the daytime level
    assert all(not r["is_anomaly"] for r in out
               if r["pos"] < 6)


def test_profile_and_residual_exact(spark):
    t0 = datetime(2025, 1, 1)
    rows = [("k", t0 + timedelta(days=d, hours=3), float(v))
            for d, v in enumerate([1.0, 2.0, 4.0])]
    out = {r["value"]: r for r in seasonal_anomalies(
        _mk(spark, rows), key_col="k", ts_col="ts",
        value_col="v").collect()}
    # profile at hour 3 = median(1, 2, 4) = 2.0 — NOT the mean 2.33
    assert out[1.0]["profile"] == 2.0
    assert out[1.0]["resid"] == -1.0
    assert out[4.0]["resid"] == 2.0


def test_day_of_week_period(spark):
    t0 = datetime(2025, 1, 6)   # a Monday
    rows = [("k", t0 + timedelta(days=d), float(d % 7)) for d in range(28)]
    out = seasonal_anomalies(_mk(spark, rows), key_col="k", ts_col="ts",
                             value_col="v",
                             period="day_of_week").collect()
    # each weekday always carries the same value → residuals all 0
    assert all(r["resid"] == 0.0 and not r["is_anomaly"] for r in out)


def test_partitioning_invariance(spark):
    t0 = datetime(2025, 1, 1)
    rows = [("k", t0 + timedelta(hours=i), float((i * 7) % 13))
            for i in range(100)]
    df = _mk(spark, rows)
    a = sorted(tuple(r) for r in seasonal_anomalies(
        df.coalesce(1), key_col="k", ts_col="ts",
        value_col="v").collect())
    b = sorted(tuple(r) for r in seasonal_anomalies(
        df.repartition(7), key_col="k", ts_col="ts",
        value_col="v").collect())
    assert a == b
