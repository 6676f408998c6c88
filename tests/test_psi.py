"""psi_drift semantics."""
from __future__ import annotations

from ultraviolet_spark.operators.stats import psi_drift


def test_identical_distributions_near_zero(spark):
    df = spark.createDataFrame([(float(i % 100),) for i in range(1000)],
                               "value double")
    rows = psi_drift(df, df, value_col="value", bins=10).collect()
    assert len(rows) == 10
    assert sum(abs(r["psi_term"]) for r in rows) < 1e-6
    assert all(r["ref_n"] == r["cur_n"] for r in rows)


def test_shift_detected(spark):
    ref = spark.createDataFrame([(float(i % 100),) for i in range(1000)],
                                "value double")
    cur = spark.createDataFrame([(float(i % 100) + 50,) for i in range(1000)],
                                "value double")
    rows = psi_drift(ref, cur, value_col="value", bins=10).collect()
    psi = sum(r["psi_term"] for r in rows)
    assert psi > 0.25  # industry "significant drift" threshold


def test_empty_current_bins_finite(spark):
    ref = spark.createDataFrame([(float(i),) for i in range(100)],
                                "value double")
    cur = spark.createDataFrame([(1000.0,)] * 20, "value double")
    rows = psi_drift(ref, cur, value_col="value", bins=10).collect()
    assert len(rows) == 10
    assert all(r["psi_term"] is not None and abs(r["psi_term"]) < 10
               for r in rows)
    # everything lands in the top bin
    top = max(rows, key=lambda r: r["bin_idx"])
    assert top["cur_n"] == 20
