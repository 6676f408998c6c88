"""Mean-shift change-point (operators/stats.change_point)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import change_point

pytestmark = pytest.mark.usefixtures("spark")


def _ref_cp(vals):
    """Brute force over all τ with the operator's exact arithmetic."""
    vm = [round(v * 1e6) for v in vals]
    n = len(vm)
    sn = sum(vm)
    best = None
    pre = 0
    for i in range(1, n):
        pre += vm[i - 1]
        d = float(pre * n - i * sn)
        g = round(d * d / float(n) / float(i) / float(n - i))
        if best is None or (-g, i) < best[:2]:
            best = (-g, i, pre)
    g, i, pre = -best[0], best[1], best[2]
    return {
        "n": n, "tau": i, "gain": float(g),
        "mean_l": round(pre / i / 1e6, 6),
        "mean_r": round((sn - pre) / (n - i) / 1e6, 6),
    }


def _run(spark, series):
    rows = [(k, i, float(v)) for k, vals in series.items()
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, o long, v double")
    out = change_point(df, key_col="key", order_col="o",
                       value_col="v", tiebreak_col="o").collect()
    return {r["key"]: r.asDict() for r in out}


def test_planted_shift_recovered(spark):
    vals = [5.0 + (i % 3) * 0.1 for i in range(30)] \
        + [15.0 + (i % 3) * 0.1 for i in range(25)]
    got = _run(spark, {"a": vals})["a"]
    assert got["tau"] == 30
    assert got["split_at"] == 29           # order value of last left elem
    assert got["mean_l"] == pytest.approx(5.1, abs=0.01)
    assert got["mean_r"] == pytest.approx(15.1, abs=0.01)


def test_brute_force_reference_equality(spark):
    import hashlib
    series = {}
    for k in ("x", "y"):
        vals = []
        for i in range(40):
            h = int(hashlib.md5(f"{k}{i}".encode()).hexdigest()[:8], 16)
            vals.append((h % 1000) / 10.0 + (8.0 if i > 23 else 0.0))
        series[k] = vals
    got = _run(spark, series)
    for k, vals in series.items():
        want = _ref_cp(vals)
        for f in ("n", "tau", "gain", "mean_l", "mean_r"):
            assert got[k][f] == want[f], (k, f)


def test_constant_series_ties_to_smallest_tau(spark):
    got = _run(spark, {"c": [7.0] * 12})["c"]
    assert got["tau"] == 1 and got["gain"] == 0.0
    assert got["mean_l"] == got["mean_r"] == 7.0


def test_single_point_keys_absent(spark):
    got = _run(spark, {"one": [3.0], "two": [1.0, 9.0]})
    assert set(got) == {"two"}
    assert got["two"]["tau"] == 1


def test_partitioning_invariance(spark):
    vals = [float((i * 13) % 29) for i in range(50)]
    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, o long, v double")
    a = change_point(df.coalesce(1), key_col="key", order_col="o",
                     value_col="v", tiebreak_col="o").head().asDict()
    b = change_point(df.repartition(7), key_col="key", order_col="o",
                     value_col="v", tiebreak_col="o").head().asDict()
    assert a == b
