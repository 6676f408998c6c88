"""Per-key Mann-Kendall trend test
(operators/stats.mann_kendall_by_key)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.stats import mann_kendall_by_key

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, series):
    rows = [(k, i, float(v)) for k, vs in series.items()
            for i, v in enumerate(vs)]
    return spark.createDataFrame(rows, "k string, t long, v double")


def _ref(vs):
    ms = [round(v * 1e6) for v in vs]
    n = len(ms)
    s = sum((1 if ms[j] > ms[i] else -1 if ms[j] < ms[i] else 0)
            for i in range(n) for j in range(i + 1, n))
    from collections import Counter
    tt = sum(t * (t - 1) * (2 * t + 5)
             for t in Counter(ms).values())
    var18 = n * (n - 1) * (2 * n + 5) - tt
    if var18 <= 0:
        return s, var18, None
    var = var18 / 18.0
    if s > 0:
        z = (s - 1.0) / math.sqrt(var)
    elif s < 0:
        z = (s + 1.0) / math.sqrt(var)
    else:
        z = 0.0
    return s, var18, round(z, 6)


def test_matches_sequential_reference(spark):
    vs = [float((i * 7) % 11) + 0.2 * i for i in range(30)]
    got = mann_kendall_by_key(_mk(spark, {"a": vs}), by="k",
                              ts_col="t", value_col="v",
                              tiebreak_col="t").head()
    s, var18, z = _ref(vs)
    assert (got["s"], got["var18"], got["z"]) == (s, var18, z)


def test_monotone_series_extreme_s(spark):
    up = [float(i) for i in range(20)]
    down = [float(-i) for i in range(20)]
    got = {r["k"]: r for r in mann_kendall_by_key(
        _mk(spark, {"up": up, "down": down}), by="k", ts_col="t",
        value_col="v", tiebreak_col="t").collect()}
    assert got["up"]["s"] == 190          # n(n-1)/2 — every pair up
    assert got["down"]["s"] == -190
    assert got["up"]["z"] > 4 and got["down"]["z"] < -4


def test_tie_correction_and_constant_null(spark):
    # heavy ties shrink var18 below the no-tie value
    tied = [float(i % 3) + 0.0001 * 0 for i in range(15)]
    s, var18, z = _ref(tied)
    got = mann_kendall_by_key(_mk(spark, {"a": tied}), by="k",
                              ts_col="t", value_col="v",
                              tiebreak_col="t").head()
    assert got["var18"] == var18 < 15 * 14 * 35
    assert got["z"] == z
    const = [2.0] * 10
    got = mann_kendall_by_key(_mk(spark, {"c": const}), by="k",
                              ts_col="t", value_col="v",
                              tiebreak_col="t").head()
    assert got["z"] is None and got["s"] == 0


def test_duplicate_timestamps_counted_under_tiebreak(spark):
    """ADVICE r3: same-timestamp pairs ARE counted, ordered by the
    unique tiebreak — pin the documented (ts, tiebreak) total-order
    convention with duplicated timestamps."""
    # ts has duplicates; tb is the unique finer clock
    rows = [("a", 0, 0, 1.0), ("a", 0, 1, 3.0),   # same ts, tb-ordered
            ("a", 1, 2, 2.0), ("a", 1, 3, 5.0),   # same ts again
            ("a", 2, 4, 4.0)]
    df = spark.createDataFrame(
        rows, "k string, t long, tb long, v double")
    got = mann_kendall_by_key(df, by="k", ts_col="t", value_col="v",
                              tiebreak_col="tb").head()
    # sequential reference over the (t, tb) total order
    vs = [v for (_, _, _, v) in sorted(rows, key=lambda r: (r[1], r[2]))]
    s, var18, z = _ref(vs)
    assert (got["s"], got["var18"], got["z"]) == (s, var18, z)
    # and the same-time pairs really contribute: dropping them would
    # give a different S (pairs (1,3) and (2,5) both ascend)
    ms = [round(v * 1e6) for v in vs]
    order = sorted(range(5), key=lambda i: (rows[i][1], rows[i][2]))
    s_drop = sum(
        (1 if ms[j] > ms[i] else -1 if ms[j] < ms[i] else 0)
        for i in range(5) for j in range(i + 1, 5)
        if rows[order[i]][1] != rows[order[j]][1])
    assert s != s_drop
