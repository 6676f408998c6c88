"""mad_outliers and target_encode_loo vs plain-Python references."""
from __future__ import annotations

import math

from ultraviolet_spark.operators.encoding import target_encode_loo
from ultraviolet_spark.operators.stats import mad_outliers


def _median(xs):
    s = sorted(xs)
    n = len(s)
    mid = (n - 1) / 2
    lo, hi = s[math.floor(mid)], s[math.ceil(mid)]
    return lo + (hi - lo) * (mid - math.floor(mid))


def test_mad_outliers_reference(spark):
    data = [("a", v) for v in [1.0, 2.0, 3.0, 4.0, 100.0]] + \
           [("b", v) for v in [10.0, 10.0, 10.5, 11.0]]
    df = spark.createDataFrame(data, "grp string, value double")
    got = {r["grp"]: r for r in
           mad_outliers(df, value_col="value", by="grp", k=3.0).collect()}
    for g in ("a", "b"):
        xs = [v for k, v in data if k == g]
        med = round(_median(xs), 6)
        mad = round(_median([abs(x - med) for x in xs]), 6)
        n_out = sum(1 for x in xs if abs(x - med) > 3.0 * mad)
        r = got[g]
        assert r["n"] == len(xs)
        assert math.isclose(r["med"], med, abs_tol=1e-9)
        assert math.isclose(r["mad"], mad, abs_tol=1e-9)
        assert r["n_outliers"] == n_out, g
    assert got["a"]["n_outliers"] == 1  # the 100.0


def test_target_encode_loo_reference(spark):
    data = [(0, "x", 1.0), (1, "x", 3.0), (2, "x", 5.0),
            (3, "y", 10.0), (4, "z", 7.0)]  # z is a singleton
    df = spark.createDataFrame(data, "id long, cat string, label double")
    m, unit = 10, 1_000_000
    q = {i: math.floor(v * unit + 0.5) for i, _, v in data}
    sg, nn = sum(q.values()), len(data)
    got = {r["id"]: r["te"]
           for r in target_encode_loo(df, cat_col="cat", label_col="label",
                                      id_col="id", m=m).collect()}
    for i, c, _ in data:
        s = sum(q[j] for j, cc, _ in data if cc == c)
        n = sum(1 for _, cc, _ in data if cc == c)
        te = ((s - q[i]) * nn + m * sg) / (nn * (n - 1 + m) * unit)
        assert got[i] == te, i  # bit-exact: same ints, same IEEE divide
    # singleton category: exactly the global prior (own label excluded,
    # smoothing denominator m cancels)
    assert got[4] == (m * sg) / (nn * m * unit)


def test_target_encode_no_self_leak(spark):
    # two rows in one category with wildly different labels must get
    # DIFFERENT encodings (each excludes itself)
    df = spark.createDataFrame(
        [(0, "x", 0.0), (1, "x", 1000.0), (2, "y", 5.0)],
        "id long, cat string, label double")
    got = {r["id"]: r["te"]
           for r in target_encode_loo(df, cat_col="cat", label_col="label",
                                      id_col="id", m=1).collect()}
    assert got[0] > got[1]  # row 0 sees the 1000, row 1 sees the 0
