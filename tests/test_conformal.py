"""split_conformal: exact rank arithmetic vs a sequential reference,
the finite-sample coverage guarantee on the actual split, the vacuous
k > n policy, and the near-integer ceiling edge case."""

from __future__ import annotations

import hashlib

from ultraviolet_spark.operators.evalmetrics import split_conformal

SCHEMA = "event_id long, value double"


def _bucket(i):
    return int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16)


def _py_ref(rows, a_num, a_den):
    cal = sorted(round(v * 1e6) for i, v in rows if _bucket(i) < 128)
    test = [round(v * 1e6) for i, v in rows if _bucket(i) >= 128]
    n = len(cal)
    k = ((n + 1) * (a_den - a_num) + a_den - 1) // a_den
    qhat = cal[k - 1] if k <= n else None
    cov = [v for v in test if qhat is None or v <= qhat]
    return dict(n_cal=n, k=k, qhat_micro=qhat, n_test=len(test),
                n_covered=len(cov),
                coverage=round(len(cov) / len(test), 6))


def _run(spark, rows, a_num, a_den):
    df = spark.createDataFrame(rows, SCHEMA)
    return split_conformal(df, value_col="value", id_col="event_id",
                           a_num=a_num, a_den=a_den).head().asDict()


def test_matches_sequential_reference(spark):
    rows = [(i, float((i * 37) % 101) / 7.0) for i in range(400)]
    for a_num, a_den in [(1, 10), (1, 4), (3, 10)]:
        assert _run(spark, rows, a_num, a_den) == _py_ref(rows, a_num,
                                                          a_den)


def test_coverage_guarantee_holds(spark):
    rows = [(i, float((i * 37) % 101) / 7.0) for i in range(400)]
    got = _run(spark, rows, 1, 10)
    # the split-conformal bound: coverage ≥ 1 − α on exchangeable data
    assert got["coverage"] >= 0.9 - 0.05  # small-sample slack


def test_vacuous_k_gt_n_policy(spark):
    # 3 calibration-side rows at α = 1/10 → k = ⌈(4)·9/10⌉ = 4 > 3:
    # q̂ NULL, every test row covered
    cal_ids = [i for i in range(100) if _bucket(i) < 128][:3]
    test_ids = [i for i in range(100) if _bucket(i) >= 128][:5]
    rows = [(i, float(i)) for i in cal_ids + test_ids]
    got = _run(spark, rows, 1, 10)
    assert got["k"] == 4 and got["qhat_micro"] is None
    assert got["n_covered"] == got["n_test"] and got["coverage"] == 1.0


def test_near_integer_ceiling_exact(spark):
    # n_cal such that (n+1)(1−α) is an exact integer: k must equal it,
    # not one above (the float-ceil off-by-one this integer form avoids)
    cal_ids = [i for i in range(2000) if _bucket(i) < 128][:19]
    rows = [(i, float(i)) for i in cal_ids] + \
        [(9999, 1.0)]  # ensure a test row exists (bucket(9999) ≥ 128?)
    # pick a guaranteed test id
    test_id = next(i for i in range(2000, 3000) if _bucket(i) >= 128)
    rows = [(i, float(i)) for i in cal_ids] + [(test_id, 1.0)]
    got = _run(spark, rows, 1, 10)
    # n=19 → (20)·9/10 = 18 exactly
    assert got["n_cal"] == 19 and got["k"] == 18
