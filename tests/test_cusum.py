"""cusum_stats: the closed-form (prefix-sum minus running-min) CUSUM
must equal the imperative recursion S_t = max(0, S_{t-1} + a_t) exactly,
alarm accounting and warmup/leakage edges included."""

from __future__ import annotations

from ultraviolet_spark.operators.windows import cusum_stats


def _py_cusum(series, warmup, allowance, threshold):
    """Direct imperative reference (the recursion, not the closed form)."""
    n = len(series)
    base = sum(series[:warmup])
    su = sd = 0
    max_u = max_d = 0
    alarms_u = alarms_d = 0
    first_alarm = None
    h = warmup * threshold
    for t in range(warmup, n):
        x = series[t]
        su = max(0, su + (warmup * x - base - warmup * allowance))
        sd = max(0, sd + (base - warmup * x - warmup * allowance))
        max_u = max(max_u, su)
        max_d = max(max_d, sd)
        if su > h:
            alarms_u += 1
        if sd > h:
            alarms_d += 1
        if (su > h or sd > h) and first_alarm is None:
            first_alarm = t
    return dict(n_obs=n, max_cusum_up=max_u, max_cusum_down=max_d,
                n_alarms_up=alarms_u, n_alarms_down=alarms_d,
                first_alarm_idx=first_alarm)


SERIES = {
    # upward shift after obs 5
    "up": [10, 11, 10, 10, 11, 30, 32, 31, 33, 30],
    # downward shift
    "down": [20, 21, 19, 20, 20, 5, 4, 6, 5, 5],
    # stable — no alarms
    "flat": [15, 15, 15, 15, 15, 15, 15],
    # shorter than warmup — zero everything
    "tiny": [7, 8],
    # oscillating around baseline — running min must keep resetting S
    "osc": [10, 10, 10, 30, -10, 30, -10, 30, -10],
}


def _run(spark, warmup=3, allowance=2, threshold=10):
    rows = [(k, i, float(v))
            for k, s in SERIES.items() for i, v in enumerate(s)]
    df = spark.createDataFrame(rows, "k string, t long, value double")
    # scale=1: the test series are integers already
    out = cusum_stats(df, by="k", order="t", value_col="value",
                      warmup=warmup, allowance=allowance,
                      threshold=threshold, scale=1)
    return {r.k: r for r in out.collect()}


def test_matches_imperative_recursion(spark):
    got = _run(spark)
    for k, s in SERIES.items():
        want = _py_cusum(s, 3, 2, 10)
        r = got[k]
        assert r.n_obs == want["n_obs"], k
        assert r.max_cusum_up == want["max_cusum_up"], k
        assert r.max_cusum_down == want["max_cusum_down"], k
        assert r.n_alarms_up == want["n_alarms_up"], k
        assert r.n_alarms_down == want["n_alarms_down"], k
        if want["first_alarm_idx"] is None:
            assert r.first_alarm_ts is None, k
        else:
            assert r.first_alarm_ts == want["first_alarm_idx"], k


def test_warmup_rows_never_alarm(spark):
    # a violent swing INSIDE the warmup must not trip anything
    rows = [("w", 0, 0.0), ("w", 1, 1000.0), ("w", 2, -1000.0),
            ("w", 3, 0.0), ("w", 4, 0.0)]
    df = spark.createDataFrame(rows, "k string, t long, value double")
    r = cusum_stats(df, by="k", order="t", value_col="value",
                    warmup=3, allowance=0, threshold=10, scale=1).collect()[0]
    # baseline sum = 0; post-warmup values equal baseline mean → S stays 0
    assert r.max_cusum_up == 0 and r.max_cusum_down == 0
    assert r.first_alarm_ts is None


def test_baseline_uses_only_past_rows_of_tested_rows(spark):
    # leakage probe: append a huge FUTURE value — stats of earlier
    # tested rows must be unchanged (prefix stability)
    base_rows = [("p", i, float(v)) for i, v in enumerate(SERIES["up"])]
    ext_rows = base_rows + [("p", 99, 10_000.0)]
    kw = dict(by="k", order="t", value_col="value",
              warmup=3, allowance=2, threshold=10, scale=1)
    df1 = spark.createDataFrame(base_rows, "k string, t long, value double")
    df2 = spark.createDataFrame(ext_rows, "k string, t long, value double")
    r1 = cusum_stats(df1, **kw).collect()[0]
    r2 = cusum_stats(df2, **kw).collect()[0]
    # first alarm happens long before t=99 → identical
    assert r1.first_alarm_ts == r2.first_alarm_ts


def test_single_key_exchange(spark):
    rows = [("k", i, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, t long, value double")
    out = cusum_stats(df, by="k", order="t", value_col="value", scale=1)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    # both window passes + the groupBy share ONE hash exchange on the key
    assert plan.count(") Exchange") <= 1, plan
