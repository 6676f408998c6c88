"""waterfill_budget: exact equality with a sequential water-filling
reference, conservation (Σalloc = min(B, Σdem)), max-min fairness
properties, and the bucketed-rank plan shape."""

from __future__ import annotations

from ultraviolet_spark.operators.frontier import waterfill_budget

SCHEMA = "host string, demand long"


def _py_waterfill(dems, budget):
    """Sequential reference: literal rank walk."""
    rows = sorted(dems.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(rows)
    s, rstar, sstar = 0, 0, 0
    for rk, (_h, d) in enumerate(rows, start=1):
        s += d
        if s + d * (n - rk) <= budget:
            rstar, sstar = rk, s
    m = n - rstar
    theta = (budget - sstar) // m if m else 0
    rem = (budget - sstar) % m if m else 0
    out = {}
    for rk, (h, d) in enumerate(rows, start=1):
        if rk <= rstar:
            out[h] = d
        elif rk - rstar <= rem:
            out[h] = theta + 1
        else:
            out[h] = theta
    return out


def _run(spark, dems, budget):
    df = spark.createDataFrame(list(dems.items()), SCHEMA)
    return {r["host"]: r["alloc"]
            for r in waterfill_budget(df, budget=budget).collect()}


CASES = [
    ({"a": 10, "b": 20, "c": 300, "d": 5}, 100),   # one giant capped
    ({"a": 10, "b": 20, "c": 30}, 1000),            # budget exceeds demand
    ({"a": 7, "b": 7, "c": 7}, 10),                 # remainder split, ties
    ({"a": 1}, 0),                                  # zero budget
    ({f"h{i}": i * i for i in range(1, 40)}, 900),  # many levels
]


def test_matches_sequential_reference(spark):
    for dems, b in CASES:
        assert _run(spark, dems, b) == _py_waterfill(dems, b), (dems, b)


def test_conservation_and_fairness(spark):
    dems = {f"h{i}": (i * 13) % 97 + 1 for i in range(60)}
    b = 1500
    got = _run(spark, dems, b)
    assert sum(got.values()) == min(b, sum(dems.values()))
    for h, a in got.items():
        assert 0 <= a <= dems[h]
    # max-min: any host below its demand is within 1 of every other
    # capped host's allocation (the water level)
    capped = [a for h, a in got.items() if a < dems[h]]
    if capped:
        assert max(capped) - min(capped) <= 1


def test_rank_is_bucketed(spark):
    df = spark.createDataFrame([(f"h{i}", i + 1) for i in range(30)],
                               SCHEMA)
    out = waterfill_budget(df, budget=50)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "extended")
    data_windows = [ln for ln in plan.splitlines()
                    if "Window [" in ln and "__rn_in#" in ln]
    assert data_windows
    for ln in data_windows:
        assert "[__b#" in ln, ln
    assert "hashpartitioning(__b#" in plan
