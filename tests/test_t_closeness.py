"""t-closeness audit (operators/privacy.t_closeness)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.privacy import t_closeness

pytestmark = pytest.mark.usefixtures("spark")


def _ref_tvd(rows):
    """rows: (quasi, sens).  Returns {quasi: tvd} by direct fractions."""
    from collections import Counter
    cells = Counter(rows)
    cls = Counter(q for q, _ in rows)
    voc = Counter(s for _, s in rows)
    n = len(rows)
    out = {}
    for q in cls:
        num = sum(abs(cells.get((q, s), 0) * n - voc[s] * cls[q])
                  for s in voc)
        out[q] = round(num / 2 / cls[q] / n, 6)
    return out


def _run(spark, rows, t_max_micro=200_000):
    df = spark.createDataFrame([(q, s) for q, s in rows],
                               "q string, s string")
    out = t_closeness(df, quasi_cols=["q"], sensitive_col="s",
                      t_max_micro=t_max_micro).collect()
    return {r["q"]: r for r in out}


def test_reference_equality_and_skew_attack(spark):
    # class 'a' is 80% 'cancer' while the corpus is 20% — l-diversity
    # (2 distinct values in 'a') passes, t-closeness must flag it
    rows = [("a", "cancer")] * 8 + [("a", "flu")] * 2
    rows += [("b", "flu")] * 30 + [("b", "cancer")] * 2
    got = _run(spark, rows)
    want = _ref_tvd(rows)
    for q in want:
        assert got[q]["tvd"] == pytest.approx(want[q], abs=1e-6), q
    assert got["a"]["at_risk_t"]
    assert not got["b"]["at_risk_t"]
    assert got["a"]["class_size"] == 10


def test_class_matching_global_distribution_has_zero_tvd(spark):
    rows = ([("a", "x")] * 3 + [("a", "y")] * 1
            + [("b", "x")] * 6 + [("b", "y")] * 2)
    got = _run(spark, rows)
    assert got["a"]["tvd"] == 0.0
    assert got["b"]["tvd"] == 0.0


def test_missing_global_value_accrues_distance(spark):
    # class 'c' never holds 'y' → |0·N − N_y·n_c| enters its sum
    rows = [("c", "x")] * 5 + [("d", "y")] * 5
    got = _run(spark, rows)
    assert got["c"]["tvd"] == 0.5
    assert got["d"]["tvd"] == 0.5


def test_null_sensitive_is_a_category(spark):
    rows = [("a", None)] * 4 + [("b", "v")] * 4
    got = _run(spark, rows)
    # a is all-NULL vs corpus 50% NULL → tvd = 0.5 for both classes
    assert got["a"]["tvd"] == 0.5
    assert got["b"]["tvd"] == 0.5


def test_partitioning_invariance(spark):
    rows = [(f"q{i % 5}", f"s{(i * 7) % 11}") for i in range(200)]
    df = spark.createDataFrame(rows, "q string, s string")
    a = sorted(tuple(r) for r in t_closeness(
        df.coalesce(1), quasi_cols=["q"], sensitive_col="s").collect())
    b = sorted(tuple(r) for r in t_closeness(
        df.repartition(7), quasi_cols=["q"], sensitive_col="s").collect())
    assert a == b
