"""ks_mw_tests: exact equality with a brute-force pairwise Python
reference (including tie credit), degenerate-identity sanity, and the
bucketed-prefix plan shape."""

from __future__ import annotations

from ultraviolet_spark.operators.stats import ks_mw_tests

SCHEMA = "id long, grp string, value double"


def _brute(a_vals, b_vals):
    a = [round(x * 1e6) for x in a_vals]
    b = [round(x * 1e6) for x in b_vals]
    na, nb = len(a), len(b)
    # KS numerator over the merged support
    support = sorted(set(a) | set(b))
    ks = max(abs(sum(1 for x in a if x <= v) * nb
                 - sum(1 for x in b if x <= v) * na)
             for v in support)
    # doubled Mann–Whitney U_A with half-credit ties
    u2 = sum(2 for x in a for y in b if x > y) \
        + sum(1 for x in a for y in b if x == y)
    return dict(n_a=na, n_b=nb, ks_num=ks,
                ks_stat=round(ks / (na * nb), 6), u2_a=u2,
                auc_a=round(u2 / (2 * na * nb), 6))


def _run(spark, a_vals, b_vals):
    rows = [(i, "A", float(v)) for i, v in enumerate(a_vals)] + \
           [(1000 + i, "B", float(v)) for i, v in enumerate(b_vals)] + \
           [(9999, "other", 123.0)]  # a third stratum must be ignored
    df = spark.createDataFrame(rows, SCHEMA)
    out = ks_mw_tests(df, value_col="value", group_col="grp",
                      group_a="A", group_b="B")
    return out.head().asDict()


def test_matches_brute_force(spark):
    a = [1.0, 2.5, 2.5, 4.0, 7.25, 9.0, 9.0]
    b = [0.5, 2.5, 3.0, 3.0, 8.5]
    assert _run(spark, a, b) == _brute(a, b)


def test_identical_samples(spark):
    a = [1.0, 2.0, 3.0, 4.0]
    got = _run(spark, a, a)
    assert got["ks_stat"] == 0.0 and got["auc_a"] == 0.5


def test_disjoint_samples_extreme(spark):
    # every A above every B: KS = 1, AUC_A = 1
    got = _run(spark, [10.0, 11.0, 12.0], [1.0, 2.0])
    assert got["ks_stat"] == 1.0 and got["auc_a"] == 1.0
    assert _run(spark, [10.0, 11.0], [20.0, 21.0])["auc_a"] == 0.0


def test_prefix_is_bucketed(spark):
    df = spark.createDataFrame(
        [(i, "A" if i % 2 else "B", float(i)) for i in range(20)], SCHEMA)
    out = ks_mw_tests(df, value_col="value", group_col="grp",
                      group_a="A", group_b="B")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "extended")
    data_windows = [ln for ln in plan.splitlines()
                    if "Window [" in ln and "__a_in#" in ln]
    assert data_windows
    for ln in data_windows:
        assert "[__b#" in ln, ln
    assert "hashpartitioning(__b#" in plan
