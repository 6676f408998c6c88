"""Kruskal-Wallis H (operators/stats.kruskal_wallis)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import kruskal_wallis

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, groups):
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    return spark.createDataFrame(rows, "grp string, v double")


def _ref(groups):
    """Sequential midrank KW via the rank-ANOVA identity."""
    all_vals = sorted(
        round(v * 1e6) for vs in groups.values() for v in vs)
    n = len(all_vals)
    # midrank per distinct value
    mid = {}
    i = 0
    while i < n:
        j = i
        while j < n and all_vals[j] == all_vals[i]:
            j += 1
        mid[all_vals[i]] = (i + 1 + j) / 2
        i = j
    rbar = (n + 1) / 2
    ss_total = sum((mid[round(v * 1e6)] - rbar) ** 2
                   for vs in groups.values() for v in vs)
    ss_between = 0.0
    for g in sorted(groups):
        vs = groups[g]
        rg = sum(mid[round(v * 1e6)] for v in vs) / len(vs)
        ss_between += len(vs) * (rg - rbar) ** 2
    if ss_total == 0:
        return None
    return (n - 1) * ss_between / ss_total


def test_matches_sequential_reference(spark):
    groups = {"a": [1.0, 2.5, 3.0, 7.0, 2.5],
              "b": [4.0, 5.5, 5.5, 8.0],
              "c": [0.5, 2.5, 9.0, 9.0, 1.5, 6.0]}
    got = kruskal_wallis(_mk(spark, groups), value_col="v",
                         group_col="grp").head()
    want = _ref(groups)
    assert got["k"] == 3 and got["n"] == 15
    assert got["h"] == pytest.approx(want, abs=2e-6)


def test_shifted_groups_fire_identical_shapes_do_not(spark):
    base = [float((i * 7) % 13) + 0.25 * (i % 4) for i in range(40)]
    sep = {"a": base, "b": [v + 50.0 for v in base],
           "c": [v + 100.0 for v in base]}
    same = {"a": base, "b": list(base), "c": list(base)}
    h_sep = kruskal_wallis(_mk(spark, sep), value_col="v",
                           group_col="grp").head()["h"]
    h_same = kruskal_wallis(_mk(spark, same), value_col="v",
                            group_col="grp").head()["h"]
    # fully separated groups approach the maximum (N-1 scaled); equal
    # distributions give H ~ 0
    assert h_sep > 50 and h_same == pytest.approx(0.0, abs=1e-9)


def test_rank_invariance_and_degenerate_null(spark):
    groups = {"a": [1.0, 3.0, 5.0], "b": [2.0, 4.0, 6.0, 8.0]}
    # monotone transform of the values leaves H unchanged (pure ranks)
    warped = {g: [v ** 3 / 100 for v in vs] for g, vs in groups.items()}
    h1 = kruskal_wallis(_mk(spark, groups), value_col="v",
                        group_col="grp").head()["h"]
    h2 = kruskal_wallis(_mk(spark, warped), value_col="v",
                        group_col="grp").head()["h"]
    assert h1 == h2
    # all values identical: zero total SS -> NULL
    got = kruskal_wallis(_mk(spark, {"a": [2.0] * 4, "b": [2.0] * 5}),
                         value_col="v", group_col="grp").head()
    assert got["h"] is None


def test_no_data_sized_broadcast_on_value_join(spark):
    """ADVICE r4: the per-group midrank join used to broadcast the full
    distinct-value frame — for a near-unique continuous value column
    that frame is ~N rows, i.e. a driver-side collect of the data.
    Pin the plan: the only remaining broadcast exchanges are the
    bounded metadata frames (1-row bounds, B-row bucket offsets, 1-row
    totals), never the __v-keyed midrank side."""
    rows = [("g%d" % (i % 3), float(i) + 0.001 * i) for i in range(500)]
    df = spark.createDataFrame(rows, "grp string, v double")
    plan = kruskal_wallis(
        df, value_col="v", group_col="grp")._jdf.queryExecution() \
        .executedPlan().toString()
    import re
    # the midrank join must shuffle on __v (SortMergeJoin /
    # ShuffledHashJoin), never build a broadcast HashedRelation keyed
    # on __v — broadcasts keyed on __b (B-row bucket offsets) and the
    # 1-row bounds/totals crosses remain fine
    assert not re.search(r"BroadcastHashJoin \[__v#", plan), plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin) \[__v#", plan), plan
