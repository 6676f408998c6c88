"""Ansari-Bradley scale test (operators/stats.ansari_bradley)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.stats import ansari_bradley

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, a_vals, b_vals):
    rows = [("a", float(v)) for v in a_vals] + \
           [("b", float(v)) for v in b_vals]
    return spark.createDataFrame(rows, "grp string, v double")


def _ref(a_vals, b_vals):
    am = [round(v * 1e6) for v in a_vals]
    bm = [round(v * 1e6) for v in b_vals]
    pooled = sorted(am + bm)
    n = len(pooled)
    # doubled midrank per distinct value, doubled AB score
    a2_of = {}
    i = 0
    while i < n:
        j = i
        while j < n and pooled[j] == pooled[i]:
            j += 1
        mr2 = (i + 1) + j          # 2*midrank
        a2_of[pooled[i]] = min(mr2, 2 * (n + 1) - mr2)
        i = j
    A2 = sum(a2_of[v] for v in am)
    s1 = sum(a2_of[v] for v in pooled)
    s2 = sum(a2_of[v] ** 2 for v in pooled)
    na, nb = len(am), len(bm)
    var_in = na * nb * (n * s2 - s1 * s1)
    if var_in <= 0:
        return A2, None
    z = (n * A2 - na * s1) / math.sqrt(var_in / (n - 1))
    return A2, round(z, 6)


def test_matches_sequential_reference(spark):
    a = [5.0 + 0.7 * ((i * 7) % 9) for i in range(18)]
    b = [6.0 + 0.2 * ((i * 5) % 11) for i in range(24)]
    got = ansari_bradley(_mk(spark, a, b), value_col="v",
                         group_col="grp", group_a="a",
                         group_b="b").head()
    A2, z = _ref(a, b)
    assert got["a2"] == A2 and got["z"] == z


def test_scale_difference_fires_equal_scales_do_not(spark):
    import random

    rng = random.Random(3)
    center = 100.0
    narrow = [center + rng.uniform(-1, 1) for _ in range(60)]
    wide = [center + rng.uniform(-20, 20) for _ in range(60)]
    same = [center + rng.uniform(-1, 1) for _ in range(60)]
    fired = ansari_bradley(_mk(spark, wide, narrow), value_col="v",
                           group_col="grp", group_a="a",
                           group_b="b").head()["z"]
    calm = ansari_bradley(_mk(spark, same, narrow), value_col="v",
                          group_col="grp", group_a="a",
                          group_b="b").head()["z"]
    # wide group's mass sits in the tails -> scores run small -> z << 0
    assert fired < -4
    assert abs(calm) < 2.5


def test_all_tied_null(spark):
    got = ansari_bradley(_mk(spark, [3.0] * 6, [3.0] * 7),
                         value_col="v", group_col="grp",
                         group_a="a", group_b="b").head()
    assert got["z"] is None and got["n_a"] == 6
