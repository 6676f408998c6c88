"""Jonckheere-Terpstra ordered trend (operators/stats.jonckheere_terpstra)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import jonckheere_terpstra

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, groups):
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    return spark.createDataFrame(rows, "grp string, v double")


def _ref(groups, order):
    import math
    from collections import Counter

    vals = {g: [round(v * 1e6) for v in groups[g]] for g in order}
    jt2 = 0
    for i, gi in enumerate(order):
        for hi in order[i + 1:]:
            for a in vals[gi]:
                for b in vals[hi]:
                    jt2 += 2 if a < b else (1 if a == b else 0)
    ns = [len(vals[g]) for g in order]
    n = sum(ns)
    e2 = sum(ns[i] * ns[j] for i in range(len(ns))
             for j in range(i + 1, len(ns)))
    allv = Counter(v for g in order for v in vals[g])
    t1 = sum(m * (m - 1) * (2 * m + 5) for m in allv.values())
    t2 = sum(m * (m - 1) * (m - 2) for m in allv.values())
    t3 = sum(m * (m - 1) for m in allv.values())
    g1 = sum(x * (x - 1) * (2 * x + 5) for x in ns)
    g2 = sum(x * (x - 1) * (x - 2) for x in ns)
    g3 = sum(x * (x - 1) for x in ns)
    var = ((n * (n - 1) * (2 * n + 5) - g1 - t1) / 72.0
           + g2 * t2 / (36.0 * n * (n - 1) * (n - 2))
           + g3 * t3 / (8.0 * n * (n - 1)))
    z = (jt2 - e2) / 2.0 / math.sqrt(var) if var > 0 else None
    return jt2, e2, (round(z, 6) if z is not None else None)


def test_matches_sequential_reference(spark):
    groups = {"a": [1.0, 3.0, 2.0, 2.0, 5.0],
              "b": [2.0, 4.0, 4.0, 6.0],
              "c": [5.0, 7.0, 6.0, 6.0, 9.0, 2.0]}
    order = ["a", "b", "c"]
    got = jonckheere_terpstra(_mk(spark, groups), value_col="v",
                              group_col="grp", order=order).head()
    jt2, e2, z = _ref(groups, order)
    assert (got["jt2"], got["e2"]) == (jt2, e2)
    assert got["z"] == pytest.approx(z, abs=2e-6)


def test_ordered_trend_fires_reverse_negates(spark):
    groups = {"lo": [float(i) for i in range(20)],
              "mid": [float(i + 15) for i in range(20)],
              "hi": [float(i + 30) for i in range(20)]}
    up = jonckheere_terpstra(_mk(spark, groups), value_col="v",
                             group_col="grp",
                             order=["lo", "mid", "hi"]).head()
    dn = jonckheere_terpstra(_mk(spark, groups), value_col="v",
                             group_col="grp",
                             order=["hi", "mid", "lo"]).head()
    assert up["z"] > 4
    assert dn["z"] == -up["z"]   # reversing the order mirrors JT
    # KW is order-blind: it cannot distinguish the two hypotheses --
    # JT's whole reason to exist


def test_all_tied_null_and_group_filter(spark):
    groups = {"a": [2.0] * 5, "b": [2.0] * 6, "zz": [9.0] * 4}
    got = jonckheere_terpstra(_mk(spark, groups), value_col="v",
                              group_col="grp", order=["a", "b"]).head()
    assert got["z"] is None          # all in-order values tied
    assert got["n"] == 11            # 'zz' rows excluded
