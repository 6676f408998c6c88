"""Cochran-Armitage trend test (operators/stats.cochran_armitage)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.stats import cochran_armitage

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, groups):
    rows = [(g, int(y)) for g, ys in groups.items() for y in ys]
    return spark.createDataFrame(rows, "grp string, y long")


def _ref(groups, order):
    pairs = [(t, y) for t, g in enumerate(order) for y in groups[g]]
    n = len(pairs)
    r = sum(y for _, y in pairs)
    tr = sum(t * y for t, y in pairs)
    tn = sum(t for t, _ in pairs)
    t2n = sum(t * t for t, _ in pairs)
    var = r * (n - r) * (n * t2n - tn * tn)
    if var <= 0:
        return None
    return round(math.sqrt(n) * (n * tr - r * tn) / math.sqrt(var), 6)


def test_matches_sequential_reference(spark):
    groups = {"a": [0, 1, 0, 0, 1, 0], "b": [1, 0, 1, 1, 0],
              "c": [1, 1, 1, 0, 1, 1, 1]}
    order = ["a", "b", "c"]
    got = cochran_armitage(_mk(spark, groups), group_col="grp",
                           label_expr="y = 1", order=order).head()
    assert got["z"] == _ref(groups, order)
    assert got["n"] == 18 and got["r_pos"] == 11


def test_monotone_trend_fires_reverse_negates(spark):
    groups = {"lo": [1] * 2 + [0] * 18, "mid": [1] * 10 + [0] * 10,
              "hi": [1] * 18 + [0] * 2}
    up = cochran_armitage(_mk(spark, groups), group_col="grp",
                          label_expr="y = 1",
                          order=["lo", "mid", "hi"]).head()
    dn = cochran_armitage(_mk(spark, groups), group_col="grp",
                          label_expr="y = 1",
                          order=["hi", "mid", "lo"]).head()
    assert up["z"] > 4 and dn["z"] == -up["z"]


def test_degenerate_null_and_group_filter(spark):
    # all-positive outcome: zero outcome variance -> NULL
    groups = {"a": [1] * 5, "b": [1] * 6, "zz": [0] * 3}
    got = cochran_armitage(_mk(spark, groups), group_col="grp",
                           label_expr="y = 1", order=["a", "b"]).head()
    assert got["z"] is None and got["n"] == 11   # 'zz' excluded
