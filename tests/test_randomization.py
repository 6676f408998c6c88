"""Deterministic randomization test
(operators/stats.randomization_test)."""

from __future__ import annotations

import hashlib

import pytest

from ultraviolet_spark.operators.stats import randomization_test

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    return spark.createDataFrame(
        [(str(i), str(g), float(v)) for i, g, v in rows],
        "id string, g string, v double")


def _u48(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _ref(rows, B=30, salt=""):
    xs = [(str(i), g == "a", round(v * 1e6)) for i, g, v in rows]
    n = len(xs)
    n_a = sum(1 for _, ia, _ in xs if ia)
    sa = sum(x for _, ia, x in xs if ia)
    sb = sum(x for _, ia, x in xs if not ia)
    thr = ((1 << 48) * n_a) // n
    diff = round(abs(sa / n_a - sb / (n - n_a)))
    h = 0
    for b in range(B):
        ra = psa = psb = 0
        for i, _, x in xs:
            if _u48(f"{i}:{b}:{salt}") < thr:
                ra += 1
                psa += x
            else:
                psb += x
        if ra == 0 or ra == n:
            continue
        d = round(abs(psa / ra - psb / (n - ra)))
        if d >= diff:
            h += 1
    return diff, h + 1, round((h + 1) / (B + 1), 6)


def test_matches_sequential_reference(spark):
    rows = [(i, "a" if i % 2 == 0 else "b",
             1.0 + (i % 7) * 0.5 + (0.8 if i % 2 == 0 else 0))
            for i in range(60)]
    got = randomization_test(_mk(spark, rows), id_col="id",
                             group_col="g", group_a="a",
                             value_col="v", n_reps=30).head()
    diff, p_num, p = _ref(rows)
    assert (got["diff_micro"], got["p_num"], got["p"]) == (diff, p_num, p)
    assert (got["n"], got["n_a"], got["n_b"]) == (60, 30, 30)


def test_planted_effect_minimum_p(spark):
    # enormous separation: no random relabeling reproduces it
    rows = [(i, "a", 100.0 + i * 0.01) for i in range(25)]
    rows += [(100 + i, "b", 1.0 + i * 0.01) for i in range(25)]
    got = randomization_test(_mk(spark, rows), id_col="id",
                             group_col="g", group_a="a",
                             value_col="v", n_reps=30).head()
    assert got["p_num"] == 1                 # only the +1
    assert got["p"] == round(1 / 31, 6)


def test_null_distribution_large_p(spark):
    # identical distributions → the observed diff is tiny → most
    # relabelings are at least as extreme
    rows = [(i, "a" if i % 2 == 0 else "b", float(i % 5))
            for i in range(80)]
    got = randomization_test(_mk(spark, rows), id_col="id",
                             group_col="g", group_a="a",
                             value_col="v", n_reps=30).head()
    diff, p_num, p = _ref(rows)
    assert got["p"] == p
    assert got["p"] > 0.2


def test_single_group_null(spark):
    rows = [(i, "a", 1.0) for i in range(5)]
    got = randomization_test(_mk(spark, rows), id_col="id",
                             group_col="g", group_a="a",
                             value_col="v", n_reps=10).head()
    assert got["p"] is None and got["diff_micro"] is None
