"""Exact Shapley channel attribution (operators/funnel.shapley_attribution).

Reference: itertools permutation-average Shapley over the same
characteristic function v(S) = conv(S)/N — mathematically identical to
the subset-lattice form the operator computes.
"""

from __future__ import annotations

from itertools import permutations

import pytest

from ultraviolet_spark.operators.funnel import shapley_attribution

pytestmark = pytest.mark.usefixtures("spark")


def _ref_shapley(users):
    """users: list of (channel_set, converted).  Returns {ch: phi}."""
    chans = sorted({c for s, _ in users for c in s})
    n = len(users)

    def conv(S):
        return sum(1 for s, cv in users if cv and s <= S)

    phi = {c: 0.0 for c in chans}
    perms = list(permutations(chans))
    for order in perms:
        seen = set()
        for c in order:
            phi[c] += (conv(seen | {c}) - conv(seen)) / n
            seen.add(c)
    return {c: round(v / len(perms), 6) for c, v in phi.items()}


def _run(spark, users):
    rows = []
    for i, (chset, cv) in enumerate(users):
        if chset:
            rows += [(i, c, bool(cv)) for c in sorted(chset)]
        else:
            rows.append((i, None, bool(cv)))
    df = spark.createDataFrame(rows, "u long, channel string, cv boolean")
    out = shapley_attribution(df, user_col="u", channel_col="channel",
                              converted_col="cv").collect()
    return {r["channel"]: r for r in out}


def test_reference_equality(spark):
    users = [
        ({"a"}, True), ({"a", "b"}, True), ({"b"}, False),
        ({"a", "b", "c"}, True), ({"c"}, False), ({"b", "c"}, True),
        (set(), False), ({"a", "c"}, False),
    ]
    got = _run(spark, users)
    want = _ref_shapley(users)
    assert set(got) == set(want)
    for c in want:
        assert got[c]["phi_share"] == pytest.approx(want[c], abs=2e-6), c
    assert all(r["n_users"] == 8 and r["n_channels"] == 3
               for r in got.values())


def test_efficiency_axiom(spark):
    users = [({"x"}, True), ({"y"}, True), ({"x", "y"}, False),
             (set(), True), ({"y"}, False)]
    got = _run(spark, users)
    total = sum(r["phi_share"] for r in got.values())
    # Σφ = (conv(full) − conv(∅))/N = (3 − 1)/5
    assert total == pytest.approx(2 / 5, abs=2e-6)


def test_symmetry_axiom(spark):
    # p and q always appear together → identical marginal contributions
    users = [({"p", "q"}, True), ({"p", "q"}, False), ({"r"}, True),
             ({"p", "q", "r"}, True)]
    got = _run(spark, users)
    assert got["p"]["phi_share"] == got["q"]["phi_share"]


def test_dummy_axiom(spark):
    # 'd' is touched only by non-converters → zero credit
    users = [({"a"}, True), ({"a", "d"}, False), ({"d"}, False),
             ({"a"}, True)]
    got = _run(spark, users)
    assert got["d"]["phi_share"] == 0.0
    assert got["a"]["phi_share"] > 0.0


def test_null_channel_users_counted_in_n(spark):
    users = [({"a"}, True), (set(), False), (set(), False), (set(), True)]
    got = _run(spark, users)
    assert got["a"]["n_users"] == 4
    # the no-channel converter sits in v(∅), cancels in every margin:
    # a's credit is 1/4 (its own converter) not 2/4
    assert got["a"]["phi_share"] == pytest.approx(0.25, abs=2e-6)
