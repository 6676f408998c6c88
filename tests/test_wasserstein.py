"""w1_distance: brute-force integral equality, the equal-sample-size
sorted-coupling identity W₁ = (1/n)Σ|x₍ᵢ₎ − y₍ᵢ₎|, pure-shift
exactness, and zero on identical samples."""

from __future__ import annotations

from ultraviolet_spark.operators.stats import w1_distance

SCHEMA = "id long, grp string, value double"


def _brute(a_vals, b_vals):
    a = sorted(round(x * 1e6) for x in a_vals)
    b = sorted(round(x * 1e6) for x in b_vals)
    na, nb = len(a), len(b)
    support = sorted(set(a) | set(b))
    num = 0
    for v, nxt in zip(support, support[1:]):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        num += abs(ca * nb - cb * na) * (nxt - v)
    return round(num / (na * nb) / 1e6, 6)


def _run(spark, a_vals, b_vals):
    rows = [(i, "A", float(x)) for i, x in enumerate(a_vals)] + \
           [(500 + i, "B", float(x)) for i, x in enumerate(b_vals)]
    df = spark.createDataFrame(rows, SCHEMA)
    return w1_distance(df, value_col="value", group_col="grp",
                       group_a="A", group_b="B").head()["w1"]


def test_matches_brute_force(spark):
    a = [1.0, 2.5, 2.5, 4.0, 7.25, 9.0]
    b = [0.5, 2.5, 3.0, 3.0, 8.5, 11.0, 1.25]
    assert _run(spark, a, b) == _brute(a, b)


def test_sorted_coupling_identity_equal_n(spark):
    # equal sizes: W1 = (1/n) Σ |x_(i) − y_(i)|
    a = [3.0, 1.0, 7.0, 5.0]
    b = [2.0, 8.0, 4.0, 0.5]
    want = sum(abs(x - y) for x, y in
               zip(sorted(a), sorted(b))) / len(a)
    assert abs(_run(spark, a, b) - want) < 1e-6


def test_pure_shift_is_the_shift(spark):
    a = [1.0, 2.0, 3.0, 10.0]
    b = [x + 2.5 for x in a]
    assert abs(_run(spark, a, b) - 2.5) < 1e-6


def test_identical_is_zero(spark):
    a = [1.0, 5.0, 5.0, 9.0]
    assert _run(spark, a, a) == 0.0
