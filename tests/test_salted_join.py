"""salted_join: result-identity with the plain join across every
supported join type, per-key-factor and uniform paths, hot-key slice
spreading actually happens, unsupported modes refused."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ultraviolet_spark.operators.skew import salted_join, suggest_salt


def _frames(spark):
    left = spark.createDataFrame(
        [(0, i) for i in range(50)]        # hot key
        + [(1, 100), (2, 200), (9, 900)],  # cold keys; 9 unmatched
        "k long, lv long")
    right = spark.createDataFrame(
        [(0, "zero"), (1, "one"), (2, "two"), (3, "three")],
        "k long, rv string")
    return left, right


@pytest.mark.parametrize("how", ["inner", "left", "left_semi",
                                 "left_anti"])
def test_identical_to_plain_join(spark, how):
    left, right = _frames(spark)
    salts = suggest_salt(left, "k", target_per_key=10)
    got = sorted(map(tuple,
                     salted_join(left, right, "k", salts=salts,
                                 how=how).collect()))
    want = sorted(map(tuple, left.join(right, "k", how).collect()))
    assert got == want


def test_uniform_factor_path(spark):
    left, right = _frames(spark)
    got = sorted(map(tuple,
                     salted_join(left, right, "k", factor=4).collect()))
    want = sorted(map(tuple, left.join(right, "k").collect()))
    assert got == want


def test_hot_key_actually_spreads(spark):
    # internal check: the hot key's rows must land in >1 salt slice —
    # otherwise the operator silently degenerated to a plain join
    left, right = _frames(spark)
    salts = suggest_salt(left, "k", target_per_key=10)
    n = salts.filter(F.col("k") == 0).head()["n_salts"]
    assert n >= 2
    slices = (left.filter(F.col("k") == 0)
              .withColumn("__s", F.pmod(F.xxhash64("k", "lv"), F.lit(n)))
              .select("__s").distinct().count())
    assert slices >= 2


def test_bad_modes_refused(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="right/full"):
        salted_join(left, right, "k", factor=2, how="right")
    with pytest.raises(ValueError, match="exactly one"):
        salted_join(left, right, "k")
    with pytest.raises(ValueError, match="exactly one"):
        salted_join(left, right, "k", factor=2,
                    salts=suggest_salt(left, "k", target_per_key=10))
    with pytest.raises(ValueError, match=">= 1"):
        salted_join(left, right, "k", factor=0)


def test_duplicate_right_rows_preserved(spark):
    # a multi-row right side must multiply matches exactly like the
    # plain join (replication must not dedupe or double-count)
    left, _ = _frames(spark)
    right = spark.createDataFrame(
        [(0, "a"), (0, "b"), (1, "c")], "k long, rv string")
    got = sorted(map(tuple,
                     salted_join(left, right, "k", factor=3).collect()))
    want = sorted(map(tuple, left.join(right, "k").collect()))
    assert got == want
