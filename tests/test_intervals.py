"""Interval-overlap join: hand case, brute-force equivalence on random
intervals (every pair exactly once — the canonical-bucket predicate),
malformed-interval exclusion, and a cartesian-free plan assert."""
from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from ultraviolet_spark.operators.intervals import overlap_join

T0 = dt.datetime(2024, 1, 1)


def _mk(spark, rows, idc, s, e):
    return spark.createDataFrame(
        [(i, k, T0 + dt.timedelta(seconds=a), T0 + dt.timedelta(seconds=b)
          if b is not None else None) for i, k, a, b in rows],
        f"{idc} long, seg long, {s} timestamp, {e} timestamp")


def test_overlap_join_hand_case(spark):
    left = _mk(spark, [
        (1, 0, 0, 3600),        # overlaps r10 (touching end), r11
        (2, 0, 7200, 10800),    # overlaps r11 only
        (3, 1, 0, 3600),        # different segment: no partner
        (4, 0, 20000, 20010),   # no overlap
    ], "visit_id", "vs", "ve")
    right = _mk(spark, [
        (10, 0, 3600, 5400),    # touches visit 1 at exactly 3600
        (11, 0, 1800, 9000),    # spans visits 1 and 2
        (12, 2, 0, 9000),       # segment with no left rows
    ], "campaign_id", "cs", "ce")
    out = overlap_join(left, right, key_cols=["seg"],
                       left_start="vs", left_end="ve",
                       right_start="cs", right_end="ce", bucket_secs=1800)
    got = {(r.visit_id, r.campaign_id): r.overlap_secs for r in out.collect()}
    # closed intervals: the single touching instant counts, 0 seconds long
    assert got == {(1, 10): 0, (1, 11): 1800, (2, 11): 1800}


def test_overlap_join_matches_theta_join(spark):
    """Random intervals spanning many buckets: the bucketed join must
    equal the brute-force theta join pair-for-pair (exactly once)."""
    rng = random.Random(7)
    lrows = [(i, rng.randrange(3), (a := rng.randrange(0, 500_000)),
              a + rng.randrange(0, 40_000)) for i in range(120)]
    rrows = [(i, rng.randrange(3), (a := rng.randrange(0, 500_000)),
              a + rng.randrange(0, 40_000)) for i in range(120)]
    left = _mk(spark, lrows, "lid", "vs", "ve")
    right = _mk(spark, rrows, "rid", "cs", "ce")
    got = sorted((r.lid, r.rid) for r in overlap_join(
        left, right, key_cols=["seg"],
        left_start="vs", left_end="ve",
        right_start="cs", right_end="ce", bucket_secs=3600).collect())
    want = sorted((r.lid, r.rid) for r in left.alias("l").join(
        right.alias("r"),
        (F.col("l.seg") == F.col("r.seg"))
        & (F.col("vs") <= F.col("ce")) & (F.col("cs") <= F.col("ve")))
        .select("lid", "rid").collect())
    assert got == want and len(got) == len(set(got))


def test_overlap_join_malformed_rows_dropped(spark):
    left = _mk(spark, [(1, 0, 100, 50), (2, 0, 100, None),
                       (3, 0, 0, 10_000)], "lid", "vs", "ve")
    right = _mk(spark, [(9, 0, 0, 10_000)], "rid", "cs", "ce")
    out = overlap_join(left, right, key_cols=["seg"],
                       left_start="vs", left_end="ve",
                       right_start="cs", right_end="ce", bucket_secs=3600)
    assert [r.lid for r in out.collect()] == [3]


def test_overlap_join_plan_is_equi_join(spark):
    left = _mk(spark, [(1, 0, 0, 3600)], "lid", "vs", "ve")
    right = _mk(spark, [(9, 0, 0, 3600)], "rid", "cs", "ce")
    plan = overlap_join(left, right, key_cols=["seg"],
                        left_start="vs", left_end="ve",
                        right_start="cs", right_end="ce")._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
