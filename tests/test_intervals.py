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


def test_interval_union_hand_case(spark):
    from ultraviolet_spark.operators.intervals import interval_union
    rows = [
        # key 0: [0,100] + [50,200] overlap; [200,300] touches → one span
        (0, 0, 100), (0, 50, 200), (0, 200, 300),
        # key 0: swallowed interval extends nothing but counts
        (0, 250, 260),
        # key 0: gap then a lone interval
        (0, 1000, 1100),
        # key 1: zero-length interval is a valid point span
        (1, 5, 5),
        # key 1: malformed (end < start) must vanish, not clamp
        (1, 50, 40),
    ]
    df = spark.createDataFrame(
        [(k, T0 + dt.timedelta(seconds=a), T0 + dt.timedelta(seconds=b))
         for k, a, b in rows], "k long, s timestamp, e timestamp")
    got = sorted(
        ((r["k"], (r["span_start"] - T0).total_seconds(),
          (r["span_end"] - T0).total_seconds(), r["n_merged"],
          r["span_us"]) for r in interval_union(
              df, key_cols=["k"], start_col="s", end_col="e").collect()))
    assert got == [
        (0, 0.0, 300.0, 4, 300_000_000),
        (0, 1000.0, 1100.0, 1, 100_000_000),
        (1, 5.0, 5.0, 1, 0),
    ]


def test_interval_union_brute_force_and_plan(spark):
    from ultraviolet_spark.operators.intervals import interval_union
    rng = random.Random(7)
    rows = [(rng.randrange(3), rng.randrange(0, 500),
             rng.randrange(0, 120)) for _ in range(200)]
    df = spark.createDataFrame(
        [(k, T0 + dt.timedelta(seconds=s), T0 + dt.timedelta(seconds=s + d))
         for k, s, d in rows], "k long, s timestamp, e timestamp")
    out = interval_union(df, key_cols=["k"], start_col="s", end_col="e")

    # python reference: sort and sweep per key
    expect = []
    for k in {r[0] for r in rows}:
        ivs = sorted((s, s + d) for kk, s, d in rows if kk == k)
        cur_s, cur_e, n = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s > cur_e:
                expect.append((k, float(cur_s), float(cur_e), n))
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e, n = max(cur_e, e), n + 1
        expect.append((k, float(cur_s), float(cur_e), n))
    got = sorted((r["k"], (r["span_start"] - T0).total_seconds(),
                  (r["span_end"] - T0).total_seconds(), r["n_merged"])
                 for r in out.collect())
    assert got == sorted(expect)

    # one exchange total: both windows + the span groupBy share the key
    # (executedPlan.toString() appends the AQE "Initial Plan" — count
    # only the final-plan section or the one exchange doubles)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final
