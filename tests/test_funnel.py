"""Funnel / cohort-retention / session-path operators: hand cases
pinning the greedy-chain semantics, horizon boundary, same-timestamp
tiebreak, and a brute-force reference equivalence."""
from __future__ import annotations

import datetime as dt
import itertools
import random

from ultraviolet_spark.operators.funnel import (
    cohort_retention,
    funnel_conversions,
    session_path_ngrams,
)

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), u, t) for i, (u, s, t) in
         enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string")


def test_funnel_greedy_chain_and_horizon(spark):
    rows = [
        # user 1: view@0, click@10, purchase@100 → converted in 100 s
        (1, 0, "view"), (1, 10, "click"), (1, 100, "purchase"),
        # user 2: purchase BEFORE the click → not converted
        (2, 0, "view"), (2, 50, "purchase"), (2, 60, "click"),
        # user 3: greedy click@10 still finds the purchase@500
        (3, 0, "view"), (3, 10, "click"), (3, 20, "click"),
        (3, 500, "purchase"),
        # user 4: purchase lands exactly AT the horizon (closed bound)
        (4, 0, "view"), (4, 1, "click"), (4, 1000, "purchase"),
        # user 5: one second past the horizon
        (5, 0, "view"), (5, 1, "click"), (5, 1001, "purchase"),
    ]
    out = {r.user_id: r for r in funnel_conversions(
        _ev(spark, rows), steps=["view", "click", "purchase"],
        horizon_secs=1000).collect()}
    assert out[1].converted and out[1].secs_to_convert == 100
    assert not out[2].converted and out[2].step2_ts is None
    assert out[3].converted and out[3].step1_ts == T0 + dt.timedelta(seconds=10)
    assert out[4].converted and out[4].secs_to_convert == 1000
    assert not out[5].converted and out[5].secs_to_convert is None


def test_funnel_same_timestamp_tiebreak(spark):
    # click shares the view's timestamp but has a larger event_id →
    # strictly-after in (ts, event_id) order, so it counts
    rows = [(1, 0, "view"), (1, 0, "click"), (1, 5, "purchase")]
    r, = funnel_conversions(_ev(spark, rows),
                            steps=["view", "click", "purchase"],
                            horizon_secs=60).collect()
    assert r.converted and r.step1_ts == T0


def test_funnel_matches_brute_force(spark):
    """Random event soup: converted ⇔ ∃ an ordered chain within the
    horizon (existence by exhaustive search, not greedy)."""
    rng = random.Random(3)
    types = ["view", "click", "purchase", "error"]
    rows = [(rng.randrange(6), rng.randrange(2000), rng.choice(types))
            for _ in range(300)]
    got = {(r.user_id, r.anchor_id): r.converted for r in
           funnel_conversions(_ev(spark, rows),
                              steps=["view", "click", "purchase"],
                              horizon_secs=600).collect()}
    evs = [(i, u, s, t) for i, (u, s, t) in enumerate(rows)]
    n_anchors = 0
    for i, u, s, t in evs:
        if t != "view":
            continue
        n_anchors += 1
        clicks = [(s2, i2) for i2, u2, s2, t2 in evs
                  if u2 == u and t2 == "click" and (s2, i2) > (s, i)]
        purchases = [(s3, i3) for i3, u3, s3, t3 in evs
                     if u3 == u and t3 == "purchase"]
        want = any(p > c and p[0] - s <= 600
                   for c, p in itertools.product(clicks, purchases))
        assert got[(u, i)] == want, (u, i)
    assert n_anchors and len(got) == n_anchors


def test_cohort_retention_hand_case(spark):
    rows = [
        # user 1 first event week of Mon 2024-01-01; active wk0 and wk2
        (1, 0, "view"), (1, 14 * 86400, "view"),
        # user 2 same cohort, only wk0
        (2, 86400, "click"),
        # user 3 cohort week of Mon 2024-01-08
        (3, 7 * 86400, "view"),
    ]
    got = {(r.cohort_week, r.week_offset):
           (r.active_users, r.cohort_size, r.retention)
           for r in cohort_retention(_ev(spark, rows)).collect()}
    wk0 = dt.date(2024, 1, 1)
    assert got[(wk0, 0)] == (2, 2, 1.0)
    assert got[(wk0, 2)] == (1, 2, 0.5)
    assert got[(dt.date(2024, 1, 8), 0)] == (1, 1, 1.0)
    assert len(got) == 3


def test_session_path_ngrams_hand_case(spark):
    from ultraviolet_spark.operators.windows import sessionize

    rows = [
        (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
        # new session for user 1 (gap > 100 s): too short for a trigram
        (1, 1000, "view"), (1, 1010, "click"),
        (2, 0, "view"), (2, 10, "click"), (2, 20, "purchase"),
        (2, 30, "error"),
    ]
    ev = sessionize(_ev(spark, rows), by="user_id", order="ts",
                    gap_secs=100.0, tiebreak="event_id")
    got = {r.path: r.n_occurrences
           for r in session_path_ngrams(ev, n=3, top_k=10).collect()}
    assert got == {"view>click>purchase": 2, "click>purchase>error": 1}


def test_transition_matrix_hand_case(spark):
    import datetime as dt
    from ultraviolet_spark.operators.funnel import transition_matrix
    t0 = dt.datetime(2024, 1, 1)
    # user 1: a→b→a ; user 2: a→b — counts: a→b:2, b→a:1
    rows = [(1, t0, 0, "a"), (1, t0, 1, "b"),
            (1, t0.replace(hour=1), 2, "a"),
            (2, t0, 3, "a"), (2, t0, 4, "b"),
            (3, t0, 5, "c")]                 # lone event: no transition
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    got = {(r["from_state"], r["to_state"]): r for r in
           transition_matrix(df).collect()}
    # full 3×3 matrix including never-seen 'c' rows
    assert len(got) == 9
    ab, ba = got[("a", "b")], got[("b", "a")]
    assert (ab["n"], ab["p_num"], ab["p_den"]) == (2, 3, 5)  # row a: 2+3
    assert ab["p"] == 3 / 5
    # row b has ONE outgoing transition (each user's last event is
    # terminal): p_den = 1 + 3, p = (1+1)/4
    assert (ba["n"], ba["p_den"], ba["p"]) == (1, 4, 0.5)
    # unseen transition gets Laplace mass, never zero
    cc = got[("c", "c")]
    assert cc["n"] == 0 and cc["p"] == 1 / 3
    # rows are proper distributions: Σp == 1 exactly per from-state
    from collections import defaultdict
    sums = defaultdict(float)
    for (f, _t), r in got.items():
        sums[f] += r["p_num"] / r["p_den"]
    assert all(abs(v - 1.0) < 1e-12 for v in sums.values())
    # equal-timestamp tie broken by event_id: (2,t0,a)→(2,t0,b) counted
    assert got[("a", "b")]["n"] == 2
