"""purged_kfold: brute-force equality, the zero-leakage invariant
(no train row's label window intersects its fold's test range; no
train row inside the embargo), and exact k× cardinality with roles
forming a partition."""

from __future__ import annotations

from datetime import datetime, timedelta

from ultraviolet_spark.operators.corpus import purged_kfold

SCHEMA = "event_id long, ts timestamp"
T0 = datetime(2024, 3, 1)
ROWS = [(i, T0 + timedelta(minutes=7 * i)) for i in range(60)]

H_US = 30 * 60 * 1_000_000        # 30 min label horizon
E_US = 20 * 60 * 1_000_000        # 20 min embargo
K = 4


def _brute(rows):
    ums = {i: int(ts.timestamp() * 1_000_000) for i, ts in rows}
    lo, hi = min(ums.values()), max(ums.values())
    span = (hi - lo) // K + 1
    out = {}
    for f in range(K):
        s, e = lo + f * span, lo + (f + 1) * span
        for i, um in ums.items():
            if s <= um < e:
                role = "test"
            elif um < s and um + H_US > s:
                role = "purged"
            elif e <= um < e + E_US:
                role = "embargo"
            else:
                role = "train"
            out[(i, f)] = role
    return out


def test_matches_brute_force(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {(r["event_id"], r["fold"]): r["role"]
           for r in purged_kfold(df, ts_col="ts", n_folds=K,
                                 horizon_us=H_US,
                                 embargo_us=E_US).collect()}
    assert got == _brute(ROWS)


def test_zero_leakage_invariant(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = purged_kfold(df, ts_col="ts", n_folds=K,
                       horizon_us=H_US, embargo_us=E_US).collect()
    ums = {i: int(ts.timestamp() * 1_000_000) for i, ts in ROWS}
    lo, hi = min(ums.values()), max(ums.values())
    span = (hi - lo) // K + 1
    for r in out:
        if r["role"] != "train":
            continue
        um = ums[r["event_id"]]
        s = lo + r["fold"] * span
        e = s + span
        # label window never touches the test range; never embargoed
        assert um + H_US <= s or um >= e + E_US


def test_cardinality_and_partition(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = purged_kfold(df, ts_col="ts", n_folds=K,
                       horizon_us=H_US, embargo_us=E_US)
    assert out.count() == len(ROWS) * K
    # exactly one role per (row, fold): the collected dict in the
    # brute-force test already proves uniqueness via key collisions;
    # here assert every fold has a nonempty test set
    per_fold = {r["fold"] for r in
                out.filter("role = 'test'").select("fold").collect()}
    assert per_fold == set(range(K))
