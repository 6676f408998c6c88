"""SCD2 intervals + PIT lookup: literal cases, asof-join equivalence,
leakage guard."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

T0 = dt.datetime(2026, 1, 1)


def _obs(spark):
    rows = [("u", T0, "v1"), ("u", T0 + dt.timedelta(hours=2), "v2"),
            ("u", T0 + dt.timedelta(hours=5), "v3"),
            ("w", T0 + dt.timedelta(hours=1), "only")]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, feat string")


def test_scd2_intervals_literal(spark):
    from ultraviolet_spark.operators.history import scd2_intervals

    got = {(r["url"], r["feat"]): (r["valid_from"], r["valid_to"],
                                   r["is_current"]) for r in
           scd2_intervals(_obs(spark)).collect()}
    assert got[("u", "v1")] == (T0, T0 + dt.timedelta(hours=2), False)
    assert got[("u", "v2")] == (T0 + dt.timedelta(hours=2),
                                T0 + dt.timedelta(hours=5), False)
    assert got[("u", "v3")] == (T0 + dt.timedelta(hours=5), None, True)
    assert got[("w", "only")][1] is None and got[("w", "only")][2]


def test_pit_lookup_boundaries_and_nulls(spark):
    from ultraviolet_spark.operators.history import pit_lookup, scd2_intervals

    iv = scd2_intervals(_obs(spark))
    probes = spark.createDataFrame([
        (1, "u", T0 - dt.timedelta(seconds=1)),     # before history
        (2, "u", T0),                                # inclusive start
        (3, "u", T0 + dt.timedelta(hours=2)),        # boundary -> v2
        (4, "u", T0 + dt.timedelta(hours=99)),       # open interval
        (5, "zz", T0),                               # unknown key
    ], "id long, url string, ts timestamp")
    got = {r["id"]: r["feat"] for r in
           pit_lookup(iv, probes).collect()}
    assert got == {1: None, 2: "v1", 3: "v2", 4: "v3", 5: None}
    inner = pit_lookup(iv, probes, how="inner")
    assert {r["id"] for r in inner.collect()} == {2, 3, 4}
    with pytest.raises(ValueError):
        pit_lookup(iv, probes, how="outer")


def test_pit_lookup_equals_asof_join(spark, sf_dir):
    """Gapless intervals: the stored-interval lookup must equal the
    merge-based as-of join on the same data."""
    from ultraviolet_spark.operators.asof import asof_join
    from ultraviolet_spark.operators.history import pit_lookup, scd2_intervals

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    obs = ev.select("user_id", "ts",
                    F.col("event_type").alias("feat"))
    probes = ev.select("event_id", "user_id",
                       (F.col("ts") + F.expr("INTERVAL 17 MINUTES"))
                       .alias("pts"))
    via_iv = pit_lookup(scd2_intervals(obs, by="user_id", order="ts")
                        .drop("ts"),
                        probes, by="user_id", ts_col="pts")
    via_asof = asof_join(probes, obs, by="user_id",
                         on="pts", right_on="ts",
                         value_cols=["feat"])
    a = sorted(map(tuple, via_iv.select("event_id", "feat").collect()))
    b = sorted(map(tuple, via_asof.select("event_id", "feat").collect()))
    assert a == b


def test_pit_lookup_never_leaks_future(spark):
    from ultraviolet_spark.operators.history import pit_lookup, scd2_intervals

    iv = scd2_intervals(_obs(spark))
    # probe exactly 1 µs before v2 becomes valid -> must still see v1
    probes = spark.createDataFrame(
        [(1, "u", T0 + dt.timedelta(hours=2)
          - dt.timedelta(microseconds=1))],
        "id long, url string, ts timestamp")
    assert pit_lookup(iv, probes).first()["feat"] == "v1"


# ------------------------------------------------------- snapshot diff

def test_snapshot_diff_statuses(spark):
    from ultraviolet_spark.operators.history import diff_summary, snapshot_diff

    old = spark.createDataFrame(
        [("a", "same"), ("b", "old-text"), ("c", "gone")],
        "url string, text string")
    new = spark.createDataFrame(
        [("a", "same"), ("b", "new-text"), ("d", "fresh")],
        "url string, text string")
    got = {r["url"]: r["status"]
           for r in snapshot_diff(old, new).collect()}
    assert got == {"a": "unchanged", "b": "changed",
                   "c": "removed", "d": "added"}
    s = {r["status"]: r["n"]
         for r in diff_summary(snapshot_diff(old, new)).collect()}
    assert s == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_multi_fp_cols_and_null(spark):
    from ultraviolet_spark.operators.history import snapshot_diff

    old = spark.createDataFrame(
        [("a", "t", "en"), ("b", "t", None)],
        "url string, text string, lang string")
    new = spark.createDataFrame(
        [("a", "t", "de"), ("b", "t", None)],
        "url string, text string, lang string")
    got = {r["url"]: r["status"] for r in snapshot_diff(
        old, new, fp_cols=("text", "lang")).collect()}
    # lang flips a->changed; NULL lang hashes stably -> unchanged
    assert got == {"a": "changed", "b": "unchanged"}


# ---------------------------------------------------- incremental agg

def test_incremental_agg_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    from ultraviolet_spark.operators.history import incremental_agg
    rows = [(i % 9, f"t{i % 3}", float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, t string, v double")
    agg = None
    for p in range(4):
        agg = incremental_agg(agg, df.filter(F.col("k") % 4 == p),
                              keys=["t"], sums={"sv": "v"})
    got = sorted(map(tuple, agg.collect()))
    want = sorted(map(tuple, df.groupBy("t").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").alias("sv")).collect()))
    assert got == want


def test_incremental_agg_bootstrap_and_new_keys(spark):
    from ultraviolet_spark.operators.history import incremental_agg
    d1 = spark.createDataFrame([("a", 1.0)], "k string, v double")
    d2 = spark.createDataFrame([("a", 2.0), ("b", 5.0)],
                               "k string, v double")
    a1 = incremental_agg(None, d1, keys=["k"], sums={"sv": "v"})
    a2 = incremental_agg(a1, d2, keys=["k"], sums={"sv": "v"})
    got = {r["k"]: (r["n"], r["sv"]) for r in a2.collect()}
    assert got == {"a": (2, 3.0), "b": (1, 5.0)}
