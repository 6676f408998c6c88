"""RFM segmentation composition (q297 via quantile_bin)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.queries import REGISTRY

pytestmark = pytest.mark.usefixtures("spark")


def test_rfm_scores_well_formed(spark, sf_dir):
    out = REGISTRY["q297_rfm_segments"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["rfm"] == (r["r_score"] * 100 + r["f_score"] * 10
                            + r["m_score"])
    # quintiles over n users: each score class holds ⌈n/5⌉-ish users
    from collections import Counter
    fs = Counter(r["f_score"] for r in out)
    assert max(fs.values()) - min(fs.values()) <= 1


def test_rfm_direction_semantics(spark, sf_dir):
    """The user with the MOST events must have f_score 5; the most
    recently active user r_score 5."""
    from pyspark.sql import functions as F
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    mx = ev.agg(F.max(us).alias("hi")).head()["hi"]
    per = (ev.groupBy("user_id")
           .agg(F.count("*").alias("n"),
                F.expr(f"CAST(({mx} - max(unix_micros(CAST(ts AS "
                       "timestamp)))) div 86400000000 AS DOUBLE)")
                .alias("rv")))
    # the LAST user in the (count, uid) order lands in the top
    # frequency quintile; the FIRST user in the (recency-days, uid)
    # order lands in the top recency quintile (day-granularity ties
    # split by uid — the operator's documented equal-frequency rule)
    top_f = per.orderBy(F.desc("n"), F.desc("user_id")).head()["user_id"]
    top_r = per.orderBy("rv", "user_id").head()["user_id"]
    out = {r["user_id"]: r for r in
           REGISTRY["q297_rfm_segments"].fn(spark, sf_dir).collect()}
    assert out[top_f]["f_score"] == 5
    assert out[top_r]["r_score"] == 5
