"""Zero-temporal-leakage guarantees (north_rule; SURVEY.md §2.6 rule,
§5.4 plan).

Property: features computed "as of" timestamp t must be bit-identical
whether or not any data later than t exists.  Verified two ways:

1. prefix stability — drop every row with ts > cutoff, recompute, and
   require the surviving rows' features to be exactly unchanged;
2. adversarial poisoning — replace all post-cutoff right-side values of
   the as-of join with a poison constant; pre-cutoff output must not
   see it (and a deliberately leaky lead-based feature is shown to
   fail the same check, proving the test has teeth).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ultraviolet_spark.operators.asof import asof_join
from ultraviolet_spark.pipeline import FEATURE_COLS, compute_features


@pytest.fixture(scope="module")
def pages(spark, pages_path):
    return spark.read.parquet(pages_path).cache()


def _sorted_pdf(df, cols):
    return (df.select(*cols).toPandas()
            .sort_values(cols[:2], ignore_index=True))


def test_feature_prefix_stability_under_future_removal(spark, pages):
    lo, hi = pages.agg(F.min("warc_ts"), F.max("warc_ts")).head()
    cutoff = lo + (hi - lo) * 6 // 10
    full = compute_features(pages).filter(F.col("warc_ts") <= cutoff)
    truncated = compute_features(pages.filter(F.col("warc_ts") <= cutoff))
    a = _sorted_pdf(full, FEATURE_COLS)
    b = _sorted_pdf(truncated, FEATURE_COLS)
    pd.testing.assert_frame_equal(a, b)


def test_asof_ignores_poisoned_future(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).head()
    cutoff = lo + (hi - lo) // 2
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("pv"))
    poisoned = purch.withColumn(
        "pv", F.when(F.col("ts") > cutoff, F.lit(-9999.0)).otherwise(F.col("pv")))

    clean = asof_join(clicks.filter(F.col("ts") <= cutoff), purch,
                      on="ts", by="user_id", value_cols=["pv"])
    dirty = asof_join(clicks.filter(F.col("ts") <= cutoff), poisoned,
                      on="ts", by="user_id", value_cols=["pv"])
    cols = ["event_id", "user_id", "ts", "pv"]
    pd.testing.assert_frame_equal(_sorted_pdf(clean, cols), _sorted_pdf(dirty, cols))
    # and nothing pre-cutoff ever observes the poison value
    assert dirty.filter(F.col("pv") == -9999.0).count() == 0


def test_leaky_feature_fails_this_harness(spark, pages):
    """Negative control: a lead()-based feature DOES change when the
    future is removed — the harness catches real leakage."""
    from ultraviolet_spark.operators.windows import with_leads

    lo, hi = pages.agg(F.min("warc_ts"), F.max("warc_ts")).head()
    cutoff = lo + (hi - lo) * 6 // 10
    leaky = with_leads(pages.select("url", "warc_ts", "lang"), ["lang"],
                       by="url", order="warc_ts")
    full = leaky.filter(F.col("warc_ts") <= cutoff)
    truncated = with_leads(
        pages.select("url", "warc_ts", "lang").filter(F.col("warc_ts") <= cutoff),
        ["lang"], by="url", order="warc_ts")
    cols = ["url", "warc_ts", "lang", "lang_lead1"]
    a = _sorted_pdf(full, cols)
    b = _sorted_pdf(truncated, cols)
    assert not a.equals(b)  # the future-peeking column must differ


def test_recrawl_estimates_closed_form(spark):
    """Hand-computable history: 4 crawls, 2 changes, uniform 100 s
    gaps -> r = 2/4, rate = -ln(0.5)/100."""
    import datetime as dt
    import math

    from ultraviolet_spark.operators.windows import recrawl_estimates

    t0 = dt.datetime(2026, 1, 1)
    rows = [("u", t0 + dt.timedelta(seconds=100 * i), c)
            for i, c in enumerate(["a", "a", "b", "c"])]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp,"
                                     " text string")
    r = recrawl_estimates(df).first()
    assert (r["n_crawls"], r["n_changed"]) == (4, 2)
    assert r["mean_gap_secs"] == 100.0
    assert r["change_rate"] == round(-math.log(1 - 2 / 4) / 100, 9)
    # single-crawl keys have no intervals -> excluded
    one = spark.createDataFrame([("v", t0, "x")],
                                "url string, warc_ts timestamp, text string")
    assert recrawl_estimates(one).count() == 0
    # all-changed history stays finite (the +1 regularizer)
    allc = spark.createDataFrame(
        [("w", t0 + dt.timedelta(seconds=60 * i), f"v{i}")
         for i in range(3)],
        "url string, warc_ts timestamp, text string")
    rate = recrawl_estimates(allc).first()["change_rate"]
    assert rate == round(-math.log(1 - 2 / 3) / 60, 9)


def test_temporal_leakage_audit_catches_forward_peek(spark):
    from datetime import datetime

    from ultraviolet_spark.operators.asof import temporal_leakage_audit

    t = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, t, t.replace(hour=11)),   # past feature: clean
        (2, t, t),                    # equal: point-in-time includes now
        (3, t, t.replace(hour=13)),   # 1h future peek
        (4, t, t.replace(hour=12, minute=0, second=1)),  # 1s peek
        (5, t, None),                 # unjoined: not a violation
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, fts timestamp")
    [r] = temporal_leakage_audit(df, ts_col="ts", feature_ts_col="fts",
                                 label="x").collect()
    assert r["method"] == "x"
    assert r["n_rows"] == 5 and r["n_joined"] == 4
    assert r["n_violations"] == 2
    assert r["max_lead_us"] == 3_600_000_000  # the 1h peek, in micros
