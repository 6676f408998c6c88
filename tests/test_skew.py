"""Skew handling: the salted as-of path must produce IDENTICAL results
to the unsalted plan on zipfian + hot-key data (SURVEY.md §5.6)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ultraviolet_spark.operators.asof import asof_join, find_hot_keys


@pytest.fixture(scope="module")
def skewed(spark, tmp_path_factory):
    from ultraviolet_spark.sources.pages_gen import write_pages

    p = tmp_path_factory.mktemp("skew") / "pages.parquet"
    # 30% of ALL crawls hit url 0 on top of zipf skew
    write_pages(str(p), n_urls=60, max_crawls=8, seed=7, hot_url_frac=0.3)
    pages = spark.read.parquet(str(p))
    left = pages.select("url", "warc_ts")
    right = (
        pages.groupBy("url", "warc_ts")
        .agg(F.length(F.min("text")).cast("long").alias("obs_len"))
    )
    return left, right


def _key(df):
    pdf = df.toPandas().sort_values(list(df.columns), ignore_index=True)
    return pdf


def test_find_hot_keys(skewed):
    left, _ = skewed
    hot = find_hot_keys(left, "url", min_rows=50)
    assert any("p/0" in u for u in hot)


def test_salted_asof_equals_unsalted(skewed):
    left, right = skewed
    hot = find_hot_keys(left, "url", min_rows=50)
    assert hot, "fixture must produce at least one hot key"
    plain = asof_join(left, right, on="warc_ts", by="url",
                      value_cols=["obs_len"])
    salted = asof_join(left, right, on="warc_ts", by="url",
                       value_cols=["obs_len"], hot_keys=hot, salt=4)
    a, b = _key(plain), _key(salted)
    pd.testing.assert_frame_equal(a, b)


def test_salted_asof_strict_equals_unsalted(skewed):
    left, right = skewed
    hot = find_hot_keys(left, "url", min_rows=50)
    plain = asof_join(left, right, on="warc_ts", by="url",
                      value_cols=["obs_len"], strict=True)
    salted = asof_join(left, right, on="warc_ts", by="url",
                       value_cols=["obs_len"], strict=True,
                       hot_keys=hot, salt=3)
    pd.testing.assert_frame_equal(_key(plain), _key(salted))
