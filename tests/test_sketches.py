"""Misra-Gries two-pass heavy hitters: the output must be EXACTLY the
full-vocabulary GROUP BY ... HAVING cnt*k > n result, for any
partitioning — the MG guarantee (no item above n/k is ever evicted)
is what makes the candidate pass lossless for the final filter."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark


def _exact(spark, docs, k):
    from pyspark.sql import functions as F

    w = (docs.filter(F.length(F.trim("text")) > 0)
         .select(F.explode(F.split(F.lower(F.trim("text")), r"\s+"))
                 .alias("token")))
    n = w.count()
    return {(r["token"], r["cnt"]) for r in
            w.groupBy("token").agg(F.count("*").cast("long").alias("cnt"))
             .filter(F.col("cnt") * k > n).collect()}


def test_heavy_hitters_literal(spark):
    from ultraviolet_spark.operators.sketches import heavy_hitter_tokens

    rows = [(1, "a a a a b b c"), (2, "a a b d"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # n=11 tokens; k=4 -> threshold cnt > 2.75: a(6), b(3)
    got = {(r["token"], r["cnt"]) for r in
           heavy_hitter_tokens(df, k=4).collect()}
    assert got == {("a", 6), ("b", 3)}


def test_heavy_hitters_equal_exact_groupby(spark, sf_dir):
    from ultraviolet_spark.operators.sketches import heavy_hitter_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # k=20's threshold yields an EMPTY set on this corpus (probed: the
    # token distribution has ~30 frequent tokens then a cliff) — a
    # valid exactness case; k=50/200 are non-vacuous (30 hitters).
    for k, expect_any in ((20, False), (50, True), (200, True)):
        got = {(r["token"], r["cnt"]) for r in
               heavy_hitter_tokens(docs, k=k).collect()}
        assert got == _exact(spark, docs, k)
        assert bool(got) == expect_any


def test_heavy_hitters_partitioning_invariant(spark, sf_dir):
    """Adversarial partitioning (many small partitions -> many small MG
    summaries) must not change the exact result."""
    from ultraviolet_spark.operators.sketches import heavy_hitter_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {(r["token"], r["cnt"]) for r in
         heavy_hitter_tokens(docs, k=50).collect()}
    b = {(r["token"], r["cnt"]) for r in
         heavy_hitter_tokens(docs.repartition(17), k=50).collect()}
    assert a == b == _exact(spark, docs, 50)
