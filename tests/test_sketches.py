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


def test_bloom_no_false_negatives_and_reference_equality(spark, sf_dir):
    """Every inserted value MUST probe true; probe results must equal
    a pure-Python md5 reference bit-for-bit."""
    import hashlib

    from pyspark.sql import functions as F

    from ultraviolet_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = (docs.select(F.explode(F.split(F.lower(F.trim("text")),
                                          r"\s+")).alias("tok"))
            .filter(F.col("tok") != "").distinct())
    n_bits, k = 512, 3
    bloom = bloom_build(toks, col="tok", n_bits=n_bits, k=k)

    # self-probe: zero false negatives, regardless of FP pressure
    self_probe = bloom_might_contain(toks, bloom, col="tok",
                                     n_bits=n_bits, k=k)
    assert self_probe.filter(~F.col("might_contain")).count() == 0

    # foreign probes match the reference implementation exactly
    vocab = {r["tok"] for r in toks.collect()}
    bits = set()
    for t in vocab:
        for i in range(k):
            bits.add(int(hashlib.md5(f"{t}:{i}".encode())
                         .hexdigest()[:12], 16) % n_bits)

    def ref(t):
        return all(int(hashlib.md5(f"{t}:{i}".encode())
                       .hexdigest()[:12], 16) % n_bits in bits
                   for i in range(k))

    foreign = [f"zz{i}" for i in range(200)]
    fdf = spark.createDataFrame([(t,) for t in foreign], "tok string")
    got = {r["tok"]: r["might_contain"] for r in
           bloom_might_contain(fdf, bloom, col="tok",
                               n_bits=n_bits, k=k).collect()}
    want = {t: ref(t) for t in foreign}
    assert got == want
    # at 512 bits the filter is saturated enough to show real FPs,
    # proving the probe isn't an exact join in disguise
    assert any(want.values()) and not all(want.values())


# ------------------------------------------------------------- hyperloglog

def test_hll_registers_match_python_reference(spark):
    import hashlib

    from ultraviolet_spark.operators.sketches import hll_registers

    vals = [f"url{i % 700}" for i in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], "u string")
    p = 7
    got = {r["bucket"]: r["max_rho"]
           for r in hll_registers(df, col="u", p=p).collect()}
    ref: dict[int, int] = {}
    for v in set(vals):
        h = int(hashlib.md5(v.encode()).hexdigest()[:12], 16)
        bucket = h % (1 << p)
        w = h >> p
        rho = (48 - p) - w.bit_length() + 1
        ref[bucket] = max(ref.get(bucket, 0), rho)
    assert got == ref


def test_hll_estimate_accuracy_and_merge(spark):
    from ultraviolet_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    n = 5000
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "u string")
    p = 9
    est = hll_estimate(hll_registers(df, col="u", p=p), p=p).first()[0]
    # standard error ~1.04/sqrt(512) ≈ 4.6%; allow 3 sigma
    assert abs(est - n) / n < 0.14

    # mergeability: sketch(A)+sketch(B) == sketch(A∪B) register-exact
    a = df.filter("substring(u, 2, 10) % 2 = 0")
    b = df.filter("substring(u, 2, 10) % 2 = 1")
    merged = hll_merge(hll_registers(a, col="u", p=p),
                       hll_registers(b, col="u", p=p))
    whole = hll_registers(df, col="u", p=p)
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, whole.collect())))


def test_hll_linear_counting_small_range(spark):
    from ultraviolet_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    df = spark.createDataFrame([(f"v{i}",) for i in range(40)], "u string")
    est = hll_estimate(hll_registers(df, col="u", p=9), p=9).first()[0]
    # linear counting is near-exact this far below m=512
    assert abs(est - 40) <= 3


# ---------------------------------------------------------------- Count-Min

def test_cms_one_sided_and_bounded(spark):
    """est >= true for EVERY key (CMS guarantee), and overshoot is
    bounded by eN with e = e_const/width — checked with the exact
    counts from a plain GROUP BY on the same stream."""
    from pyspark.sql import functions as F

    from ultraviolet_spark.operators.sketches import cms_estimate, cms_table

    docs = spark.createDataFrame(
        [(i, "w%d" % (i % 37)) for i in range(500)]
        + [(1000 + i, "hot") for i in range(200)],
        "row_id long, tok string")
    width, depth = 256, 3
    cms = cms_table(docs, col="tok", width=width, depth=depth)
    exact = docs.groupBy("tok").agg(F.count("*").cast("long").alias("true_cnt"))
    est = cms_estimate(cms, exact, col="tok", width=width, depth=depth)
    n = docs.count()
    import math
    bound = math.e / width * n * 3     # 3x slack on the w.h.p. bound
    for r in est.collect():
        assert r["est"] >= r["true_cnt"]
        assert r["est"] - r["true_cnt"] <= bound


def test_cms_partitioning_invariant_and_mergeable(spark):
    """The sketch table is identical under any input partitioning, and
    sketching two halves then summing cells == sketching the whole."""
    from pyspark.sql import functions as F

    from ultraviolet_spark.operators.sketches import cms_table

    docs = spark.createDataFrame([(i, "t%d" % (i % 11)) for i in range(300)],
                                 "row_id long, tok string")
    whole = {(r["d"], r["w"]): r["cnt"] for r in
             cms_table(docs, col="tok", width=64, depth=2).collect()}
    repart = {(r["d"], r["w"]): r["cnt"] for r in
              cms_table(docs.repartition(13), col="tok",
                        width=64, depth=2).collect()}
    assert whole == repart
    lo = cms_table(docs.filter("row_id < 150"), col="tok", width=64, depth=2)
    hi = cms_table(docs.filter("row_id >= 150"), col="tok", width=64, depth=2)
    merged = {(r["d"], r["w"]): r["cnt"] for r in
              lo.unionByName(hi).groupBy("d", "w")
                .agg(F.sum("cnt").cast("long").alias("cnt")).collect()}
    assert merged == whole


# ---------------------------------------------------- bloom_semi_join

def test_bloom_semi_join_equals_plain_semi(spark):
    from pyspark.sql import functions as F

    from ultraviolet_spark.operators.sketches import bloom_semi_join
    big = spark.createDataFrame([(i, f"v{i}") for i in range(500)],
                                "k long, payload string")
    small = spark.createDataFrame([(i * 7,) for i in range(40)],
                                  "sk long")
    got = bloom_semi_join(big, small, big_col="k", small_col="sk",
                          n_bits=1 << 10)
    want = big.join(small.select(F.col("sk").alias("k")), "k",
                    "left_semi")
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))


def test_bloom_semi_join_inner_mode(spark):
    from ultraviolet_spark.operators.sketches import bloom_semi_join
    big = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                                "k long, payload string")
    small = spark.createDataFrame([(2, "X"), (3, "Y")], "sk long, extra string")
    got = bloom_semi_join(big, small, big_col="k", small_col="sk",
                          how="inner", n_bits=256)
    rows = sorted((r["k"], r["payload"], r["extra"]) for r in got.collect())
    assert rows == [(2, "b", "X"), (3, "c", "Y")]


def test_bloom_semi_join_probe_side_has_no_pre_join_exchange(spark):
    from ultraviolet_spark.operators.sketches import bloom_semi_join
    big = spark.createDataFrame([(i,) for i in range(100)], "k long")
    small = spark.createDataFrame([(5,), (7,)], "sk long")
    pruned = bloom_semi_join(big, small, big_col="k", small_col="sk",
                             n_bits=256)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the k probe word-joins must all be broadcast joins
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_bottomk_jaccard_exact_when_union_fits(spark):
    from ultraviolet_spark.operators.sketches import bottomk_jaccard_pairs
    # |A ∪ B| = 30 ≤ k → the estimate IS the exact Jaccard
    rows = ([("a", f"x{i}") for i in range(20)]
            + [("b", f"x{i}") for i in range(10, 30)])
    df = spark.createDataFrame(rows, "g string, t string")
    r = bottomk_jaccard_pairs(df, group_col="g", item_col="t",
                              k=64).first()
    assert (r["g1"], r["g2"]) == ("a", "b")
    assert r["n_bottom"] == 30 and r["n_both"] == 10
    assert r["jaccard_est"] == 10 / 30


def test_bottomk_jaccard_estimates_within_sketch_error(spark):
    from ultraviolet_spark.operators.sketches import bottomk_jaccard_pairs
    # true J = 1000 / 3000 = 1/3; k=256 → σ ≈ √(J(1−J)/k) ≈ 0.029;
    # deterministic hashes mean this asserts the estimator's math, not
    # luck — the value is reproducible bit-for-bit every run
    rows = ([("a", f"s{i}") for i in range(1000)]      # shared
            + [("b", f"s{i}") for i in range(1000)]
            + [("a", f"a{i}") for i in range(1000)]
            + [("b", f"b{i}") for i in range(1000)])
    df = spark.createDataFrame(rows, "g string, t string")
    r = bottomk_jaccard_pairs(df, group_col="g", item_col="t",
                              k=256).first()
    assert r["n_bottom"] == 256
    assert abs(r["jaccard_est"] - 1 / 3) < 0.09      # 3σ
    # duplicates in the input must not change the SET sketch
    df2 = df.union(df)
    r2 = bottomk_jaccard_pairs(df2, group_col="g", item_col="t",
                               k=256).first()
    assert r2["jaccard_est"] == r["jaccard_est"]


def test_bottomk_jaccard_all_pairs_emitted(spark):
    from ultraviolet_spark.operators.sketches import bottomk_jaccard_pairs
    rows = [(g, f"{g}{i}") for g in "abc" for i in range(5)]
    df = spark.createDataFrame(rows, "g string, t string")
    got = {(r["g1"], r["g2"]): r["jaccard_est"]
           for r in bottomk_jaccard_pairs(
               df, group_col="g", item_col="t", k=8).collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert all(v == 0.0 for v in got.values())       # disjoint sets
