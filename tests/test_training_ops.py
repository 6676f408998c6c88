"""Training-mix operators (round 3): decontamination, PII scrub,
line-level dedup, language-mix temperature weights, sequence packing."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from ultraviolet_spark.operators.corpus import (
    decontaminate,
    doc_ngrams,
    lang_mix_weights,
    line_dedup,
    pack_sequences,
)
from ultraviolet_spark.operators.textstats import pii_scrub

DOC_SCHEMA = "doc_id long, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


# ---------------------------------------------------------------- ngrams

def test_doc_ngrams_basic(spark):
    df = _docs(spark, [(1, "A b c d"), (2, "x y"), (3, "")])
    out = doc_ngrams(df, n=3).toPandas()
    got = set(map(tuple, out.itertuples(index=False)))
    # lowercased; docs with < n tokens yield nothing
    assert got == {(1, "a b c"), (1, "b c d")}


def test_doc_ngrams_distinct(spark):
    df = _docs(spark, [(1, "a b a b a b")])  # 'a b a' x2, 'b a b' x2
    assert doc_ngrams(df, n=3).count() == 2
    assert doc_ngrams(df, n=3, distinct=False).count() == 4


# --------------------------------------------------------- decontaminate

def test_decontaminate_flags_overlap(spark):
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text string")
    docs = _docs(spark, [
        (1, "padding quick brown fox jumps over the lazy dog tail"),  # 8-gram hit
        (2, "quick brown fox jumps over the lazy cat entirely"),      # no 8-gram
        (3, "completely unrelated words all the way through here"),
    ])
    out = (decontaminate(docs, bench, n=8).toPandas()
           .set_index("doc_id").sort_index())
    assert bool(out.loc[1, "contaminated"])
    assert not bool(out.loc[2, "contaminated"])
    assert not bool(out.loc[3, "contaminated"])
    # doc 1 contains exactly 1 of the benchmark's two 8-grams
    assert out.loc[1, "n_hits"] == 1
    # every input doc gets a row, hit or not
    assert len(out) == 3


def test_decontaminate_benchmark_self_hit(spark):
    text = "one two three four five six seven eight nine"
    docs = _docs(spark, [(1, text)])
    out = decontaminate(docs, docs.select("text"), n=8).toPandas()
    assert bool(out.loc[0, "contaminated"])


# -------------------------------------------------------------- PII scrub

def test_pii_scrub_literals(spark):
    df = _docs(spark, [
        (1, "mail me at jane.doe+x@sub.example.org please"),
        (2, "server 192.168.1.254 and phone 555-123-4567 ok"),
        (3, "no pii here at all"),
        (4, "not-an-ip 1234.5.6.7890 and not-a-phone 12-34-56"),
    ])
    out = pii_scrub(df).toPandas().set_index("doc_id").sort_index()
    assert out.loc[1, "n_emails"] == 1 and bool(out.loc[1, "has_pii"])
    assert out.loc[1, "text_redacted"] == "mail me at <EMAIL> please"
    assert out.loc[2, "n_ipv4"] == 1 and out.loc[2, "n_phones"] == 1
    assert out.loc[2, "text_redacted"] == "server <IP> and phone <PHONE> ok"
    assert not bool(out.loc[3, "has_pii"])
    assert out.loc[3, "text_redacted"] == "no pii here at all"
    # \b guards: digit runs that are not IPs/phones survive
    assert not bool(out.loc[4, "has_pii"])


# ------------------------------------------------------------- line dedup

def test_line_dedup_first_occurrence_wins(spark):
    df = _docs(spark, [
        (1, "header\nunique one\nfooter"),
        (2, "header\nunique two\nfooter"),   # header+footer dropped
        (3, "header\nfooter"),               # fully boilerplate -> no row
    ])
    out = line_dedup(df).toPandas().set_index("doc_id").sort_index()
    assert list(out.index) == [1, 2]
    assert out.loc[1, "text_dedup"] == "header\nunique one\nfooter"
    assert out.loc[1, "n_lines"] == 3 and out.loc[1, "n_kept"] == 3
    assert out.loc[2, "text_dedup"] == "unique two"
    assert out.loc[2, "n_lines"] == 3 and out.loc[2, "n_kept"] == 1


def test_line_dedup_within_doc_and_blank_lines(spark):
    df = _docs(spark, [(5, "a b\n\na b\nc d\n  \nc d")])
    out = line_dedup(df).toPandas()
    # blank/whitespace lines are not counted; repeats within one doc collapse
    assert out.loc[0, "n_lines"] == 4
    assert out.loc[0, "n_kept"] == 2
    assert out.loc[0, "text_dedup"] == "a b\nc d"


# ------------------------------------------------------------ mix weights

def test_lang_mix_weights_rebalances(spark):
    rows = ([(i, "x", "en") for i in range(90)]
            + [(i + 100, "x", "is") for i in range(10)])
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = (lang_mix_weights(df, alpha=0.3).toPandas()
           .set_index("lang").sort_index())
    assert out["n_docs"].sum() == 100
    assert abs(out["w_temp"].sum() - 1.0) < 1e-5
    # alpha<1 up-weights the low-resource language, down-weights the big one
    assert out.loc["is", "boost"] > 1.0 > out.loc["en", "boost"]
    assert out.loc["is", "w_temp"] > out.loc["is", "p"]


def test_lang_mix_weights_alpha_one_is_identity(spark):
    rows = [(i, "x", "en" if i % 4 else "fr") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = lang_mix_weights(df, alpha=1.0).toPandas()
    assert np.allclose(out["w_temp"], out["p"], atol=2e-6)
    assert np.allclose(out["boost"], 1.0, atol=2e-5)


# --------------------------------------------------------------- packing

def _expected_packing(rows, seq_len):
    """Independent reference: sort by (md5(id), id), running cumsum."""
    order = sorted(rows, key=lambda r: (
        hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))
    pos, out = 0, {}
    for doc_id, text in order:
        n = len(text.strip().split())
        out[doc_id] = (n, pos, pos // seq_len, pos % seq_len)
        pos += n
    return out


def test_pack_sequences_matches_reference(spark):
    rows = [(i, ("tok " * (5 + 3 * (i % 7))).strip()) for i in range(64)]
    df = _docs(spark, rows)
    out = pack_sequences(df, seq_len=32).toPandas().set_index("doc_id")
    exp = _expected_packing(rows, 32)
    for doc_id, (n, pos, pack, off) in exp.items():
        got = out.loc[doc_id]
        assert (got["n_tokens"], got["stream_pos"],
                got["pack_id"], got["pack_offset"]) == (n, pos, pack, off)


def test_pack_sequences_bucket_count_invariant(spark):
    """The two-phase prefix sum is exact: any bucket count gives the
    same stream as the single-window semantics."""
    rows = [(i, ("w " * (1 + i % 11)).strip()) for i in range(80)]
    df = _docs(spark, rows)
    a = (pack_sequences(df, seq_len=64, n_buckets=256)
         .orderBy("doc_id").toPandas())
    b = (pack_sequences(df, seq_len=64, n_buckets=7)
         .orderBy("doc_id").toPandas())
    assert a.equals(b)


def test_pack_sequences_stream_is_gapless(spark):
    rows = [(i, ("w " * (1 + i % 5)).strip()) for i in range(50)]
    df = _docs(spark, rows)
    out = (pack_sequences(df, seq_len=16).toPandas()
           .sort_values("stream_pos").reset_index(drop=True))
    nxt = out["stream_pos"] + out["n_tokens"]
    assert (out["stream_pos"].iloc[1:].to_numpy()
            == nxt.iloc[:-1].to_numpy()).all()
    assert out["stream_pos"].iloc[0] == 0


# ------------------------------------------------------------ shards

def test_write_training_shards_roundtrip(spark, tmp_path):
    from ultraviolet_spark.operators.corpus import (
        shard_stats, with_shard, write_training_shards)
    import glob
    import json

    rows = [(i, ("tok " * (1 + i % 9)).strip()) for i in range(200)]
    df = _docs(spark, rows)
    path = str(tmp_path / "shards")
    manifest = write_training_shards(df, path, n_shards=8)

    assert manifest["n_shards"] == 8
    assert sum(s["n_docs"] for s in manifest["shards"]) == 200
    # every shard dir exists and holds exactly ONE data file
    for s in manifest["shards"]:
        files = glob.glob(f"{path}/shard_id={s['shard_id']}/*.parquet")
        assert len(files) == 1, files
    # manifest on disk matches the returned one
    assert json.load(open(f"{path}/_manifest.json")) == manifest

    # round-trip: written data == input + deterministic shard column
    back = spark.read.parquet(path)
    exp = with_shard(df, n_shards=8)
    assert back.count() == 200
    assert (back.join(exp.withColumnRenamed("shard_id", "exp_shard"), "doc_id")
            .filter("shard_id <> exp_shard").count()) == 0
    # stats recomputed from disk equal the manifest
    disk_stats = {r["shard_id"]: (r["n_docs"], r["n_tokens"])
                  for r in shard_stats(back, n_shards=8).collect()}
    for s in manifest["shards"]:
        assert disk_stats[s["shard_id"]] == (s["n_docs"], s["n_tokens"])


def test_with_shard_salt_resplits(spark):
    from ultraviolet_spark.operators.corpus import with_shard

    df = _docs(spark, [(i, "x") for i in range(300)])
    a = with_shard(df, n_shards=8).toPandas().set_index("doc_id")["shard_id"]
    b = with_shard(df, n_shards=8, salt="v2").toPandas().set_index("doc_id")["shard_id"]
    assert not a.equals(b)          # salting moves docs...
    c = with_shard(df, n_shards=8).toPandas().set_index("doc_id")["shard_id"]
    assert a.equals(c)              # ...but no salt change never does


# ------------------------------------------------------- dup-line stats

def test_dup_line_stats_literal(spark):
    from ultraviolet_spark.operators.textstats import dup_line_stats

    df = _docs(spark, [
        (1, "menu\nbody one\nmenu\nbody two\nmenu"),
        (2, "all\nunique\nlines"),
    ])
    out = dup_line_stats(df).toPandas().set_index("doc_id").sort_index()
    assert out.loc[1, "n_lines"] == 5 and out.loc[1, "n_dup_lines"] == 2
    assert out.loc[1, "dup_line_frac"] == 0.4
    # chars: menu(4)*3 + body one(8) + body two(8) = 28; dups 2*4=8
    assert abs(out.loc[1, "dup_char_frac"] - round(8 / 28, 6)) < 1e-9
    assert out.loc[2, "n_dup_lines"] == 0 and out.loc[2, "dup_char_frac"] == 0.0


# ------------------------------------------------- hashed quality score

def test_quality_score_hashed_vs_python(spark):
    from ultraviolet_spark.operators.corpus import quality_score_hashed
    import math

    rows = [(1, "Alpha beta gamma alpha"), (2, "zz yy xx")]
    out = (quality_score_hashed(_docs(spark, rows)).toPandas()
           .set_index("doc_id").sort_index())

    def wt_u(word):
        # integer micro-units, the op's exact-arithmetic weight form
        b = int(hashlib.md5(word.encode()).hexdigest()[:2], 16)
        return round((b * 2654435761) % 1009 * 1e6 / 1008.0) - 500000

    for doc_id, text in rows:
        ws = text.lower().strip().split()
        su = sum(wt_u(w) for w in ws)
        s = round(math.floor(su / len(ws) + 0.5) / 1e6, 6)
        assert out.loc[doc_id, "n_words"] == len(ws)
        assert abs(out.loc[doc_id, "score"] - s) < 1e-9
        assert abs(out.loc[doc_id, "prob"]
                   - round(1 / (1 + math.exp(-s)), 6)) < 1e-9


# ------------------------------------------------------------------ BM25

def test_bm25_vs_python(spark):
    from ultraviolet_spark.operators.textstats import bm25_scores
    import math

    rows = [(1, "spark table spark value x y"),
            (2, "table only here"),
            (3, "nothing relevant at all"),
            (4, "value value value value")]
    terms = ["spark", "table", "value"]
    out = (bm25_scores(_docs(spark, rows), terms).toPandas()
           .set_index("doc_id").sort_index())

    docs = {i: t.lower().split() for i, t in rows}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    dfreq = {t: sum(t in w for w in docs.values()) for t in terms}
    for i, w in docs.items():
        score, hit = 0.0, 0
        for t in terms:
            tf = w.count(t)
            if not tf:
                continue
            hit += 1
            idf = round(math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0), 6)
            score += round(idf * (tf * 2.2)
                           / (tf + 1.2 * (0.25 + 0.75 * len(w) / avgdl)), 6)
        assert out.loc[i, "n_terms_hit"] == hit
        assert abs(out.loc[i, "bm25"] - round(score, 6)) < 1e-9
    # no-hit doc present with zero score
    assert out.loc[3, "bm25"] == 0.0 and out.loc[3, "n_terms_hit"] == 0


# ------------------------------------------------------- stratified sample

def test_sample_stratified_monotone_and_proportional(spark):
    from ultraviolet_spark.operators.corpus import sample_stratified

    rows = [(i, "x", "en" if i % 2 else "fr") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    half = set(r["doc_id"] for r in
               sample_stratified(df, {"en": 0.5, "fr": 0.25}).collect())
    more = set(r["doc_id"] for r in
               sample_stratified(df, {"en": 0.75, "fr": 0.25}).collect())
    assert half <= more                      # raising a fraction only adds
    again = set(r["doc_id"] for r in
                sample_stratified(df, {"en": 0.5, "fr": 0.25}).collect())
    assert half == again                     # deterministic
    n_en = sum(1 for i in half if i % 2)
    n_fr = sum(1 for i in half if not i % 2)
    assert abs(n_en / 1000 - 0.5) < 0.08     # md5 buckets ~uniform
    assert abs(n_fr / 1000 - 0.25) < 0.08
    # strata not in the dict default to dropped
    df2 = spark.createDataFrame([(1, "x", "zz")],
                                "doc_id long, text string, lang string")
    assert sample_stratified(df2, {"en": 1.0}).count() == 0


# ------------------------------------------------------- token budgets

def test_token_budget_select_semantics(spark):
    from ultraviolet_spark.operators.corpus import token_budget_select

    rows = [(i, ("w " * (10 + i % 5)).strip(), "en" if i % 2 else "fr")
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = (token_budget_select(df, {"en": 200, "fr": 150})
           .toPandas().sort_values(["lang", "stream_pos"]))
    for lang, cap in (("en", 200), ("fr", 150)):
        g = out[out["lang"] == lang]
        # kept iff tokens BEFORE the doc fit: overrun by at most one doc
        assert (g["stream_pos"] < cap).all()
        assert g["stream_pos"].iloc[0] == 0
        total = g["n_tokens"].sum()
        assert total >= cap                       # never undershoots
        assert total - g["n_tokens"].iloc[-1] < cap
    # strata without a budget are excluded entirely
    out2 = token_budget_select(df, {"en": 200}).toPandas()
    assert set(out2["lang"]) == {"en"}
    # deterministic order: same result via different bucket counts
    a = (token_budget_select(df, {"en": 200, "fr": 150}, n_buckets=256)
         .orderBy("doc_id").toPandas())
    b = (token_budget_select(df, {"en": 200, "fr": 150}, n_buckets=5)
         .orderBy("doc_id").toPandas())
    assert a.equals(b)


def test_lm_cross_entropy_vs_python(spark):
    import math
    from collections import Counter

    from ultraviolet_spark.operators.textstats import lm_cross_entropy

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the hat"),
        (3, "zebra quark flux zebra quark"),
        (4, "single"),       # < 2 tokens -> 0
        (5, ""),             # empty -> 0
    ]
    got = {r["doc_id"]: r for r in
           lm_cross_entropy(_docs(spark, rows)).collect()}

    c12, c1, vocab = Counter(), Counter(), set()
    for _, text in rows:
        w = text.lower().split()
        vocab.update(w)
        for a, b in zip(w, w[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    V = len(vocab)
    for doc_id, text in rows:
        w = text.lower().split()
        bgs = list(zip(w, w[1:]))
        if not bgs:
            assert (got[doc_id]["n_bigrams"],
                    got[doc_id]["cross_entropy"]) == (0, 0.0)
            continue
        s = sum(round(math.log((c12[bg] + 1) / (c1[bg[0]] + V)) * 1e6)
                for bg in bgs)
        want = round(-s / (len(bgs) * 1e6), 6)
        assert got[doc_id]["n_bigrams"] == len(bgs)
        assert abs(got[doc_id]["cross_entropy"] - want) < 1e-9, doc_id


def test_lm_cross_entropy_separate_model(spark):
    """CCNet configuration: model trained on a clean corpus, scores a
    different one — text matching the model scores lower (more fluent)
    than out-of-vocabulary noise."""
    from ultraviolet_spark.operators.textstats import lm_cross_entropy

    model = _docs(spark, [(i, "the quick brown fox jumps over the lazy dog")
                          for i in range(5)])
    score_me = _docs(spark, [
        (1, "the quick brown fox"),          # in-model
        (2, "xylo phone warble quux gnast"), # OOV noise
    ])
    got = {r["doc_id"]: r["cross_entropy"] for r in
           lm_cross_entropy(score_me, model_docs=model).collect()}
    assert got[1] < got[2]


def test_pmi_pairs_vs_python(spark):
    import math
    from collections import Counter
    from itertools import combinations

    from ultraviolet_spark.operators.textstats import pmi_pairs

    rows = [
        (1, "coffee milk sugar"),
        (2, "coffee milk"),
        (3, "coffee tea"),
        (4, "tea sugar milk"),
        (5, "bread butter"),
        (6, "bread butter coffee"),
    ]
    got = {(r["w1"], r["w2"]): r for r in
           pmi_pairs(_docs(spark, rows), min_pair_docs=2).collect()}

    docs_sets = [set(t.split()) for _, t in rows]
    N = len(docs_sets)
    marg = Counter(w for s in docs_sets for w in s)
    both = Counter()
    for s in docs_sets:
        for a, b in combinations(sorted(s), 2):
            both[(a, b)] += 1
    want = {k: v for k, v in both.items() if v >= 2}
    assert set(got) == set(want)
    for (a, b), nb in want.items():
        r = got[(a, b)]
        assert (r["n_both"], r["n_w1"], r["n_w2"]) == (nb, marg[a], marg[b])
        assert abs(r["pmi"]
                   - round(math.log(nb * N / (marg[a] * marg[b])), 6)) < 1e-9
    # collocates score positive, repellers at independence score ~0/neg
    assert got[("bread", "butter")]["pmi"] > got[("coffee", "milk")]["pmi"]


# ------------------------------------------------------- weighted sampling

def test_sample_weighted_deterministic_and_weighty(spark):
    from pyspark.sql import functions as F

    from ultraviolet_spark.operators.corpus import sample_weighted

    # 200 light docs (w=1) + 20 heavy docs (w=50): heavies should
    # dominate a k=20 sample overwhelmingly
    rows = [(i, 1.0) for i in range(200)] + \
           [(1000 + i, 50.0) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r["doc_id"] for r in
           sample_weighted(df, 20, weight_col="w").collect()}
    assert len(got) == 20
    assert sum(1 for d in got if d >= 1000) >= 12   # heavies dominate
    # reproducible under any partitioning
    again = {r["doc_id"] for r in
             sample_weighted(df.repartition(7), 20,
                             weight_col="w").collect()}
    assert got == again
    # salt re-draws
    other = {r["doc_id"] for r in
             sample_weighted(df, 20, weight_col="w", salt="x").collect()}
    assert got != other


def test_sample_weighted_grouped_and_guards(spark):
    import pytest as _pytest

    from ultraviolet_spark.operators.corpus import sample_weighted

    rows = [(i, "a" if i % 2 else "b", float(1 + i % 5))
            for i in range(40)] + [(99, "a", 0.0), (98, "b", None)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    out = sample_weighted(df, 5, weight_col="w", by="g").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], set()).add(r["doc_id"])
    assert len(by_g["a"]) == 5 and len(by_g["b"]) == 5
    assert 99 not in by_g["a"] and 98 not in by_g["b"]  # w<=0/null excluded
    with _pytest.raises(ValueError):
        sample_weighted(df, 0, weight_col="w")


# ---------------------------------------------------- universe sampling

def test_universe_sample_join_consistency(spark):
    from pyspark.sql import functions as F

    from ultraviolet_spark.operators.corpus import universe_sample
    a = spark.range(1000).select(F.col("id").alias("k"),
                                 (F.col("id") * 3).alias("va"))
    b = spark.range(1000).select(F.col("id").alias("k"),
                                 (F.col("id") * 5).alias("vb"))
    sa = universe_sample(a, 0.3, key_col="k")
    sb = universe_sample(b, 0.3, key_col="k")
    # same key universe on both sides
    ka = {r["k"] for r in sa.select("k").collect()}
    kb = {r["k"] for r in sb.select("k").collect()}
    assert ka == kb and 0.2 < len(ka) / 1000 < 0.4
    # join of samples == sample of join
    joined = sa.join(sb, "k")
    assert joined.count() == len(ka)
    # monotone: the 30% universe contains the 10% universe
    k10 = {r["k"] for r in universe_sample(a, 0.1, key_col="k")
           .select("k").collect()}
    assert k10 <= ka
    # salt changes the universe
    ks = {r["k"] for r in universe_sample(a, 0.3, key_col="k", salt="x")
          .select("k").collect()}
    assert ks != ka


def test_largest_remainder_split_exact_quotas(spark):
    from ultraviolet_spark.operators.corpus import largest_remainder_split

    # strata of awkward sizes: 7, 10, 1, 3 — hash splits can't hit
    # these quotas; largest-remainder must, exactly
    rows = ([(i, "a") for i in range(7)] + [(100 + i, "b") for i in range(10)]
            + [(200, "c")] + [(300 + i, "d") for i in range(3)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = largest_remainder_split(
        df, {"train": 800_000, "val": 100_000, "test": 100_000},
        by="source", id_col="doc_id")
    got = out.groupBy("source", "split").count().collect()
    sizes = {(r["source"], r["split"]): r["count"] for r in got}

    # n=7: floors 5/0/0, leftover 2 -> largest remainders .6/.7/.7;
    # val and test tie at 700000, but 2 extras cover both anyway
    assert sizes[("a", "train")] == 5
    assert sizes[("a", "val")] == 1 and sizes[("a", "test")] == 1
    # n=10: exact 8/1/1, no remainder games
    assert sizes[("b", "train")] == 8
    assert sizes[("b", "val")] == 1 and sizes[("b", "test")] == 1
    # n=1: all floors 0, single leftover goes to the largest
    # remainder = train (800000)
    assert sizes[("c", "train")] == 1
    assert ("c", "val") not in sizes and ("c", "test") not in sizes
    # n=3: floors 2/0/0, leftover 1 -> remainders 400000/300000/300000,
    # train wins
    assert sizes[("d", "train")] == 3
    # every row assigned exactly once
    assert out.count() == len(rows)
    assert out.select("doc_id").distinct().count() == len(rows)


def test_largest_remainder_split_validation(spark):
    import pytest

    from ultraviolet_spark.operators.corpus import largest_remainder_split

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="1_000_000"):
        largest_remainder_split(df, {"train": 900_000, "val": 200_000},
                                by="source", id_col="doc_id")
    with pytest.raises(ValueError, match="two splits"):
        largest_remainder_split(df, {"train": 1_000_000},
                                by="source", id_col="doc_id")


def test_interleave_strata_round_robin_invariants(spark):
    from ultraviolet_spark.operators.corpus import interleave_strata

    rows = ([(i, "en") for i in range(6)] + [(100 + i, "de") for i in range(4)]
            + [(200 + i, "fr") for i in range(2)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = interleave_strata(df, strata_col="source", id_col="doc_id")
    got = sorted((r["mix_pos"], r["source"]) for r in out.collect())

    # positions are unique
    assert len({p for p, _ in got}) == len(rows)
    # the first K positions (K=3 strata) cycle all strata once
    assert [s for _, s in got[:3]] == ["de", "en", "fr"]
    # a stratum never runs 2+ rows ahead: position p of stratum s is
    # p = r*K + idx, so per-stratum positions are strictly K apart
    by_s = {}
    for p, s in got:
        by_s.setdefault(s, []).append(p)
    for s, ps in by_s.items():
        assert all(b - a == 3 for a, b in zip(ps, ps[1:])), s
    # depleted strata leave gaps, never reshuffle others: fr occupies
    # exactly ranks 0,1 of its residue class
    assert by_s["fr"] == [2, 5]


def test_ring_negatives_invariants(spark):
    from ultraviolet_spark.operators.corpus import ring_negatives

    df = spark.createDataFrame([(i,) for i in range(60)], "doc_id long")
    out = ring_negatives(df, id_col="doc_id", k=3, n_buckets=4)
    rows = out.collect()
    # no self-pairs ever
    assert all(r["anchor_id"] != r["neg_id"] for r in rows)
    # per anchor: distinct negatives, neg_rank contiguous from 1
    per = {}
    for r in rows:
        per.setdefault(r["anchor_id"], []).append((r["neg_rank"], r["neg_id"]))
    for a, ns in per.items():
        ranks = sorted(k for k, _ in ns)
        assert ranks == list(range(1, len(ranks) + 1)), a
        assert len({n for _, n in ns}) == len(ns), a
    # deterministic: identical on re-run
    again = ring_negatives(df, id_col="doc_id", k=3, n_buckets=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # re-salting produces a different pairing (new epoch)
    salted = ring_negatives(df, id_col="doc_id", k=3, n_buckets=4,
                            salt="e2").collect()
    assert sorted(map(tuple, salted)) != sorted(map(tuple, rows))


def test_ring_negatives_tiny_buckets(spark):
    from ultraviolet_spark.operators.corpus import ring_negatives

    # single doc: no possible negative, must yield zero pairs (not crash)
    df = spark.createDataFrame([(1,)], "doc_id long")
    assert ring_negatives(df, id_col="doc_id", k=3).count() == 0


def test_kn_cross_entropy_vs_python(spark):
    """Full Python reference of interpolated KN (D=0.75) incl. the
    micro-nat snapping — exact equality with the Spark result."""
    import math
    from collections import Counter, defaultdict

    from ultraviolet_spark.operators.textstats import kn_cross_entropy

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the hat"),
        (3, "zebra quark flux zebra quark"),
        (4, "single"),
        (5, ""),
    ]
    got = {r["doc_id"]: r for r in
           kn_cross_entropy(_docs(spark, rows)).collect()}

    c12, vocab = Counter(), set()
    for _, text in rows:
        w = text.lower().split()
        vocab.update(w)
        for a, b in zip(w, w[1:]):
            c12[(a, b)] += 1
    c1, n1f, n1b = Counter(), Counter(), Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        n1f[a] += 1
        n1b[b] += 1
    nbb, V = len(c12), len(vocab)

    def p_kn(a, b):
        pc = (n1b[b] + 1) / (nbb + V + 1)
        if c1[a] == 0:
            return pc
        return (max(4 * c12[(a, b)] - 3, 0) / (4 * c1[a])
                + (3 * n1f[a]) / (4 * c1[a]) * pc)

    for doc_id, text in rows:
        w = text.lower().split()
        bgs = list(zip(w, w[1:]))
        if not bgs:
            assert (got[doc_id]["n_bigrams"],
                    got[doc_id]["kn_cross_entropy"]) == (0, 0.0)
            continue
        s = sum(round(math.log(p_kn(*bg)) * 1e6) for bg in bgs)
        want = round(-s / (len(bgs) * 1e6), 6)
        assert got[doc_id]["n_bigrams"] == len(bgs)
        assert abs(got[doc_id]["kn_cross_entropy"] - want) < 1e-9, doc_id


def test_kn_unseen_history_and_oov(spark):
    """Separate clean model: an unseen HISTORY backs off to the
    continuation distribution; fully-OOV bigrams hit the +1/(V+1)
    floor — fluent in-model text must score lower, and every
    probability must stay in (0, 1] (finite cross-entropy)."""
    from ultraviolet_spark.operators.textstats import kn_cross_entropy

    model = _docs(spark, [(i, "the quick brown fox jumps over the lazy dog")
                          for i in range(5)])
    score_me = _docs(spark, [
        (1, "the quick brown fox"),
        (2, "xylo phone warble quux gnast"),   # OOV histories + words
        (3, "fox the quick"),                  # seen words, unseen bigrams
    ])
    got = {r["doc_id"]: r["kn_cross_entropy"] for r in
           kn_cross_entropy(score_me, model_docs=model).collect()}
    assert got[1] < got[3] < got[2]
    assert all(v > 0 and v == v and v != float("inf") for v in got.values())


def test_kn_probabilities_sum_to_one_per_history(spark):
    """Σ_w2∈V+unk P_KN(w2|w1) == 1 exactly (up to float) for every seen
    history — the discount mass is fully redistributed by λ·Pcont.
    Verified in pure Python against the same counts the operator uses."""
    from collections import Counter

    rows = [(1, "a b a c a b d"), (2, "b c b a")]
    c12 = Counter()
    vocab = set()
    for _, text in rows:
        w = text.split()
        vocab.update(w)
        for x, y in zip(w, w[1:]):
            c12[(x, y)] += 1
    c1, n1f, n1b = Counter(), Counter(), Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        n1f[a] += 1
        n1b[b] += 1
    nbb, V = len(c12), len(vocab)
    # Pcont over the V seen words + 1 unk bucket sums to
    # (Σ(n1b)+V+1)/(nbb+V+1) = 1 exactly since Σ n1b = nbb
    for a in c1:
        tot = 0.0
        for b in vocab | {"<unk>"}:
            pc = (n1b[b] + 1) / (nbb + V + 1)
            tot += (max(4 * c12[(a, b)] - 3, 0) / (4 * c1[a])
                    + (3 * n1f[a]) / (4 * c1[a]) * pc)
        assert abs(tot - 1.0) < 1e-12, a
