"""Composed corpus-cleaning pipeline: gate funnel, dedup-keeper choice,
near-dup chain handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ultraviolet_spark.operators.corpus import clean_corpus, corpus_report


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_funnel_monotone(docs):
    rep = corpus_report(docs, min_tokens=20, near_dup=True).toPandas()
    rep = rep.set_index("stage")["n_docs"]
    assert rep["00_input"] >= rep["10_nonempty"] >= rep["20_quality_dedup"]
    assert rep["20_quality_dedup"] >= rep["30_near_dup"] > 0


def test_exact_dup_keeps_lowest_id(spark):
    body = "solid document with twenty plus tokens " * 5
    rows = [(7, body, "en", "web", len(body)),
            (3, body, "en", "web", len(body)),
            (9, "other " + body, "en", "web", len(body) + 6)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    kept = clean_corpus(df, min_tokens=10).select("doc_id").toPandas()
    assert sorted(kept["doc_id"]) == [3, 9]


def test_near_dup_chain_keeps_lowest(spark):
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 4
    rows = [
        (1, base, "en", "web", 0),
        (2, base + "phi", "en", "web", 0),          # near-dup of 1
        (3, base + "phi chi", "en", "web", 0),      # near-dup of 1 and 2
        (4, "a completely different text " * 10, "en", "web", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    kept = clean_corpus(df, min_tokens=10, near_dup=True,
                        near_dup_threshold=0.7).select("doc_id").toPandas()
    assert sorted(kept["doc_id"]) == [1, 4]


def test_quality_gates(spark):
    rows = [
        (1, "too short", "en", "web", 9),
        (2, "....... " * 30, "en", "web", 0),                    # punct-heavy
        (3, "123 456 789 " * 20, "en", "web", 0),                # digit-heavy
        (4, "perfectly reasonable prose with many normal words "
            "that passes every single gate easily " * 3, "en", "web", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    kept = clean_corpus(df, min_tokens=10).select("doc_id").toPandas()
    assert sorted(kept["doc_id"]) == [4]


def test_chunking_covers_all_tokens_with_overlap(spark):
    from ultraviolet_spark.operators.corpus import chunk_documents

    text = " ".join(f"t{i}" for i in range(250))
    df = spark.createDataFrame(
        [(1, text, "en", "web", 0), (2, "short doc", "en", "web", 0),
         (3, "", "en", "web", 0)],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = chunk_documents(df, max_tokens=100, overlap=20).toPandas()
    d1 = out[out["doc_id"] == 1].sort_values("chunk_no")
    # stride 80 over 250 tokens -> starts 0,80,160,240 -> 4 chunks
    assert list(d1["chunk_no"]) == [0, 1, 2, 3]
    assert list(d1["n_chunk_tokens"]) == [100, 100, 90, 10]
    # overlap: chunk k starts 80k -> first token t{80k}
    for k, row in enumerate(d1.itertuples()):
        assert row.chunk_text.split()[0] == f"t{80 * k}"
        assert row.chunk_text.split()[-1] == f"t{min(80 * k + 99, 249)}"
    assert (out[out["doc_id"] == 2]["n_chunk_tokens"] == [2]).all()
    assert 3 not in set(out["doc_id"])  # empty doc yields no chunks


def test_near_dup_cluster_policy_keeps_one_per_component(spark):
    # a chain where the PAIRWISE policy over-keeps: 2-3 similar, 3-9
    # similar, but 2-9 not emitted — cluster policy must keep only the
    # component minimum
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 4
    rows = [
        (2, base, "en", "web", 0),
        (3, base + "phi", "en", "web", 0),
        (9, base + "phi chi psi", "en", "web", 0),
        (4, "a completely different text " * 10, "en", "web", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    kept = clean_corpus(df, min_tokens=10, near_dup=True,
                        near_dup_threshold=0.7,
                        near_dup_policy="cluster").select("doc_id").toPandas()
    assert sorted(kept["doc_id"]) == [2, 4]


def test_hash_split_deterministic_and_proportions(spark):
    from ultraviolet_spark.operators.corpus import hash_split

    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = hash_split(docs).orderBy("doc_id").toPandas()
    b = hash_split(docs).orderBy("doc_id").toPandas()
    assert (a["split"] == b["split"]).all()       # stable across runs
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 204 / 256) < 0.03  # ~md5-uniform buckets
    assert abs(frac["val"] - 26 / 256) < 0.02
    # salt changes the assignment but not the proportions
    c = hash_split(docs, salt="v2").orderBy("doc_id").toPandas()
    assert (c["split"] != a["split"]).any()


def test_dsir_importance_vs_python(spark):
    import math
    from collections import Counter
    from ultraviolet_spark.operators.corpus import dsir_importance
    from pyspark.sql import functions as F

    rows = [
        (1, "the quick brown fox", "en"),
        (2, "the lazy dog sleeps", "en"),
        (3, "der schnelle braune fuchs", "de"),
        (4, "le chien paresseux dort", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r for r in
           dsir_importance(df, target_filter=F.col("lang") == "en").collect()}

    ct, cr = Counter(), Counter()
    for _, text, lang in rows:
        (ct if lang == "en" else cr).update(text.lower().split())
    vocab = set(ct) | set(cr)
    tt, tr, v = sum(ct.values()), sum(cr.values()), len(vocab)
    for doc_id, text, _ in rows:
        w = text.lower().split()
        want = round(sum(
            round(math.log((ct[x] + 1) * (tr + v) / ((cr[x] + 1) * (tt + v))), 6)
            for x in w), 6)
        assert got[doc_id]["n_words"] == len(w)
        assert abs(got[doc_id]["dsir_score"] - want) < 1e-9
        # target-domain docs score higher than off-domain ones
    assert got[1]["dsir_score"] > 0 > got[3]["dsir_score"]


def test_substring_dup_stats_literal(spark):
    from ultraviolet_spark.operators.corpus import substring_dup_stats

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tail"),
        (2, "something the quick brown fox jumps over the lazy cat here"),
        (3, "totally unique content with no repeats anywhere at all"),
        (4, ""),
        (5, "aa bb aa bb aa bb aa bb"),  # within-doc repetition
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           substring_dup_stats(df, k=3, min_count=2).collect()}
    # doc 1: 6 shared 3-grams at pos 1..6 -> union [1,8] = 8 of 10 tokens
    assert (got[1]["n_tokens"], got[1]["n_grams"],
            got[1]["n_dup_grams"], got[1]["dup_tokens"]) == (10, 8, 6, 8)
    assert got[1]["dup_frac"] == 0.8
    # doc 2: same 6 grams at pos 2..7 -> union [2,9] = 8 of 11
    assert (got[2]["n_dup_grams"], got[2]["dup_tokens"]) == (6, 8)
    # unique doc untouched; empty doc all-zero; periodic doc fully covered
    assert (got[3]["n_dup_grams"], got[3]["dup_tokens"]) == (0, 0)
    assert (got[4]["n_tokens"], got[4]["dup_tokens"]) == (0, 0)
    assert (got[5]["dup_tokens"], got[5]["dup_frac"]) == (8, 1.0)


def test_remove_dup_substrings_literal(spark):
    from ultraviolet_spark.operators.corpus import remove_dup_substrings

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tail"),
        (2, "something the quick brown fox jumps over the lazy cat here"),
        (3, "totally unique content with no repeats anywhere at all"),
        (4, ""),
        (5, "aa bb aa bb aa bb aa bb"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           remove_dup_substrings(df, k=3, min_count=2).collect()}
    assert got[1]["text_clean"] == "dog tail"
    assert got[2]["text_clean"] == "something cat here"
    assert got[3]["text_clean"] == rows[2][1]  # untouched
    assert (got[4]["n_kept"], got[4]["text_clean"]) == (0, "")
    assert (got[5]["n_kept"], got[5]["text_clean"]) == (0, "")
    # every doc yields a row, dropped + kept == total
    for doc_id, text in rows:
        nt = len(text.split()) if text.strip() else 0
        assert got[doc_id]["n_tokens"] == nt


def test_substring_dup_hashed_equals_exact(spark, sf_dir):
    """xxhash64-keyed counting (the 100 TB shuffle shape) must agree
    with exact gram-string counting on the test corpus."""
    from ultraviolet_spark.operators.corpus import substring_dup_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = substring_dup_stats(docs, k=8).orderBy("doc_id").collect()
    b = substring_dup_stats(docs, k=8, hashed=True).orderBy("doc_id").collect()
    assert a == b
    assert any(r["n_dup_grams"] > 0 for r in a)  # the corpus has dups


def test_substring_stats_consistent_with_removal(spark, sf_dir):
    """dup_tokens (interval-union size) == n_tokens - n_kept for every
    doc: the two ops implement the same coverage semantics."""
    from ultraviolet_spark.operators.corpus import (
        remove_dup_substrings,
        substring_dup_stats,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = {r["doc_id"]: r for r in substring_dup_stats(docs, k=8).collect()}
    r = {r["doc_id"]: r for r in remove_dup_substrings(docs, k=8).collect()}
    assert set(s) == set(r)
    for did in s:
        assert s[did]["dup_tokens"] == s[did]["n_tokens"] - r[did]["n_kept"], did


def test_c4_clean_hand_cases(spark):
    from ultraviolet_spark.operators.corpus import c4_clean

    text = "\n".join([
        "This line has enough words and ends well.",   # keep
        "Short line.",                                   # <5 words
        "A line that never terminates properly",         # no punct
        "Please enable JavaScript to continue reading.", # javascript
        'He said "stop" and walked away quickly."',      # keep (quote end)
        "One more closing sentence appears right here!", # keep
    ])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = c4_clean(df).first()
    assert r["n_lines_total"] == 6
    assert r["n_lines_kept"] == 3
    assert r["clean_text"].split("\n") == [
        "This line has enough words and ends well.",
        'He said "stop" and walked away quickly."',
        "One more closing sentence appears right here!",
    ]
    # sentences: 1 ('.') + 2 ('.' after stop" counts? no: [.!?] chars
    # in kept text: line1 '.', line2 '.' , line3 '!' -> 3
    assert r["n_sentences"] == 3
    assert r["keep_page"] is True


def test_c4_clean_page_level_flags(spark):
    from ultraviolet_spark.operators.corpus import c4_clean

    good = "\n".join(["A full sentence with enough words here."] * 3)
    df = spark.createDataFrame(
        [(1, good),
         (2, good + "\nSome Lorem ipsum boilerplate follows now."),
         (3, good + "\nfunction f() { return 1; }"),
         (4, "Only one good sentence lives right here.")],
        "doc_id long, text string")
    rows = {r["doc_id"]: (r["has_lorem"], r["has_brace"], r["keep_page"])
            for r in c4_clean(df, min_sentences=3).collect()}
    assert rows[1] == (False, False, True)
    assert rows[2] == (True, False, False)
    assert rows[3] == (False, True, False)
    assert rows[4] == (False, False, False)   # < 3 sentences


# ------------------------------------------------------------- cap_per_domain

def test_cap_per_domain_literal(spark):
    from ultraviolet_spark.operators.corpus import cap_per_domain

    rows = ([(i, "big.com") for i in range(10)]
            + [(100, "small.org"), (101, "small.org")])
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = cap_per_domain(df, cap=3).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], set()).add(r["doc_id"])
    # over-cap domain trimmed to exactly cap; under-cap untouched
    assert len(by_dom["big.com"]) == 3
    assert by_dom["small.org"] == {100, 101}


def test_cap_per_domain_deterministic_and_salted(spark):
    from ultraviolet_spark.operators.corpus import cap_per_domain

    df = spark.createDataFrame([(i, "d") for i in range(50)],
                               "doc_id long, domain string")
    a = {r["doc_id"] for r in cap_per_domain(df, cap=10).collect()}
    b = {r["doc_id"] for r in
         cap_per_domain(df.repartition(7), cap=10).collect()}
    assert a == b                      # partitioning-independent
    c = {r["doc_id"] for r in cap_per_domain(df, cap=10, salt="x").collect()}
    assert len(c) == 10 and c != a     # salt re-draws the kept set


def test_cap_per_domain_rejects_bad_cap(spark):
    from ultraviolet_spark.operators.corpus import cap_per_domain

    df = spark.createDataFrame([(1, "d")], "doc_id long, domain string")
    with pytest.raises(ValueError):
        cap_per_domain(df, cap=0)


def test_domain_boilerplate_strip_hand_case(spark):
    from ultraviolet_spark.operators.corpus import domain_boilerplate_strip

    rows = [
        # domain a (4 docs): "NAV" on all 4 (stripped), "AD" on 2 of 4
        # (0.5 ≥ 0.5 → stripped at the exact boundary), unique bodies
        (1, "a", "NAV\nbody one\nAD"),
        (2, "a", "NAV\nbody two\nAD"),
        (3, "a", "NAV\nbody three"),
        (4, "a", "NAV"),                      # all-chrome page survives
        # domain b (2 docs < min_docs 3): untouched even though NAV
        # repeats in both
        (5, "b", "NAV\nbody five"),
        (6, "b", "NAV"),
        # domain c: within-doc duplicate of a boilerplate line — both
        # copies stripped; duplicate of a kept line — both kept
        (7, "c", "FOOT\nkeep\nkeep\nFOOT"),
        (8, "c", "FOOT\nother"),
        (9, "c", "FOOT\nthird"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.doc_id: (r.n_lines, r.n_kept, r.text_clean)
           for r in domain_boilerplate_strip(
               df, min_frac=0.5, min_docs=3).collect()}
    assert got[1] == (3, 1, "body one")
    assert got[3] == (2, 1, "body three")
    assert got[4] == (1, 0, "")
    assert got[5] == (2, 2, "NAV\nbody five")
    assert got[6] == (1, 1, "NAV")
    assert got[7] == (4, 2, "keep\nkeep")
    assert got[8] == (2, 1, "other")
    assert len(got) == 9


def test_length_bucketed_batches_invariants(spark):
    from ultraviolet_spark.operators.corpus import length_bucketed_batches
    rows = [(i, (i * 37) % 1000) for i in range(200)]
    rows += [(900, None), (901, -5)]          # filtered, never padded
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = length_bucketed_batches(df, batch_size=8, bucket_width=100)
    got = out.collect()
    # every doc accounted for exactly once
    assert sum(r["n_seqs"] for r in got) == 200
    for r in got:
        # bucket bound: max-min pad gap < bucket_width per sequence
        assert r["max_len"] - r["min_len"] < 100
        assert 0 < r["n_seqs"] <= 8
        assert r["is_full"] == (r["n_seqs"] == 8)
        # exact ledger
        assert r["padding"] == r["n_seqs"] * r["max_len"] - r["tokens_real"]
        assert r["padding"] >= 0
    # at most one runt batch per bucket (the tail)
    from collections import Counter
    runts = Counter(r["bucket"] for r in got if not r["is_full"])
    assert all(v == 1 for v in runts.values())


def test_length_bucketed_batches_deterministic_and_isolated(spark):
    from ultraviolet_spark.operators.corpus import length_bucketed_batches
    rows = [(i, (i * 53) % 500) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    a = sorted(map(tuple, length_bucketed_batches(
        df, batch_size=4, bucket_width=50).collect()))
    b = sorted(map(tuple, length_bucketed_batches(
        df.repartition(7), batch_size=4, bucket_width=50).collect()))
    assert a == b                             # partitioning-independent
    # adding docs to ONE bucket must not move any other bucket's batches
    extra = spark.createDataFrame([(1000 + i, 10) for i in range(8)],
                                  "doc_id long, n_chars long")
    c = length_bucketed_batches(df.union(extra), batch_size=4,
                                bucket_width=50).collect()
    before = {(r["bucket"], r["batch_idx"]): (r["n_seqs"], r["tokens_real"])
              for r in length_bucketed_batches(
                  df, batch_size=4, bucket_width=50).collect()
              if r["bucket"] != 0}
    after = {(r["bucket"], r["batch_idx"]): (r["n_seqs"], r["tokens_real"])
             for r in c if r["bucket"] != 0}
    assert before == after


def test_near_dup_exact_stage_matches_minhash_semantics(spark):
    """Round-5 q54 promotion: near_dup_exact=True swaps the MinHash
    candidate stage for exact n-gram Jaccard pairs — on a corpus where
    MinHash recall is perfect the two paths must keep the same docs,
    and the exact path is a pure function of the data (repeatable)."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 4
    rows = [
        (1, base, "en", "web", 0),
        (2, base + "phi", "en", "web", 0),
        (3, base + "phi chi", "en", "web", 0),
        (4, "a completely different text " * 10, "en", "web", 0),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
    exact = clean_corpus(df, min_tokens=10, near_dup=True,
                         near_dup_threshold=0.7,
                         near_dup_exact=True).select("doc_id").toPandas()
    assert sorted(exact["doc_id"]) == [1, 4]
    again = clean_corpus(df, min_tokens=10, near_dup=True,
                         near_dup_threshold=0.7,
                         near_dup_exact=True).select("doc_id").toPandas()
    assert sorted(again["doc_id"]) == sorted(exact["doc_id"])
