"""FastSS deletion-neighborhood join vs brute-force Levenshtein, and
lang_segments vs a plain-Python reference."""
from __future__ import annotations

import itertools

import pytest

from ultraviolet_spark.operators.fuzzy import deletion_neighborhood_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(words: list[str], d: int) -> set[tuple[str, str, int]]:
    out = set()
    for a, b in itertools.combinations(sorted(set(words)), 2):
        dist = _lev(a, b)
        if dist <= d:
            out.add((a, b, dist))
    return out


WORDS = ["spark", "spork", "spark", "park", "stark", "shark", "sharks",
         "a", "b", "ab", "ba", "abc", "cab", "table", "cable", "tables",
         "zzz", "kitten", "sitting", "mitten", "xyzzy", ""]


@pytest.mark.parametrize("d", [1, 2])
def test_matches_brute_force(spark, d):
    df = spark.createDataFrame([(w,) for w in WORDS if w], "word string")
    got = {(r["word_a"], r["word_b"], r["dist"])
           for r in deletion_neighborhood_pairs(df, col="word",
                                                max_dist=d).collect()}
    assert got == _brute([w for w in WORDS if w], d)


def test_unicode_words(spark):
    words = ["café", "cafe", "cafés", "naïve", "naive", "日本語", "日本"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {(r["word_a"], r["word_b"], r["dist"])
           for r in deletion_neighborhood_pairs(df, col="word",
                                                max_dist=2).collect()}
    assert got == _brute(words, 2)


def test_duplicates_collapse(spark):
    df = spark.createDataFrame([("dog",), ("dog",), ("dig",)], "word string")
    rows = deletion_neighborhood_pairs(df, col="word", max_dist=1).collect()
    assert len(rows) == 1 and rows[0]["dist"] == 1


def test_lang_segments_hand_case(spark):
    from ultraviolet_spark.operators.textstats import lang_segments

    en = "the cat and the dog is with for in to"        # 10 en tokens
    de = "der hund und die katze ist mit für ein und"   # 10 de tokens
    doc0 = f"{en} {en} {de} {en}"    # runs: en(2 chunks), de(1), en(1)
    doc1 = de                        # one de chunk
    df = spark.createDataFrame([(0, doc0), (1, doc1), (2, "   ")],
                               "doc_id long, text string")
    rows = sorted(
        ((r["doc_id"], r["seg_start"], r["seg_end"], r["lang"],
          r["n_chunks"])
         for r in lang_segments(df, chunk_tokens=10).collect()))
    assert rows == [(0, 0, 1, "en", 2), (0, 2, 2, "de", 1),
                    (0, 3, 3, "en", 1), (1, 0, 0, "de", 1)]


def test_lang_segments_partial_last_chunk(spark):
    from ultraviolet_spark.operators.textstats import lang_segments

    # 13 tokens -> chunks of 10 and 3; both English-scored
    txt = "the and of to in is with for the and " + "the and of"
    df = spark.createDataFrame([(0, txt)], "doc_id long, text string")
    rows = sorted((r["seg_start"], r["seg_end"], r["lang"], r["n_chunks"])
                  for r in lang_segments(df, chunk_tokens=10).collect())
    assert rows == [(0, 1, "en", 2)]


def test_entity_resolve_hand_case(spark):
    """Three dirty surface forms of one entity (typo chain a-b, b-c —
    transitivity required), one distinct singleton that must NOT merge,
    and one distance-1 pair whose JW falls BELOW the threshold (first
    char deleted kills the prefix boost) so blocking alone must not
    decide matches."""
    from ultraviolet_spark.operators.fuzzy import entity_resolve, \
        _jaro_winkler_py

    recs = ["acme-corporation", "acme-corporatio",   # deletion typo
            "acme-corporatton",                      # substitution of the 2nd
            "zebra-industries",                      # singleton
            "qxv", "xv"]                             # lev 1 but low JW
    assert _jaro_winkler_py("qxv", "xv") < 0.9
    assert _jaro_winkler_py("acme-corporation", "acme-corporatio") >= 0.9
    df = spark.createDataFrame([(r,) for r in recs], "name string")
    out = {r["cluster_id"]: (r["n_members"], r["members"])
           for r in entity_resolve(df, col="name", threshold=0.9).collect()}
    assert out == {"acme-corporatio": (
        3, "acme-corporatio|acme-corporation|acme-corporatton")}
