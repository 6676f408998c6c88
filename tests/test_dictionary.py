"""dictionary_hits: hand ground truth incl. overlapping occurrences
(the case substring counting misses), mixed phrase lengths in one
call, normalization, empty docs, and the broadcast plan shape."""

from __future__ import annotations

from ultraviolet_spark.operators.index import dictionary_hits


def _docs(spark):
    return spark.createDataFrame([
        (0, "the Quick  brown fox jumps the quick brown dog"),
        (1, "a a a"),
        (2, "nothing of note"),
        (3, ""),
        (4, "edge quick brown"),
    ], "doc_id long, text string")


def test_hand_ground_truth(spark):
    hits = dictionary_hits(
        _docs(spark),
        ["quick brown", "a a", "the quick brown", "missing phrase"])
    got = sorted(map(tuple, hits.collect()))
    assert got == [
        (0, "quick brown", 1), (0, "quick brown", 6),
        (0, "the quick brown", 0), (0, "the quick brown", 5),
        (1, "a a", 0), (1, "a a", 1),          # OVERLAPPING occurrences
        (4, "quick brown", 1),
    ]


def test_mixed_lengths_single_call(spark):
    docs = spark.createDataFrame(
        [(0, "one two three four")], "doc_id long, text string")
    hits = dictionary_hits(
        docs, ["two", "two three", "one two three four", "three four five"])
    got = sorted(map(tuple, hits.collect()))
    assert got == [(0, "one two three four", 0),
                   (0, "two", 1), (0, "two three", 1)]


def test_case_and_whitespace_normalized(spark):
    docs = spark.createDataFrame(
        [(0, "  HELLO   World  ")], "doc_id long, text string")
    hits = dictionary_hits(docs, ["hello world", "Hello   WORLD"])
    got = sorted(map(tuple, hits.collect()))
    # both dictionary spellings normalize to the same token sequence
    assert got == [(0, "Hello   WORLD", 0), (0, "hello world", 0)]


def test_partial_prefix_is_not_a_hit(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha gamma beta")],
        "doc_id long, text string")
    hits = dictionary_hits(docs, ["alpha beta"])
    assert sorted(map(tuple, hits.collect())) == [(0, "alpha beta", 0)]


def test_dictionary_is_broadcast(spark):
    out = dictionary_hits(_docs(spark), ["quick brown"])
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in plan
