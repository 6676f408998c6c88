"""wordpiece_segment / wordpiece_tokens: greedy longest-match-first
semantics, the all-or-nothing UNK rule, continuation-prefix
discipline, the 100-char guard, and the vocabulary-route Spark path."""

from __future__ import annotations

from ultraviolet_spark.operators.tokenize import (
    wordpiece_segment,
    wordpiece_tokens,
)

V = {"un", "##aff", "##able", "##ed", "##ing", "hug", "##g", "##s",
     "play", "##ful", "##ly", "walk", "run", "##n",
     "walking", "##walkable"}


def test_known_segmentations():
    cases = {
        "unaffable": ["un", "##aff", "##able"],
        "hugging": ["hug", "##g", "##ing"],
        "playfully": ["play", "##ful", "##ly"],
        "walked": ["walk", "##ed"],
        "running": ["run", "##n", "##ing"],
        "play": ["play"],
    }
    for w, want in cases.items():
        assert wordpiece_segment(w, V) == want, w


def test_greedy_prefers_longest():
    # "walking" is a whole-word vocab entry: greedy must take it over
    # walk + ##ing
    assert wordpiece_segment("walking", V) == ["walking"]
    # and "unwalkable" uses the LONG continuation piece
    assert wordpiece_segment("unwalkable", V) == ["un", "##walkable"]


def test_all_or_nothing_unk():
    # a word whose PREFIX segments fine but whose tail cannot must be
    # [UNK] entirely — no partial emission
    assert wordpiece_segment("walkzzz", V) == ["[UNK]"]
    assert wordpiece_segment("xyz", V) == ["[UNK]"]


def test_continuation_needs_hash_prefix():
    # "play" exists only as a word-start piece: mid-word it cannot
    # match, so "unplayable" is [UNK] (the q249 lesson)
    assert wordpiece_segment("unplayable", V) == ["[UNK]"]


def test_max_chars_guard():
    assert wordpiece_segment("a" * 101, V) == ["[UNK]"]
    assert wordpiece_segment("a" * 101, V | {"a", "##a"}) == ["[UNK]"]


def test_spark_vocabulary_route(spark):
    rows = [(0, "hugging"), (1, "walked"), (2, "hugging"), (3, None),
            (4, "zzz")]
    df = spark.createDataFrame(rows, "i long, token string")
    out = wordpiece_tokens(df, sorted(V))
    got = {r.i: (None if r.pieces is None else list(r.pieces))
           for r in out.collect()}
    assert got == {0: ["hug", "##g", "##ing"], 1: ["walk", "##ed"],
                   2: ["hug", "##g", "##ing"], 3: None, 4: ["[UNK]"]}


def test_no_row_python_in_plan(spark):
    df = spark.createDataFrame([(0, "walked")], "i long, token string")
    out = wordpiece_tokens(df, sorted(V))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
