"""Porter stemmer: every per-step example from the 1980 paper against
the exact step it illustrates, the paper's end-to-end reference
examples, measure/condition helpers, idempotence on stems of real
vocabulary, and the vocabulary-route Spark wrapper."""

from __future__ import annotations

from ultraviolet_spark.operators.stem import (
    _ends_cvc,
    _ends_double_cons,
    _measure,
    _step1a,
    _step1b,
    _step1c,
    _step2,
    _step3,
    _step4,
    _step5a,
    _step5b,
    porter_stem,
    stem_tokens,
)

# the paper's own per-step example tables (Porter 1980 §"The algorithm")
STEP_EXAMPLES = {
    _step1a: [("caresses", "caress"), ("ponies", "poni"),
              ("ties", "ti"), ("caress", "caress"), ("cats", "cat")],
    _step1b: [("feed", "feed"), ("agreed", "agree"),
              ("plastered", "plaster"), ("bled", "bled"),
              ("motoring", "motor"), ("sing", "sing"),
              ("conflated", "conflate"), ("troubled", "trouble"),
              ("sized", "size"), ("hopping", "hop"), ("tanned", "tan"),
              ("falling", "fall"), ("hissing", "hiss"),
              ("fizzed", "fizz"), ("failing", "fail"),
              ("filing", "file")],
    _step1c: [("happy", "happi"), ("sky", "sky")],
    _step2: [("relational", "relate"), ("conditional", "condition"),
             ("rational", "rational"), ("valenci", "valence"),
             ("hesitanci", "hesitance"), ("digitizer", "digitize"),
             ("conformabli", "conformable"), ("radicalli", "radical"),
             ("differentli", "different"), ("vileli", "vile"),
             ("analogousli", "analogous"),
             ("vietnamization", "vietnamize"),
             ("predication", "predicate"), ("operator", "operate"),
             ("feudalism", "feudal"), ("decisiveness", "decisive"),
             ("hopefulness", "hopeful"), ("callousness", "callous"),
             ("formaliti", "formal"), ("sensitiviti", "sensitive"),
             ("sensibiliti", "sensible")],
    _step3: [("triplicate", "triplic"), ("formative", "form"),
             ("formalize", "formal"), ("electriciti", "electric"),
             ("electrical", "electric"), ("hopeful", "hope"),
             ("goodness", "good")],
    _step4: [("revival", "reviv"), ("allowance", "allow"),
             ("inference", "infer"), ("airliner", "airlin"),
             ("gyroscopic", "gyroscop"), ("adjustable", "adjust"),
             ("defensible", "defens"), ("irritant", "irrit"),
             ("replacement", "replac"), ("adjustment", "adjust"),
             ("dependent", "depend"), ("adoption", "adopt"),
             ("homologou", "homolog"), ("communism", "commun"),
             ("activate", "activ"), ("angulariti", "angular"),
             ("homologous", "homolog"), ("effective", "effect"),
             ("bowdlerize", "bowdler")],
    _step5a: [("probate", "probat"), ("rate", "rate"),
              ("cease", "ceas")],
    _step5b: [("controll", "control"), ("roll", "roll")],
}


def test_every_paper_step_example():
    for step, pairs in STEP_EXAMPLES.items():
        for w, want in pairs:
            assert step(w) == want, (step.__name__, w, step(w), want)


def test_paper_end_to_end_examples():
    # the famous whole-pipeline examples from the paper
    assert porter_stem("generalizations") == "gener"
    assert porter_stem("oscillators") == "oscil"
    # per-step examples CONTINUE through later steps end-to-end
    assert porter_stem("agreed") == "agre"          # 1b → 5a
    assert porter_stem("relational") == "relat"     # 2 → 5a
    assert porter_stem("electrical") == "electr"    # 3 → 4


def test_measure_examples():
    # the paper's m examples
    for w, m in [("tr", 0), ("ee", 0), ("tree", 0), ("y", 0), ("by", 0),
                 ("trouble", 1), ("oats", 1), ("trees", 1), ("ivy", 1),
                 ("troubles", 2), ("private", 2), ("oaten", 2),
                 ("orrery", 2)]:
        assert _measure(w) == m, (w, _measure(w), m)


def test_conditions():
    assert _ends_cvc("hop") and _ends_cvc("hil")
    assert not _ends_cvc("how") and not _ends_cvc("box")  # w, x excluded
    assert _ends_double_cons("fizz") and not _ends_double_cons("free")


def test_y_consonant_rule():
    # y after consonant is a vowel; y at start / after vowel is consonant
    assert _measure("syzygy") == 2
    assert porter_stem("sky") == "sky"      # no vowel before y → no 1c


def test_short_words_untouched():
    for w in ["a", "is", "by", "ox"]:
        assert porter_stem(w) == w


def test_idempotent_on_outputs():
    words = ["generalizations", "oscillators", "relational", "happiness",
             "running", "flies", "analysis", "computers", "national"]
    for w in words:
        s = porter_stem(w)
        assert porter_stem(s) == s or len(s) <= 2, (w, s, porter_stem(s))


def test_spark_vocabulary_route(spark):
    rows = [(0, "running"), (1, "flies"), (2, "running"), (3, None),
            (4, "generalizations")]
    df = spark.createDataFrame(rows, "i long, token string")
    got = {r.i: r.stem for r in stem_tokens(df).collect()}
    assert got == {0: "run", 1: "fli", 2: "run", 3: None, 4: "gener"}


def test_no_row_python_in_plan(spark):
    df = spark.createDataFrame([(0, "running")], "i long, token string")
    out = stem_tokens(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
