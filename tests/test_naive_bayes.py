"""Multinomial Naive Bayes (operators/mlfit.naive_bayes_classify)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.mlfit import naive_bayes_classify

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    return spark.createDataFrame(
        [(int(i), lab, txt) for i, lab, txt in rows],
        "doc_id long, lang string, text string")


def _ref(rows):
    """Sequential reference of the snapped-integer NB pipeline."""
    from collections import Counter, defaultdict
    tok = lambda t: [w for w in t.lower().strip().split() if w]
    ct = defaultdict(Counter)
    nc_docs = Counter()
    for _, lab, txt in rows:
        if lab is None:
            continue
        nc_docs[lab] += 1
        ct[lab].update(tok(txt))
    vocab = {t for c in ct.values() for t in c}
    V, N = len(vocab), sum(nc_docs.values())
    cls = {}
    for lab, cnts in ct.items():
        Nc = sum(cnts.values())
        w0 = -round(1e6 * math.log(Nc + V))
        prior = round(1e6 * (math.log(nc_docs[lab]) - math.log(N)))
        wt = {t: round(1e6 * (math.log(n + 1) - math.log(Nc + V)))
              for t, n in cnts.items()}
        cls[lab] = (w0, prior, wt)
    out = {}
    for i, lab, txt in rows:
        cnt = Counter(t for t in tok(txt) if t in vocab)
        td = sum(cnt.values())
        best = None
        for c in sorted(cls):
            w0, prior, wt = cls[c]
            sc = prior + td * w0 + sum(
                n * (wt.get(t, w0) - w0) for t, n in cnt.items())
            if best is None or sc > best[1]:
                best = (c, sc)
        out[i] = best
    return out


ROWS = [
    (1, "en", "the cat sat on the mat"),
    (2, "en", "a dog and a cat"),
    (3, "en", "the quick brown fox"),
    (4, "fr", "le chat est sur le tapis"),
    (5, "fr", "un chien et un chat"),
    (6, "de", "die katze sitzt auf der matte"),
    (7, "en", "the dog sat"),
    (8, "fr", "le chien"),
]


def test_matches_sequential_reference(spark):
    got = {r["id"]: (r["pred"], r["score_micro"])
           for r in naive_bayes_classify(
               _mk(spark, ROWS), id_col="doc_id", label_col="lang",
               text_col="text").collect()}
    assert got == _ref(ROWS)


def test_classifies_held_out_style_tokens(spark):
    # training tokens dominate: a doc made of 'le chat' tokens lands fr
    rows = ROWS + [(100, None, "le chat le chat"),
                   (101, None, "the cat the dog")]
    got = {r["id"]: r["pred"]
           for r in naive_bayes_classify(
               _mk(spark, rows), id_col="doc_id", label_col="lang",
               text_col="text").collect()}
    assert got[100] == "fr"
    assert got[101] == "en"


def test_oov_tokens_dropped(spark):
    # appending pure-OOV tokens must not change any score
    rows = ROWS + [(100, None, "le chat")]
    noisy = ROWS + [(100, None, "le chat zzzunseen qqqnovel")]
    a = naive_bayes_classify(_mk(spark, rows), id_col="doc_id",
                             label_col="lang", text_col="text")
    b = naive_bayes_classify(_mk(spark, noisy), id_col="doc_id",
                             label_col="lang", text_col="text")
    ga = {r["id"]: (r["pred"], r["score_micro"]) for r in a.collect()}
    gb = {r["id"]: (r["pred"], r["score_micro"]) for r in b.collect()}
    assert ga == gb


def test_empty_doc_predicts_majority_prior(spark):
    rows = ROWS + [(100, None, "   ")]
    got = {r["id"]: r["pred"]
           for r in naive_bayes_classify(
               _mk(spark, rows), id_col="doc_id", label_col="lang",
               text_col="text").collect()}
    # 'en' has 4 of 8 training docs → largest prior
    assert got[100] == "en"


def test_tokenless_class_scored_prior_only(spark):
    """ADVICE r3: a training class whose documents are all empty has
    no (class, token) rows but must still enter the model with
    __Nc = 0 and compete prior-only — not be silently dropped."""
    rows = [(1, "a", "x x x"), (2, "a", "x y"),
            (3, "b", ""), (4, "b", ""), (5, "b", ""),
            (6, None, "")]  # empty unlabeled doc: prior-only argmax
    df = spark.createDataFrame(rows, "id long, label string, text string")
    got = {r["id"]: r for r in naive_bayes_classify(
        df, id_col="id", text_col="text",
        label_col="label").collect()}
    # class 'b' exists in the scored class set (it wins some row)
    preds = {r["pred"] for r in got.values()}
    assert "b" in preds
    # empty doc scores prior-only: P(b) = 3/5 > P(a) = 2/5 → 'b'
    assert got[6]["pred"] == "b"
    # docs with only class-a vocabulary still go to 'a'
    assert got[1]["pred"] == "a"
