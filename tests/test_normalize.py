"""Unicode normalization operator: UAX #15 conformance probes against
CPython's unicodedata (ground truth) and DuckDB's independent utf8proc
implementation, plus null/quick-check behavior.

All non-ASCII is written as explicit \\u escapes — decomposed vs
precomposed is invisible in rendered source and editors/tools may
silently NFC a file."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest

# (label, input) — composition cases across scripts, all decomposed
# unless the label says otherwise
PROBES = [
    ("latin_acute", "e\u0301galite\u0301"),
    ("ring", "A\u030Angstro\u0308m"),
    ("hangul_jamo", "\u1100\u1161\u11a8"),       # -> U+AC01 (LVT)
    ("reorder_marks", "x\u0300\u0316y"),          # ccc 230 before 220
    ("already_nfc", "plain ascii text"),
    ("precomposed", "\u00e9galit\u00e9 \u00c5 \uac00"),
]


def test_unicode_normalize_matches_unicodedata(spark):
    from ultraviolet_spark.operators.normalize import unicode_normalize

    df = spark.createDataFrame(
        [(k, v) for k, v in PROBES], "label string, text string")
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        got = {r["label"]: r["n"] for r in
               df.select("label",
                         unicode_normalize("text", form).alias("n"))
               .collect()}
        want = {k: unicodedata.normalize(form, v) for k, v in PROBES}
        assert got == want, form
    # sanity on the ground truth itself: composition really happened
    assert unicodedata.normalize("NFC", PROBES[2][1]) == "\uac01"


def test_unicode_normalize_matches_duckdb_nfc(spark):
    """Cross-engine: DuckDB's utf8proc NFC is an independent UAX #15
    implementation — byte-identical output is conformance evidence."""
    from ultraviolet_spark.operators.normalize import unicode_normalize

    df = spark.createDataFrame(
        [(k, v) for k, v in PROBES], "label string, text string")
    got = {r["label"]: r["n"] for r in
           df.select("label", unicode_normalize("text").alias("n"))
           .collect()}
    con = duckdb.connect()
    for k, v in PROBES:
        d = con.execute("select nfc_normalize(?)", [v]).fetchone()[0]
        assert got[k] == d, k


def test_is_normalized_and_nulls(spark):
    from ultraviolet_spark.operators.normalize import (
        is_normalized,
        unicode_normalize,
    )

    df = spark.createDataFrame(
        [(1, "ascii only"), (2, "e\u0301"), (3, None)],
        "id long, text string")
    rows = {r["id"]: (r["ok"], r["n"]) for r in
            df.select("id", is_normalized("text").alias("ok"),
                      unicode_normalize("text").alias("n")).collect()}
    assert rows[1] == (True, "ascii only")
    assert rows[2] == (False, "\u00e9")
    assert rows[3] == (None, None)


def test_nfkc_folds_compatibility(spark):
    """NFKC (and only the K forms) folds ligatures/fullwidth — the
    tokenizer-friendly form."""
    from ultraviolet_spark.operators.normalize import unicode_normalize

    df = spark.createDataFrame(
        [(1, "\ufb01le \uff21\uff22\uff23")], "id long, text string")
    row = df.select(
        unicode_normalize("text", "NFC").alias("nfc"),
        unicode_normalize("text", "NFKC").alias("nfkc")).first()
    assert row["nfc"] == "\ufb01le \uff21\uff22\uff23"   # untouched
    assert row["nfkc"] == "file ABC"


def test_bad_form_rejected():
    from ultraviolet_spark.operators.normalize import unicode_normalize

    with pytest.raises(ValueError):
        unicode_normalize("text", "NFX")


def test_normalize_corpus_flags(spark):
    from ultraviolet_spark.operators.normalize import normalize_corpus

    df = spark.createDataFrame(
        [(1, "plain"), (2, "e\u0301")], "doc_id long, text string")
    rows = {r["doc_id"]: (r["text"], r["was_normalized"]) for r in
            normalize_corpus(df).collect()}
    assert rows == {1: ("plain", True), 2: ("\u00e9", False)}
