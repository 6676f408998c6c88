"""Text-analysis expressions vs plain-Python oracles, and the
multimodal UVMEDIA plumbing (schema, batch shape, frame sampling)."""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from ultraviolet_spark.operators import multimodal as M
from ultraviolet_spark.operators import textstats as X


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_token_counts_vs_python(docs):
    got = docs.select("doc_id", X.token_count(F.col("text")).alias("n"),
                      X.bpe_token_count(F.col("text")).alias("nb")).toPandas()
    pdf = docs.select("doc_id", "text").toPandas()
    for (_, g), (_, p) in zip(got.iterrows(), pdf.iterrows()):
        assert g["n"] == len(p["text"].strip().split())
        assert g["nb"] == len(re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", p["text"]))


def test_quality_features_ratios(docs):
    got = X.quality_features(docs).limit(20).toPandas()
    for _, r in got.iterrows():
        t = r["text"]
        assert r["punct_ratio"] == pytest.approx(
            len(re.findall(r"[.,!?;:]", t)) / len(t))
        assert r["mean_token_len"] == pytest.approx(
            len(re.sub(r"\s+", "", t.strip())) / len(t.strip().split()))


def test_predict_lang_on_crafted_texts(spark):
    rows = [
        (0, "the cat and the dog is in the house"),        # en
        (1, "der hund und die katze ist mit für ein"),     # de
        (2, "el perro y la casa es con para un"),          # es
        (3, "xyzzy qwerty plugh"),                         # no stopwords → und
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = dict(df.select("doc_id", X.predict_lang(F.col("text")).alias("p"))
               .collect())
    assert got == {0: "en", 1: "de", 2: "es", 3: "und"}


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello   World"), (1, "hello world"), (2, "hello  world ")],
        ["doc_id", "text"])
    fps = [r["f"] for r in
           df.select(X.fingerprint(F.col("text")).alias("f")).collect()]
    assert fps[0] == fps[1] == fps[2]
    assert len(fps[0]) == 16


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

def test_media_features_roundtrip(spark):
    payload = bytes(range(256))
    rows = [
        (1, M.pack_media(0, 16, 16, 1, 0, 1, payload)),        # image
        (2, M.pack_media(1, 0, 0, 1, 16000, 0, payload[:64])), # audio
        (3, b"not a media file"),                              # unknown
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["media_id", "blob"])
    got = M.media_features(df).toPandas().set_index("media_id")
    assert got.loc[1, "kind"] == "image" and got.loc[1, "width"] == 16
    assert got.loc[1, "mean_intensity"] == pytest.approx(127.5)
    assert len(got.loc[1, "feature_vec"]) == 8
    assert got.loc[1, "feature_vec"].sum() == pytest.approx(1.0, abs=1e-6)
    assert got.loc[2, "kind"] == "audio" and got.loc[2, "sample_rate"] == 16000
    assert got.loc[3, "kind"] == "unknown" and np.isnan(got.loc[3, "mean_intensity"])
    assert got.loc[4, "kind"] == "unknown"


def test_frame_sample(spark):
    w = h = 4
    nframes = 25
    frames = b"".join(bytes([i]) * (w * h) for i in range(nframes))
    df = spark.createDataFrame(
        [(7, M.pack_media(2, w, h, 1, 0, nframes, frames))], ["media_id", "blob"])
    got = M.frame_sample(df, every_n=10).toPandas().sort_values("frame_no")
    assert list(got["frame_no"]) == [0, 10, 20]
    assert all(bytes(f) == bytes([n]) * (w * h)
               for f, n in zip(got["frame"], got["frame_no"]))


def test_codec_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        M._codec_decode("image", b"\x89PNG")


# ---------------------------------------------------------------------------
# Gopher-style repetition / diversity signals
# ---------------------------------------------------------------------------

def test_repetition_signals_vs_python(spark):
    from ultraviolet_spark.operators.textstats import repetition_signals

    texts = [
        (1, "the cat sat on the mat the cat"),
        (2, "a a a a"),
        (3, "unique words only here"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_signals(df).collect()}
    for doc_id, text in texts:
        w = text.lower().split()
        from collections import Counter
        c = Counter(w)
        r = got[doc_id]
        assert r["n_words"] == len(w)
        assert r["n_distinct"] == len(c)
        assert r["type_token_ratio"] == round(len(c) / len(w), 6)
        assert r["top_word_frac"] == round(max(c.values()) / len(w), 6)
        assert r["mean_word_len"] == round(sum(map(len, w)) / len(w), 6)


def test_top_bigram_frac_vs_python(spark):
    from ultraviolet_spark.operators.textstats import top_bigram_frac

    texts = [
        (1, "x y x y x y"),         # "x y" dominates
        (2, "one two three four"),  # all bigrams unique
        (3, "solo"),                # <2 words -> no row
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in top_bigram_frac(df).collect()}
    assert 3 not in got
    from collections import Counter
    for doc_id, text in texts[:2]:
        w = text.lower().split()
        bgs = Counter(" ".join(w[i:i + 2]) for i in range(len(w) - 1))
        r = got[doc_id]
        assert r["n_bigrams"] == len(w) - 1
        assert r["top_bigram_frac"] == round(max(bgs.values()) / (len(w) - 1), 6)
