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


# ---------------------------------------------------------------- real codecs

def _px(h, w, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_bmp_roundtrip_odd_width():
    # w=5 -> 15-byte rows padded to 16: padding must not leak into pixels
    for w in (1, 2, 3, 5, 7, 8):
        px = _px(4, w)
        out = M.decode_bmp(M.make_bmp(px))
        assert out["width"] == w and out["height"] == 4 and out["channels"] == 3
        assert np.array_equal(out["pixels"], px)


def test_bmp_top_down_negative_height():
    px = _px(3, 4)
    # make_bmp writes file rows bottom-up (= px[::-1][::-1] reversed),
    # so flagging the SAME file as top-down must yield the row-flip
    blob = bytearray(M.make_bmp(px))
    import struct as _s
    blob[22:26] = _s.pack("<i", -3)
    out = M.decode_bmp(bytes(blob))
    assert np.array_equal(out["pixels"], px[::-1])


def test_bmp_rejects_truncated_and_compressed():
    px = _px(4, 4)
    blob = M.make_bmp(px)
    with pytest.raises(ValueError):
        M.decode_bmp(blob[:40])
    with pytest.raises(ValueError):
        M.decode_bmp(blob[:60])  # header ok, pixel data missing
    bad = bytearray(blob)
    bad[30] = 1  # BI_RLE8
    with pytest.raises(NotImplementedError):
        M.decode_bmp(bytes(bad))


def test_wav_roundtrip_and_chunk_walk():
    s = ((np.arange(33) * 997) % 4001 - 2000).astype(np.int16)
    blob = M.make_wav(s, 16000)
    out = M.decode_wav(blob)
    assert out["sample_rate"] == 16000 and out["channels"] == 1
    assert np.array_equal(out["samples"][:, 0], s)
    # inject a junk chunk with ODD size before fmt: walker must word-align
    junk = b"JUNK" + (5).to_bytes(4, "little") + b"abcde" + b"\0"
    patched = blob[:12] + junk + blob[12:]
    patched = patched[:4] + (len(patched) - 8).to_bytes(4, "little") + patched[8:]
    out2 = M.decode_wav(patched)
    assert np.array_equal(out2["samples"], out["samples"])


def test_wav_stereo_and_8bit():
    s = np.arange(20, dtype=np.int16).reshape(10, 2)
    out = M.decode_wav(M.make_wav(s.ravel(), 8000, channels=2))
    assert out["channels"] == 2 and out["samples"].shape == (10, 2)
    assert np.array_equal(out["samples"], s)
    # 8-bit unsigned: 128 -> 0
    body = bytes([128, 255, 0])
    fmt = b"fmt " + (16).to_bytes(4, "little") + \
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little") + \
        (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little") + \
        (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
    data = b"data" + len(body).to_bytes(4, "little") + body + b"\0"
    blob = b"RIFF" + (4 + len(fmt) + len(data)).to_bytes(4, "little") + b"WAVE" + fmt + data
    out8 = M.decode_wav(blob)
    assert list(out8["samples"][:, 0]) == [0, 127, -128]


def test_wav_rejects_non_pcm():
    s = np.zeros(4, dtype=np.int16)
    bad = bytearray(M.make_wav(s, 8000))
    bad[20] = 3  # IEEE float format tag
    with pytest.raises(NotImplementedError):
        M.decode_wav(bytes(bad))


def test_decode_features_spark_end_to_end(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    out = (M.decode_features(M.synthesize_media(df))
           .toPandas().set_index("media_id").sort_index())
    assert set(out.loc[out.index % 2 == 0, "kind"]) == {"bmp"}
    assert set(out.loc[out.index % 2 == 1, "kind"]) == {"wav"}
    # spot-check one image analytically: id=2 -> w=6, h=5
    i, w, h = 2, 6, 5
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    assert out.loc[2, "width"] == w and out.loc[2, "height"] == h
    assert abs(out.loc[2, "mean_b"]
               - round(((i + 7 * xs + 13 * ys) % 256).mean(), 6)) < 1e-9
    # and one wav: id=3 -> n=35
    n = 32 + 3 % 17
    s = (3 * 31 + np.arange(n) * 97) % 4001 - 2000
    assert out.loc[3, "n_samples"] == n
    assert abs(out.loc[3, "rms"] - round(float(np.sqrt((s.astype(float) ** 2).mean())), 6)) < 1e-9


def test_decode_features_poison_blobs_survive(spark):
    rows = [(1, bytearray(b"BMgarbage")), (2, bytearray(b"RIFFxxxxWAVE")),
            (3, bytearray(b"")), (4, None), (5, bytearray(b"\x89PNG\r\n"))]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    out = M.decode_features(df).toPandas()
    assert len(out) == 5
    assert set(out["kind"]) == {"unknown"}


def test_split_sentences_cases(spark):
    from ultraviolet_spark.operators.textstats import split_sentences

    cases = [
        # abbreviations, any case
        (1, "Mr. Jones met Mrs. Lee. They left.",
         ["Mr. Jones met Mrs. Lee.", "They left."]),
        # decimals never split; quotes open a sentence
        (2, 'Pi is 3.14 roughly. "Correct," she said.',
         ["Pi is 3.14 roughly.", '"Correct," she said.']),
        # closing quote belongs to the left sentence
        (3, 'He said "go." Then silence!',
         ['He said "go."', "Then silence!"]),
        # e.g./i.e. internal dots protected
        (4, "Use tools, e.g. Spark. I.e. distributed ones.",
         ["Use tools, e.g. Spark.", "I.e. distributed ones."]),
        # lowercase after the dot -> NOT a boundary
        (5, "see section 2. then continue",
         ["see section 2. then continue"]),
        (6, "No punctuation at all", ["No punctuation at all"]),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in cases],
                               "doc_id long, text string")
    got = {}
    for r in split_sentences(df).collect():
        got.setdefault(r["doc_id"], []).append((r["sent_idx"], r["sentence"]))
    for i, _, want in cases:
        sents = [s for _, s in sorted(got[i])]
        assert sents == want, (i, sents)


# ---------------------------------------------------- entropy / compression

def test_char_entropy_matches_python_reference(spark):
    import math
    from collections import Counter

    from ultraviolet_spark.operators.textstats import char_entropy

    rows = [(1, "aaaaaaaa"), (2, "abcdefgh"), (3, "the quick brown fox"),
            (4, ""), (5, "中文中文中文xy")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_chars"], r["distinct_chars"], r["entropy"])
           for r in char_entropy(df).collect()}

    for did, text in rows:
        if not text:
            assert got[did] == (0, 0, 0.0)
            continue
        c = Counter(text)
        n = sum(c.values())
        s = sum(v * round(math.log(v) * 1e6) for v in c.values())
        want = round((n * round(math.log(n) * 1e6) - s) / (n * 1e6), 6)
        assert got[did] == (n, len(c), want), did
    assert got[1][2] == 0.0                    # single-char doc: H = 0
    # more symbols -> more entropy: prose(15 sym) > uniform-8 > constant
    assert got[3][2] > got[2][2] > got[1][2]


def test_compression_signals_reference_and_ordering(spark):
    import zlib

    from ultraviolet_spark.operators.textstats import compression_signals

    prose = ("The four seasons turn and markets open while rivers "
             "carve new valleys under a changing sky.")
    spammy = "buy cheap now " * 32
    rows = [(1, prose), (2, spammy), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["deflate_len"], r["compression_ratio"])
           for r in compression_signals(df).collect()}

    for did, text in rows:
        if text is None:
            assert got[did] == (None, None)
            continue
        want = len(zlib.compress(text.encode("utf-8"), 6))
        assert got[did][0] == want
        assert got[did][1] == round(want / len(text.encode("utf-8")), 6)
    assert got[2][1] < got[1][1] / 2           # templated spam compresses 2x+


# ---------------------------------------------------- readability

def test_readability_hand_cases(spark):
    from ultraviolet_spark.operators.textstats import readability_signals
    rows = [
        (1, "The cat sat."),                       # 3 words, 3 syllables
        (2, "Beautiful examples everywhere! Yes."),
        (3, ""),                                   # empty: 1 sent, 0 words
        (4, "tv"),                                 # no vowels -> 1 syllable
        (5, "table"),                              # silent-e kept: 'le' end
        (6, "make"),                               # silent e dropped: 1 syl
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in readability_signals(df).collect()}
    assert (got[1]["n_sents"], got[1]["n_words"],
            got[1]["n_syllables"]) == (1, 3, 3)
    assert got[3]["n_words"] == 0 and got[3]["flesch"] is None
    assert got[4]["n_syllables"] == 1
    # table -> ta-ble: groups a,e = 2, ends 'le' so no silent-e drop
    assert got[5]["n_syllables"] == 2
    # make -> groups a,e = 2, silent final e -> 1
    assert got[6]["n_syllables"] == 1
    # flesch for "The cat sat.": 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert abs(got[1]["flesch"] - 119.19) < 1e-9


def test_readability_orders_simple_vs_complex(spark):
    from ultraviolet_spark.operators.textstats import readability_signals
    simple = "The dog ran. The cat sat. We go now."
    complex_ = ("Incomprehensibility characterizes institutional "
                "bureaucratization notwithstanding organizational "
                "rationalization imperatives.")
    df = spark.createDataFrame([(1, simple), (2, complex_)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r for r in readability_signals(df).collect()}
    assert got[1]["flesch"] > got[2]["flesch"]
    assert got[1]["fk_grade"] < got[2]["fk_grade"]


# ---------------------------------------------------- dHash + audio frames

def test_dhash_bands_identical_and_perturbed(spark):
    import numpy as np
    from ultraviolet_spark.operators.multimodal import (
        _dhash_bands, decode_bmp, dhash_hamming_pairs, image_dhash,
        make_bmp)
    y, x = np.mgrid[0:16, 0:18]
    base = ((11 * x + 3 * y) % 200).astype(np.uint8)
    a = np.stack([base] * 3, -1)
    b = a.copy()                      # exact duplicate -> distance 0
    c = a.copy()
    c[:, :2] = np.minimum(c[:, :2].astype(int) + 55, 255).astype("uint8")
    rows = [(1, make_bmp(a)), (2, make_bmp(b)), (3, make_bmp(c))]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    bands = image_dhash(df)
    got = {(r["media_id"], r["band"]): r["value"] for r in bands.collect()}
    assert len(got) == 12  # 3 images x 4 bands
    assert all(got[(1, k)] == got[(2, k)] for k in range(4))
    # numpy kernel agrees with the Spark path
    want = _dhash_bands(decode_bmp(make_bmp(a))["pixels"], "bmp")
    assert [got[(1, k)] for k in range(4)] == list(want)
    pairs = {(r["id_a"], r["id_b"]): r["dist"]
             for r in dhash_hamming_pairs(bands, max_dist=3).collect()}
    assert pairs[(1, 2)] == 0


def test_dhash_banded_equals_brute_force(spark):
    import numpy as np
    from ultraviolet_spark.operators.multimodal import (
        _dhash_bands, dhash_hamming_pairs, image_dhash, make_bmp,
        decode_bmp)
    rng = np.random.RandomState(3)
    blobs = []
    base = rng.randint(0, 256, (16, 18)).astype(np.uint8)
    for i in range(12):
        g = base.copy()
        # flip a few pixels per image so some pairs are close, some far
        for _ in range(i):
            yy, xx = rng.randint(0, 16), rng.randint(0, 18)
            g[yy, xx] = rng.randint(0, 256)
        blobs.append((i, make_bmp(np.stack([g] * 3, -1))))
    df = spark.createDataFrame(blobs, "media_id long, blob binary")
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in dhash_hamming_pairs(image_dhash(df),
                                        max_dist=3).collect()}
    H = {i: _dhash_bands(decode_bmp(b)["pixels"], "bmp")
         for i, b in blobs}
    want = {}
    for i in range(12):
        for j in range(i + 1, 12):
            d = sum(bin(a ^ b).count("1") for a, b in zip(H[i], H[j]))
            if d <= 3:
                want[(i, j)] = d
    assert got == want


def test_dhash_poison_blob_skipped(spark):
    from ultraviolet_spark.operators.multimodal import image_dhash
    df = spark.createDataFrame([(1, b"not an image"), (2, None)],
                               "media_id long, blob binary")
    assert image_dhash(df).count() == 0


def test_dhash_max_dist_vs_bands_guard(spark):
    import numpy as np
    import pytest
    from ultraviolet_spark.operators.multimodal import (
        dhash_hamming_pairs, image_dhash, make_bmp)
    a = np.zeros((16, 18, 3), dtype=np.uint8)
    df = spark.createDataFrame([(1, make_bmp(a))],
                               "media_id long, blob binary")
    with pytest.raises(ValueError, match="max_dist"):
        dhash_hamming_pairs(image_dhash(df), max_dist=4).collect()


def test_audio_frame_features_reference(spark):
    import numpy as np
    from ultraviolet_spark.operators.multimodal import (
        audio_frame_features, make_wav)
    s = np.array([5, -3, -2, 7, 0, -1, 4, -4, 2, 2], dtype=np.int16)
    df = spark.createDataFrame([(1, make_wav(s, 8000))],
                               "media_id long, blob binary")
    got = {r["frame"]: (r["n"], r["energy"], r["zcr"])
           for r in audio_frame_features(df, frame=4).collect()}
    # frame 0: [5,-3,-2,7]  e=25+9+4+49=87   zcr: +- , --, -+  -> 2
    # frame 1: [0,-1,4,-4]  e=0+1+16+16=33   zcr: 0>=0,-1<0 ->1; -+ ->1; +- ->1  = 3
    # frame 2: [2,2]        e=8              zcr 0
    assert got == {0: (4, 87, 2), 1: (4, 33, 3), 2: (2, 8, 0)}


def test_audio_stereo_uses_channel0_and_poison_skipped(spark):
    import numpy as np
    from ultraviolet_spark.operators.multimodal import (
        audio_frame_features, make_wav)
    inter = np.array([1, 100, -1, 100, 2, 100, -2, 100],
                     dtype=np.int16)  # ch0 = [1,-1,2,-2]
    rows = [(1, make_wav(inter, 8000, channels=2)), (2, b"junk")]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    got = audio_frame_features(df, frame=4).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n"], r["energy"], r["zcr"]) == (4, 1 + 1 + 4 + 4, 3)


# ---------------------------------------------------- video frame stats

def test_video_frame_sample_byte_stats(spark):
    from ultraviolet_spark.operators.multimodal import (
        frame_byte_stats, frame_sample, synthesize_video)
    vids = synthesize_video(
        spark.createDataFrame([(3,), (10,)], "doc_id long"))
    got = {(r["media_id"], r["frame_no"]): (r["n_bytes"], r["byte_sum"])
           for r in frame_byte_stats(frame_sample(vids, every_n=3))
           .collect()}

    def want(i):
        nf = 10 + i % 7
        out = {}
        for fno in range(0, nf, 3):
            s = sum((i * 13 + (fno * 12 + k) * 7) % 256 for k in range(12))
            out[(i, fno)] = (12, s)
        return out

    assert got == {**want(3), **want(10)}


# ---------------------------------------------------- Luhn card PII

def test_luhn_known_vectors(spark):
    from ultraviolet_spark.operators.textstats import luhn_valid
    rows = [("4539578763621486",), ("4539578763621487",),
            ("4111111111111111",), ("1234567890123456",),
            ("378282246310005",)]   # amex 15-digit, valid
    df = spark.createDataFrame(rows, "pan string")
    got = [r[0] for r in df.select(luhn_valid("pan")).collect()]
    assert got == [True, False, True, False, True]


def test_card_numbers_extraction_and_boundaries(spark):
    from ultraviolet_spark.operators.textstats import card_numbers
    rows = [
        (1, "pay 4539-5787-6362-1486 now"),          # valid, dashed
        (2, "pay 4539 5787 6362 1487 now"),          # luhn-invalid
        (3, "id 99994539578763621486 long"),         # 20 digits, no valid sub
        (4, "amex 3782 822463 10005 ok"),            # valid 15-digit
        (5, "short 1234-5678 and 99.95 nothing"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted((r["doc_id"], r["pan"]) for r in card_numbers(df).collect())
    assert (1, "4539578763621486") in got
    assert (4, "378282246310005") in got
    assert all(d not in (2, 5) for d, _ in got)


# ---------------------------------------------------- stupid backoff LM

def test_sb_trigram_matches_python_reference(spark):
    import math
    from collections import Counter

    from ultraviolet_spark.operators.textstats import sb_trigram_scores
    texts = {1: "the cat sat on the mat",
             2: "the cat sat on the hat",
             3: "dogs bark loudly",          # unseen trigram paths
             4: "zz"}                        # <3 tokens -> 0
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    got = {r["doc_id"]: (r["n_trigrams"], r["sb_cross_entropy"])
           for r in sb_trigram_scores(df).collect()}

    def grams(ws, n):
        return [tuple(ws[i:i+n]) for i in range(len(ws)-n+1)]
    toks = {i: t.split() for i, t in texts.items()}
    c123 = Counter(g for ws in toks.values() for g in grams(ws, 3)
                   if len(ws) >= 3)
    c12 = Counter(g[:2] for ws in toks.values() for g in grams(ws, 3)
                  if len(ws) >= 3)
    c23 = Counter(g[1:] for ws in toks.values() for g in grams(ws, 3)
                  if len(ws) >= 3)
    c2 = Counter((g[1],) for ws in toks.values() for g in grams(ws, 3)
                 if len(ws) >= 3)
    c3 = Counter((w,) for ws in toks.values() for w in ws)
    N = sum(len(ws) for ws in toks.values())
    for i, ws in toks.items():
        tgs = grams(ws, 3) if len(ws) >= 3 else []
        if not tgs:
            assert got[i] == (0, 0.0)
            continue
        tot = 0
        for g in tgs:
            if c123[g]:
                ln = math.log(c123[g] / c12[g[:2]])
            elif c23[g[1:]]:
                ln = math.log(0.4 * (c23[g[1:]] / c2[(g[1],)]))
            else:
                ln = math.log(0.4 * 0.4 * (max(c3[(g[2],)], 1) / N))
            tot += round(ln * 1e6)
        want = round(-tot / (len(tgs) * 1e6), 6)
        assert got[i] == (len(tgs), want), (i, got[i], want)
    # self-scoring gives a once-seen trigram S=1 -> CE=0 (doc 3)
    assert got[3] == (1, 0.0)
    # separate model: eval text hits every backoff tier and scores
    # worse than in-model text
    model = spark.createDataFrame([(9, "the cat sat on the mat")],
                                  "doc_id long, text string")
    ev = spark.createDataFrame(
        [(1, "the cat sat"), (2, "purple cat flies")],
        "doc_id long, text string")
    s = {r["doc_id"]: r["sb_cross_entropy"]
         for r in sb_trigram_scores(ev, model_docs=model).collect()}
    assert s[1] == 0.0               # trigram seen in model
    assert s[2] > s[1]               # backoff tiers cost


def test_resize_images_box_means_and_roundtrip(spark):
    import numpy as np
    from ultraviolet_spark.operators.multimodal import (
        _box_means, decode_bmp, make_bmp, resize_images)
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, (16, 18, 3)).astype(np.uint8)
    df = spark.createDataFrame([(1, make_bmp(px)), (2, b"junk")],
                               "media_id long, blob binary")
    out = resize_images(df, out_w=9, out_h=8).collect()
    assert len(out) == 1                      # poison blob skipped
    r = out[0]
    assert (r["width"], r["height"]) == (9, 8)
    got = decode_bmp(bytes(r["blob"]))["pixels"]
    want = np.stack([_box_means(px[:, :, k], 9, 8) for k in range(3)],
                    axis=-1)
    assert np.array_equal(got, want.astype(np.uint8))


def test_luhn_property_vs_python(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ultraviolet_spark.operators.textstats import luhn_valid

    def py_luhn(s):
        if not 13 <= len(s) <= 19:
            return False
        tot = 0
        for i, ch in enumerate(reversed(s), start=1):
            d = int(ch)
            if i % 2 == 0:
                d *= 2
                if d > 9:
                    d -= 9
            tot += d
        return tot % 10 == 0

    @settings(max_examples=12, deadline=None)
    @given(st.lists(st.text(alphabet="0123456789", min_size=10,
                            max_size=22), min_size=1, max_size=8))
    def check(pans):
        df = spark.createDataFrame([(p,) for p in pans], "pan string")
        got = [bool(r[0]) for r in df.select(luhn_valid("pan")).collect()]
        assert got == [py_luhn(p) for p in pans]

    check()
