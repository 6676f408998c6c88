"""HTML5 encoding sniff + legacy-charset decode vs CPython's codecs.

The ground truth for every decode here is CPython's own decoder for the
same charset (an independent implementation of the WHATWG-compatible
tables), and the sniffing rules are asserted case-by-case against the
HTML5 precedence: BOM > meta prescan > windows-1252 default.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ultraviolet_spark.kernels import sbcs
from ultraviolet_spark.operators.charset import (
    DEFAULT_CHARSET,
    LABELS,
    decode_html,
    with_charset,
)


def _sniff(spark, blobs: list[bytes]):
    df = spark.createDataFrame(
        [Row(i=i, html=b) for i, b in enumerate(blobs)])
    out = decode_html(df).orderBy("i").collect()
    return [(r["charset"], r["charset_source"], r["text_raw"]) for r in out]


CASES = [
    # (raw bytes, expected charset, source, decoded text)
    (b"\xef\xbb\xbf<p>hi</p>", "utf-8", "bom", "<p>hi</p>"),
    (b"\xff\xfe" + "<p>é</p>".encode("utf-16le"), "utf-16le", "bom",
     "<p>é</p>"),
    (b"\xfe\xff" + "<p>é</p>".encode("utf-16be"), "utf-16be", "bom",
     "<p>é</p>"),
    # BOM beats a contradicting meta tag
    (b"\xef\xbb\xbf<meta charset=windows-1251><p>x</p>", "utf-8", "bom",
     "<meta charset=windows-1251><p>x</p>"),
    # meta, quoted / unquoted / http-equiv / uppercase label
    (b'<meta charset="utf-8"><p>caf\xc3\xa9</p>', "utf-8", "meta",
     '<meta charset="utf-8"><p>café</p>'),
    (b"<META CHARSET=LATIN1><p>\x80</p>", "windows-1252", "meta",
     "<META CHARSET=LATIN1><p>€</p>"),
    (b'<meta http-equiv="Content-Type" content="text/html; '
     b'charset=windows-1251"><p>\xc4\xe0</p>', "windows-1251", "meta",
     '<meta http-equiv="Content-Type" content="text/html; '
     'charset=windows-1251"><p>Да</p>'),
    # HTML5 rewrite rules: meta utf-16 label means utf-8;
    # x-user-defined means windows-1252
    (b"<meta charset=utf-16><p>ok</p>", "utf-8", "meta",
     "<meta charset=utf-16><p>ok</p>"),
    (b"<meta charset=x-user-defined><p>\x93q\x94</p>", "windows-1252",
     "meta", "<meta charset=x-user-defined><p>“q”</p>"),
    # unknown label falls through to the default, like no declaration
    (b"<meta charset=klingon><p>\x93</p>", "windows-1252", "default",
     "<meta charset=klingon><p>“</p>"),
    (b"<p>plain \xe9</p>", "windows-1252", "default",
     "<p>plain é</p>"),
    # iso-8859-2 is its own LUT (0xB1 = U+0105, not U+00B1)
    (b"<meta charset=iso-8859-2><p>\xb1</p>", "iso-8859-2", "meta",
     "<meta charset=iso-8859-2><p>ą</p>"),
]


def test_sniff_and_decode_cases(spark):
    got = _sniff(spark, [c[0] for c in CASES])
    for (raw, cs, src, text), (gcs, gsrc, gtext) in zip(CASES, got):
        assert gcs == cs, raw
        assert gsrc == src, raw
        assert gtext == text, raw


def test_meta_beyond_prescan_window_is_ignored(spark):
    blob = b"<p>" + b"x" * 1024 + b'</p><meta charset="utf-8">'
    [(cs, src, _)] = _sniff(spark, [blob])
    assert (cs, src) == (DEFAULT_CHARSET, "default")


def test_sniff_is_pure_catalyst(spark):
    df = spark.createDataFrame([Row(html=b"<p>x</p>")])
    plan = with_charset(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_sbcs_luts_match_cpython_whatwg_policy(spark):
    every = np.arange(256, dtype=np.uint8)
    off = np.array([0, 256], dtype=np.int64)
    for charset, codec in [("windows-1252", "cp1252"),
                           ("windows-1251", "cp1251"),
                           ("iso-8859-2", "iso8859-2")]:
        cp, cpo = sbcs.sbcs_to_codepoints(every, off, charset)
        assert list(cpo) == [0, 256]
        for b in range(256):
            try:
                want = ord(bytes([b]).decode(codec))
            except UnicodeDecodeError:
                want = b  # WHATWG: undefined byte -> same-valued C1
            assert cp[b] == want, (charset, b)


def test_mixed_batch_row_order_preserved(spark):
    # interleave all decode paths in one batch so the group-scatter
    # reassembly is exercised (the bug this guards: rows swapping text)
    blobs = [CASES[i % len(CASES)][0] for i in range(64)]
    got = _sniff(spark, blobs)
    for i, (gcs, gsrc, gtext) in enumerate(got):
        _, cs, src, text = CASES[i % len(CASES)]
        assert (gcs, gsrc, gtext) == (cs, src, text)


def _repair(spark, texts: list):
    from ultraviolet_spark.operators.charset import repair_mojibake
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [Row(i=i, text=t) for i, t in enumerate(texts)],
        schema=T.StructType([T.StructField("i", T.IntegerType()),
                             T.StructField("text", T.StringType())]))
    out = repair_mojibake(df).orderBy("i").collect()
    return [(r["text_fixed"], r["was_mojibake"]) for r in out]


def test_mojibake_repair_vs_cpython_roundtrip(spark):
    # positives: CPython builds the mojibake form, the operator undoes it
    originals = ["café", "“smart quotes”…", "да или нет", "naïve — résumé",
                 "€99.99", "日本"]
    # WHATWG-policy cp1252 decode (CPython raises on 0x81/0x8D/0x8F/
    # 0x90/0x9D; the browsers — and our LUT — map them to C1 controls)
    lut = sbcs.LUTS["windows-1252"]
    broken = ["".join(chr(lut[b]) for b in s.encode("utf-8"))
              for s in originals]
    got = _repair(spark, broken)
    for orig, (fixed, flag) in zip(originals, got):
        assert flag is True
        assert fixed == orig


def test_mojibake_negatives_untouched(spark):
    # genuine text must survive: reverse bytes are not valid UTF-8,
    # or there is nothing non-ASCII to repair
    texts = ["café", "plain ascii", "", "é", "Ω not in cp1252 image",
             "ascii with € alone"]
    got = _repair(spark, texts)
    for t, (fixed, flag) in zip(texts, got):
        assert flag is False, t
        assert fixed == t


def test_mojibake_null_row(spark):
    got = _repair(spark, ["cafÃ©", None, "x"])
    assert got[0] == ("café", True)
    assert got[1] == (None, None)
    assert got[2] == ("x", False)


def test_mojibake_single_pass_idempotent_on_fixed_text(spark):
    # repairing already-repaired text is a no-op for these cases
    once = [f for f, _ in _repair(spark, ["cafÃ©", "â€œqâ€"])]
    twice = _repair(spark, once)
    for f, (f2, flag2) in zip(once, twice):
        assert f2 == f and flag2 is False


def test_codepoints_to_sbcs_kernel_masks_unmappable():
    cp = np.array([ord("a"), 0x20AC, 0x4E00], dtype=np.uint32)
    off = np.array([0, 2, 3], dtype=np.int64)
    b, ok = sbcs.codepoints_to_sbcs(cp, off, "windows-1252")
    assert list(ok) == [True, False]
    assert b[0] == ord("a") and b[1] == 0x80


def test_label_table_values_are_decodable():
    ok = {"utf-8", "windows-1252", "windows-1251", "iso-8859-2"}
    assert set(LABELS.values()) <= ok
    assert set(sbcs.LUTS) == ok - {"utf-8"}
