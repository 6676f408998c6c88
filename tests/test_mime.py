"""WHATWG-style magic sniff: every rule branch, priority order, and
the text-family tolerance in the mismatch flag."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark


def test_sniff_every_branch(spark):
    from pyspark.sql import functions as F

    from ultraviolet_spark.operators.mime import sniff_mime

    cases = {
        0: (b"\x89PNG\r\n\x1a\nxxxx", "image/png"),
        1: (b"GIF87a....", "image/gif"),
        2: (b"GIF89a....", "image/gif"),
        3: (b"\xff\xd8\xff\xe1 jfif", "image/jpeg"),
        4: (b"BMxxxx", "image/bmp"),
        5: (b"%PDF-1.7", "application/pdf"),
        6: (b"\x1f\x8b\x08rest", "application/gzip"),
        7: (b"PK\x03\x04zip", "application/zip"),
        8: (b"OggSvorbis", "application/ogg"),
        9: (b"RIFF\x10\x00\x00\x00WAVEfmt ", "audio/wav"),
        10: (b"RIFF\x10\x00\x00\x00WEBPVP8 ", "image/webp"),
        # RIFF with unknown subtype: falls through (NUL size bytes
        # -> binary)
        11: (b"RIFF\x10\x00\x00\x00AVI LIST", "application/octet-stream"),
        12: (b"  <!DOCTYPE HTML><html>", "text/html"),
        13: (b"\n<HtMl><body>", "text/html"),
        14: (b"<!-- comment page -->", "text/html"),
        # '<htmlx' is NOT an html tag boundary
        15: (b"<htmlx>", "text/plain"),
        16: (b"\xef\xbb\xbfbom text", "text/plain"),
        17: (b"just words, no magic", "text/plain"),
        18: (b"bin\x00ary", "application/octet-stream"),
        19: (b"", "application/octet-stream"),
    }
    df = spark.createDataFrame([(k, v[0]) for k, v in cases.items()],
                               "id int, b binary")
    got = {r["id"]: r["m"] for r in
           df.select("id", sniff_mime(F.col("b")).alias("m")).collect()}
    for k, (_, want) in cases.items():
        assert got[k] == want, f"case {k}: {got[k]} != {want}"


def test_mime_check_flags(spark):
    from ultraviolet_spark.operators.mime import with_mime_check

    rows = [
        (1, b"\x89PNG\r\n\x1a\nx", "image/png; foo=bar"),   # ok (params)
        (2, b"\x89PNG\r\n\x1a\nx", "text/html"),            # lie
        (3, b"var x = 1;", "application/javascript"),        # text sniff,
                                                             # non-text/* decl
        (4, b"body { color: red }", "text/css"),             # text family ok
        (5, b"<html><p>x", "text/plain"),                    # html as plain
    ]
    df = spark.createDataFrame(rows, "id int, html binary, content_type string")
    got = {r["id"]: (r["sniffed_mime"], r["mime_ok"]) for r in
           with_mime_check(df).collect()}
    assert got[1] == ("image/png", True)
    assert got[2] == ("image/png", False)
    assert got[3] == ("text/plain", False)
    assert got[4] == ("text/plain", True)
    assert got[5] == ("text/html", False)
