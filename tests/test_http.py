"""HTTP response parsing: hand-built messages incl. binary bodies,
truncated captures, case-insensitive headers, quoted charset."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark


def _parse(spark, payloads, **kw):
    from ultraviolet_spark.operators.http import split_http_response
    df = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)],
                               "id long, payload binary")
    return {r["id"]: r.asDict()
            for r in split_http_response(df, **kw).collect()}


def test_http_basic_fields_and_body_bytes(spark):
    body = b"\x00\xffbinary\x80body"
    msg = (b"HTTP/1.1 200 OK\r\n"
           b"Content-Type: text/HTML; charset=\"UTF-8\"\r\n"
           b"CONTENT-LENGTH: 14\r\n"
           b"Server: x\r\n\r\n" + body)
    got = _parse(spark, [msg])[0]
    assert got["status"] == 200
    assert got["http_version"] == "1.1"
    assert got["content_type"] == "text/html"
    assert got["charset_label"] == "utf-8"
    assert got["content_length"] == 14
    assert bytes(got["body"]) == body          # byte-exact, incl. \x00


def test_http_truncated_and_junk_yield_nulls(spark):
    got = _parse(spark, [b"HTTP/1.1 200 OK\r\nContent-Type: text/html",
                         b"not http at all\r\n\r\nbody"])
    assert got[0]["status"] is None and got[0]["body"] is None
    assert got[1]["status"] is None            # no status line
    assert bytes(got[1]["body"]) == b"body"    # but body still splits


def test_http_missing_headers_are_null(spark):
    got = _parse(spark, [b"HTTP/1.0 404 Not Found\r\nX: y\r\n\r\nhtml"])[0]
    assert got["status"] == 404
    assert got["http_version"] == "1.0"
    assert got["content_type"] is None
    assert got["charset_label"] is None
    assert got["content_length"] is None
    assert bytes(got["body"]) == b"html"


def test_http_header_name_prefix_not_confused(spark):
    # X-Content-Type must not satisfy Content-Type
    got = _parse(spark, [b"HTTP/1.1 200 OK\r\n"
                         b"X-Content-Type: application/json\r\n\r\nz"])[0]
    assert got["content_type"] is None


def test_http_crlf_in_body_not_resplit(spark):
    body = b"a\r\n\r\nb"
    got = _parse(spark, [b"HTTP/1.1 200 OK\r\n\r\n" + body])[0]
    assert bytes(got["body"]) == body
