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


# ---------------------------------------------------------------------------
# chunked transfer-coding decode
# ---------------------------------------------------------------------------

def _dechunk(spark, bodies, **kw):
    from ultraviolet_spark.operators.http import dechunk
    df = spark.createDataFrame([(i, b) for i, b in enumerate(bodies)],
                               "id long, body binary")
    return {r["id"]: r.asDict() for r in dechunk(df, **kw).collect()}


def test_dechunk_basic_and_crlf_in_data(spark):
    got = _dechunk(spark, [
        b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n",
        # chunk data contains CRLF; extension + trailer present
        b"4;ext=1\r\na\r\nb\r\n3\r\nxyz\r\n0\r\nX-Trailer: v\r\n\r\n",
        b"0\r\n\r\n",
    ])
    assert got[0]["body_text"] == "hello world"
    assert got[0]["n_chunks"] == 2 and got[0]["chunked_ok"]
    assert got[1]["body_text"] == "a\r\nbxyz"      # NOT split on CRLF
    assert got[1]["n_chunks"] == 2 and got[1]["chunked_ok"]
    assert got[2]["body_text"] == "" and got[2]["n_chunks"] == 0


def test_dechunk_malformed_flags_not_failures(spark):
    got = _dechunk(spark, [
        b"5\r\nhello\r\n",            # truncated: no last-chunk
        b"zz\r\nhello\r\n0\r\n\r\n",  # non-hex size line
        b"ff\r\nshort\r\n0\r\n\r\n",  # size claim larger than data
        b"5\r\nhelloXX6\r\n world\r\n0\r\n\r\n",  # missing data CRLF
        b"fffffffff\r\nx\r\n0\r\n\r\n",  # >7 hex digits: hostile claim
    ])
    for i in range(5):
        assert got[i]["body_text"] is None, i
        assert got[i]["chunked_ok"] is False, i


def test_dechunk_max_chunks_bound(spark):
    payload = b"".join(b"1\r\nx\r\n" for _ in range(10)) + b"0\r\n\r\n"
    ok = _dechunk(spark, [payload], max_chunks=16)[0]
    assert ok["body_text"] == "x" * 10 and ok["n_chunks"] == 10
    # more chunks than the bound: flagged, never mis-decoded
    bad = _dechunk(spark, [payload], max_chunks=5)[0]
    assert bad["body_text"] is None and bad["chunked_ok"] is False


def test_dechunk_latin1_binary_roundtrip(spark):
    body = bytes(range(256)).replace(b"\r", b".")  # keep sizes honest
    payload = (hex(len(body))[2:].encode() + b"\r\n" + body
               + b"\r\n0\r\n\r\n")
    got = _dechunk(spark, [payload])[0]
    assert got["chunked_ok"]
    assert got["body_text"].encode("ISO-8859-1") == body


# ---------------------------------------------------------------------------
# HTTP-date parsing + heuristic freshness
# ---------------------------------------------------------------------------

def _dates(spark, vals):
    from ultraviolet_spark.operators.http import parse_http_date
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id long, v string")
    return {r["id"]: r["ts"]
            for r in df.select("id",
                               parse_http_date("v").alias("ts")).collect()}


def test_http_date_three_formats_agree(spark):
    import datetime as dt
    got = _dates(spark, [
        "Sun, 06 Nov 1994 08:49:37 GMT",
        "Sunday, 06-Nov-94 08:49:37 GMT",
        "Sun Nov  6 08:49:37 1994",
        "Wed Nov 16 08:49:37 1994",          # two-digit asctime day
    ])
    want = dt.datetime(1994, 11, 6, 8, 49, 37)
    assert got[0] == got[1] == got[2] == want
    assert got[3] == dt.datetime(1994, 11, 16, 8, 49, 37)


def test_http_date_two_digit_year_pivot(spark):
    got = _dates(spark, [
        "Friday, 31-Dec-69 23:59:59 GMT",    # 69 -> 2069
        "Thursday, 01-Jan-70 00:00:00 GMT",  # 70 -> 1970
    ])
    assert got[0].year == 2069
    assert got[1].year == 1970


def test_http_date_rejects_junk(spark):
    got = _dates(spark, [
        "garbage", "", "Sun, 06 Nov 1994 08:49:37 PST",
        "Sun, 6 Nov 1994 08:49:37 GMT",      # IMF day must be 2-digit
        "Sun, 32 Nov 1994 08:49:37 GMT",     # try_to_timestamp: no throw
    ])
    assert all(v is None for v in got.values())


def test_heuristic_freshness_exact_and_skew_null(spark):
    import datetime as dt
    from ultraviolet_spark.operators.http import heuristic_freshness
    base = dt.datetime(2026, 1, 1)
    rows = [
        (0, base, base - dt.timedelta(days=10)),   # 10% of 10d = 86400s
        (1, base, base + dt.timedelta(seconds=5)), # clock skew -> NULL
        (2, base, None),
        (3, base, base),
    ]
    df = spark.createDataFrame(
        rows, "id long, date timestamp, last_modified timestamp")
    got = {r["id"]: r["freshness_secs"]
           for r in heuristic_freshness(df).collect()}
    assert got[0] == 86400
    assert got[1] is None and got[2] is None
    assert got[3] == 0
