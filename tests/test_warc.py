"""WARC source: writer↔reader round-trip, multi-member gzip, HTTP head
peeling, byte-identity of payloads, truncation tolerance, Spark scan."""

from __future__ import annotations

from datetime import datetime

import pytest

from ultraviolet_spark.sources.warc import (
    build_record, build_warc, parse_warc, read_warc)

TS = datetime(2026, 3, 1, 12, 30, 0)

# payloads chosen to break naive parsers: record separator bytes inside
# the body, a fake WARC header inside the body, non-ASCII utf-8 bytes
TRICKY = [
    {"url": "https://a.example/x", "ts": TS,
     "payload": "café 中文".encode("utf-8")},
    {"url": "https://b.example/y", "ts": datetime(2026, 3, 2, 0, 0, 1),
     "payload": b"pre\r\n\r\nWARC/1.0\r\npost", "status": 404},
    {"url": "https://c.example/z", "ts": TS, "rec_type": "resource",
     "payload": bytes(range(256)), "mime": "application/octet-stream"},
]


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip_byte_identical(compress):
    data = build_warc(TRICKY, compress=compress)
    df = parse_warc(data)
    assert len(df) == 3
    assert list(df["url"]) == [r["url"] for r in TRICKY]
    for got, want in zip(df["html"], TRICKY):
        assert got == want["payload"]          # byte-identical
    assert list(df["rec_type"]) == ["response", "response", "resource"]
    assert list(df["http_status"].astype(object))[:2] == [200, 404]
    assert df["http_status"].isna().iloc[2]    # resource: no HTTP head
    assert df["warc_ts"].iloc[0] == TS
    assert df["content_type"].iloc[0] == "text/html"
    assert df["content_type"].iloc[2] == "application/octet-stream"


def test_compressed_equals_uncompressed():
    a = parse_warc(build_warc(TRICKY, compress=True))
    b = parse_warc(build_warc(TRICKY, compress=False))
    assert a.drop(columns=["html"]).equals(b.drop(columns=["html"]))
    assert list(a["html"]) == list(b["html"])


def test_truncated_tail_member_dropped():
    data = build_warc(TRICKY, compress=True)
    cut = data[:len(data) - 40]                # wreck the final member
    df = parse_warc(cut)
    assert len(df) == 2                        # good prefix survives
    assert list(df["url"]) == [r["url"] for r in TRICKY[:2]]


def test_garbage_and_empty():
    assert len(parse_warc(b"")) == 0
    assert len(parse_warc(b"not a warc at all")) == 0


def test_uncompressed_stream_content_length_walk():
    # single stream, payload contains a fake record marker: only a
    # Content-Length walk parses this correctly
    data = build_record("https://b.example/y", TS,
                        b"x\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n")
    df = parse_warc(data + data)
    assert len(df) == 2
    assert (df["url"] == "https://b.example/y").all()


def test_read_warc_spark(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "part0.warc.gz").write_bytes(build_warc(TRICKY[:2]))
    (d / "part1.warc.gz").write_bytes(build_warc(TRICKY[2:]))
    df = read_warc(spark, str(d), rec_types=("response", "resource"))
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 3
    for want in TRICKY:
        got = rows[want["url"]]
        assert bytes(got["html"]) == want["payload"]
        assert got["warc_ts"] == want["ts"]
    # default filter keeps responses only
    assert read_warc(spark, str(d)).count() == 2


# ----------------------------------------------------------------- WET

def test_wet_roundtrip_and_manifest(spark, tmp_path):
    import datetime as dt

    from ultraviolet_spark.sources.warc import read_wet, write_wet

    rows = [(f"https://ex.com/{i}",
             dt.datetime(2026, 2, 1) + dt.timedelta(seconds=i),
             f"text {i} — naïve 中文")        # non-ascii on purpose
            for i in range(20)]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, "
                                     "text string")
    out = str(tmp_path / "wet")
    manifest = write_wet(df, out, n_shards=3)
    assert sum(m["n_records"] for m in manifest) == 20
    assert sorted(m["shard"] for m in manifest) == sorted(
        {m["shard"] for m in manifest})        # one row per shard

    back = read_wet(spark, out)
    got = {(r["url"], r["warc_ts"], r["text"]) for r in back.collect()}
    assert got == set(rows)                    # text byte-exact incl zh


def test_wet_deterministic_bytes(spark, tmp_path):
    import datetime as dt
    import hashlib
    import os

    from ultraviolet_spark.sources.warc import write_wet

    rows = [(f"https://d.com/{i}", dt.datetime(2026, 1, 1), f"t{i}")
            for i in range(10)]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, "
                                     "text string")

    def digest(p):
        h = hashlib.md5()
        for fn in sorted(os.listdir(p)):
            h.update(fn.encode())
            h.update(open(os.path.join(p, fn), "rb").read())
        return h.hexdigest()

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_wet(df, a, n_shards=2)
    write_wet(df.repartition(5), b, n_shards=2)   # any input partitioning
    assert digest(a) == digest(b)


# ----------------------------------------------------------------- WAT

def test_wat_roundtrip(spark, tmp_path):
    import datetime as dt

    from ultraviolet_spark.sources.warc import read_wat, write_wat

    rows = [
        (f"https://ex.com/{i}", dt.datetime(2026, 3, 1),
         f'<html><head><title>T{i} &amp; more</title></head>'
         f'<a href="https://a.com/{i}">x</a>'
         f'<a href="/rel">y</a><a href="http://b.net/">z</a></html>')
        for i in range(8)
    ] + [("https://ex.com/notitle", dt.datetime(2026, 3, 1),
          "<html><p>no links, no title</p></html>")]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, "
                                     "html string")
    out = str(tmp_path / "wat")
    manifest = write_wat(df, out, n_shards=2)
    assert sum(m["n_records"] for m in manifest) == 9

    got = {r["url"]: r for r in read_wat(spark, out).collect()}
    r0 = got["https://ex.com/3"]
    assert r0["outlinks"] == ["https://a.com/3", "http://b.net/"]
    assert r0["title"] == "T3 &amp; more"       # raw title, not decoded
    assert r0["html_bytes"] == len(rows[3][2].encode("utf-8"))
    nt = got["https://ex.com/notitle"]
    assert nt["outlinks"] == [] and nt["title"] is None
