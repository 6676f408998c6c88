"""uvwarc sink (df.write.format("uvwarc")): roundtrip fidelity, shard
byte-determinism under any upstream partitioning, two-phase commit
hygiene (no temp leftovers, overwrite removes stale parts AFTER
success, append collision refuses loudly), schema policing, and
byte-interchangeability with the build_warc test-shard builder."""

from __future__ import annotations

import glob
import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ultraviolet_spark.sources.warc import build_warc
from ultraviolet_spark.sources.warc_ds import read_warc_ds, write_warc_ds

_SCHEMA = ("url string, warc_ts timestamp, html binary, "
           "http_status int, rec_type string, content_type string")


def _rows(n=200):
    return [(f"https://s{i % 5}.example.org/p/{i}",
             datetime(2026, 2, 1, i % 24, i % 60, (i * 7) % 60),
             f"<html><body>doc {i}</body></html>".encode(),
             200 if i % 3 else 404,
             "metadata" if i % 17 == 0 else "response",
             "application/json" if i % 17 == 0 else "text/html")
            for i in range(n)]


def _df(spark, n=200):
    return spark.createDataFrame(_rows(n), _SCHEMA)


def _parts(d):
    return sorted(glob.glob(os.path.join(d, "part-*.warc.gz")))


def test_roundtrip_all_columns(spark, tmp_path):
    d = str(tmp_path / "w")
    write_warc_ds(_df(spark), d, num_shards=4)
    assert 1 <= len(_parts(d)) <= 4
    assert not glob.glob(os.path.join(d, "_tmp*")), "temp files leaked"
    back = (read_warc_ds(spark, d)
            .select("url", "warc_ts", "html", "http_status",
                    "rec_type", "content_type")
            .collect())
    got = sorted((r["url"], r["warc_ts"], bytes(r["html"]),
                  r["http_status"], r["rec_type"], r["content_type"])
                 for r in back)
    want = sorted(_rows())
    # non-response records carry no HTTP status by WARC semantics
    want = [(u, ts, h, None if rt != "response" else st, rt, mi)
            for u, ts, h, st, rt, mi in want]
    assert got == want


def test_shard_bytes_independent_of_input_partitioning(spark, tmp_path):
    d1, d7 = str(tmp_path / "p1"), str(tmp_path / "p7")
    write_warc_ds(_df(spark).repartition(1), d1, num_shards=3)
    write_warc_ds(_df(spark).repartition(7), d7, num_shards=3)
    p1, p7 = _parts(d1), _parts(d7)
    assert [os.path.basename(p) for p in p1] == \
        [os.path.basename(p) for p in p7]
    for a, b in zip(p1, p7):
        assert open(a, "rb").read() == open(b, "rb").read(), \
            f"shard bytes differ: {os.path.basename(a)}"


def test_overwrite_removes_stale_parts_append_refuses(spark, tmp_path):
    d = str(tmp_path / "w")
    write_warc_ds(_df(spark), d, num_shards=6)
    n6 = len(_parts(d))
    write_warc_ds(_df(spark, 50), d, num_shards=2)     # overwrite default
    n2 = len(_parts(d))
    assert n2 < n6                                      # stale parts gone
    assert read_warc_ds(spark, d).count() == 50
    with pytest.raises(Exception, match="already exist"):
        write_warc_ds(_df(spark, 50), d, num_shards=2, mode="append")
    assert not glob.glob(os.path.join(d, "_tmp*"))
    assert read_warc_ds(spark, d).count() == 50         # data intact


def test_null_required_column_refused(spark, tmp_path):
    df = spark.createDataFrame(
        [("https://a.org/1", None, b"<html/>", 200, "response",
          "text/html")], _SCHEMA)
    with pytest.raises(Exception, match="non-NULL"):
        write_warc_ds(df, str(tmp_path / "w"))


def test_unknown_column_refused_at_planning(spark, tmp_path):
    df = _df(spark).withColumn("extra", F.lit(1))
    with pytest.raises(Exception, match="unsupported column"):
        df.sparkSession  # noqa: B018 — force nothing; write below raises
        write_warc_ds(df, str(tmp_path / "w"))


def test_missing_required_column_refused(spark, tmp_path):
    df = _df(spark).drop("html")
    with pytest.raises(Exception, match="requires column"):
        write_warc_ds(df, str(tmp_path / "w"))


def _warc_src(tmp_path, n_files=2, per=30):
    from ultraviolet_spark.sources.warc import build_warc

    src = tmp_path / "src"
    src.mkdir(exist_ok=True)
    for s in range(n_files):
        recs = [{"url": f"https://x.org/{s}/{i}",
                 "ts": datetime(2026, 3, 1, s, i % 60),
                 "payload": f"<p>{s}-{i}</p>".encode()}
                for i in range(per)]
        (src / f"crawl-2026030{s}-000.warc.gz").write_bytes(
            build_warc(recs))
    return str(src)


def test_stream_sink_roundtrip_and_batch_monotone_names(spark, tmp_path):
    from ultraviolet_spark.sources.warc_ds import read_warc_stream

    src = _warc_src(tmp_path)
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    stream = read_warc_stream(spark, src).select(
        "url", "warc_ts", "html", "http_status")
    q = (stream.writeStream.format("uvwarc").option("path", out)
         .option("checkpointLocation", cp)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    parts = _parts(out)
    assert parts and not glob.glob(os.path.join(out, "_tmp*"))
    # part-{batchId:08d}-{pid:05d}: monotone names — the output dir
    # itself satisfies the stream READER's contract (tail own exports).
    names = [os.path.basename(p) for p in parts]
    assert all(n.split("-")[1].isdigit() for n in names)
    assert names == sorted(names)
    back = read_warc_ds(spark, out)
    got = sorted((r["url"], bytes(r["html"])) for r in back.collect())
    want = sorted((r["url"], bytes(r["html"]))
                  for r in read_warc_ds(spark, src).collect())
    assert got == want
    # A second availableNow run with NEW input appends a later batch
    # without touching batch-0 bytes.
    before = {p: open(p, "rb").read() for p in parts}
    from ultraviolet_spark.sources.warc import build_warc
    (tmp_path / "src" / "crawl-20260309-000.warc.gz").write_bytes(
        build_warc([{"url": "https://x.org/new/1",
                     "ts": datetime(2026, 3, 9),
                     "payload": b"<p>new</p>"}]))
    q2 = (read_warc_stream(spark, src)
          .select("url", "warc_ts", "html", "http_status")
          .writeStream.format("uvwarc").option("path", out)
          .option("checkpointLocation", cp)
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    assert read_warc_ds(spark, out).count() == 61
    for p, b in before.items():
        assert open(p, "rb").read() == b, "replay touched an old batch"


def test_writer_bytes_interchangeable_with_build_warc(spark, tmp_path):
    d = str(tmp_path / "w")
    rows = sorted(_rows(40))     # writer sorts shard on the same order
    write_warc_ds(spark.createDataFrame(rows, _SCHEMA), d, num_shards=1)
    [part] = _parts(d)
    want = build_warc([{
        "url": u, "ts": ts, "payload": h, "status": st,
        "rec_type": rt, "mime": mi} for u, ts, h, st, rt, mi in rows])
    assert open(part, "rb").read() == want
