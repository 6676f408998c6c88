"""uvwarc Python DataSource connector: parity with the binaryFile scan,
partition planning, bounded-chunk streaming, filter pushdown (plan-side
and value-side), truncated-tail policy, and the upstream relation-reuse
caveat pinned."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo, GreaterThan, In, IsNotNull, StringStartsWith,
)

from ultraviolet_spark.sources.warc import build_warc, parse_warc, read_warc
from ultraviolet_spark.sources.warc_ds import (
    WarcReader, read_warc_ds,
)

BASE = datetime(2026, 1, 1)


def _mixed_records(shard: int, n: int = 40, step: int = 3):
    recs = []
    for i in range(shard, n, step):
        recs.append({"url": f"https://site{i % 5}.org/p/{i}",
                     "ts": BASE + timedelta(seconds=i),
                     "payload": (f"<html>{i}</html>" * (i + 1)).encode(),
                     "status": 200 if i % 3 else 404})
        if i % 10 == 0:
            recs.append({"url": f"https://site{i % 5}.org/p/{i}",
                         "ts": BASE + timedelta(seconds=i),
                         "payload": b'{"m":1}', "rec_type": "metadata",
                         "mime": "application/json"})
    return recs


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("uvwarc")
    for s in range(3):
        (d / f"part{s}.warc.gz").write_bytes(build_warc(_mixed_records(s)))
    return str(d)


def _rows(df):
    return sorted(
        (r.url, r.warc_ts, r.rec_type, r.http_status, r.content_type,
         bytes(r.html)) for r in df.collect())


def test_parity_with_binaryfile_scan(spark, warc_dir):
    a = _rows(read_warc(spark, warc_dir, rec_types=()))
    b = _rows(read_warc_ds(spark, warc_dir))
    assert a == b and len(a) == 44


def test_one_partition_per_file(warc_dir):
    r = WarcReader({"path": warc_dir})
    parts = r.partitions()
    assert [p.path.rsplit("/", 1)[1] for p in parts] == [
        "part0.warc.gz", "part1.warc.gz", "part2.warc.gz"]


def test_chunk_bytes_bounds_batches(warc_dir):
    """chunk_bytes=1 → one Arrow batch per record; any chunk size must
    concatenate to the same rows (bounded memory can't change data)."""
    part = WarcReader({"path": warc_dir}).partitions()[0]
    tiny = list(WarcReader({"path": warc_dir,
                            "chunk_bytes": "1"}).read(part))
    big = list(WarcReader({"path": warc_dir}).read(part))
    n_records = sum(b.num_rows for b in big)
    assert all(b.num_rows == 1 for b in tiny)
    assert len(tiny) == n_records > 1
    cat = pd.concat([b.to_pandas() for b in tiny], ignore_index=True)
    ref = pd.concat([b.to_pandas() for b in big], ignore_index=True)
    pd.testing.assert_frame_equal(cat, ref)


def test_push_filters_split(warc_dir):
    """Accepted: EqualTo/In on header scalars, StringStartsWith(url).
    Returned to Spark: ranges, IsNotNull, unknown columns."""
    r = WarcReader({"path": warc_dir})
    flts = [EqualTo(("rec_type",), "response"),
            In(("http_status",), (200, 404)),
            StringStartsWith(("url",), "https://site1"),
            GreaterThan(("http_status",), 200),
            IsNotNull(("rec_type",)),
            EqualTo(("html",), b"x")]
    rest = list(r.pushFilters(flts))
    assert rest == flts[3:]
    assert r._accepted == flts[:3]


def test_pushdown_values_and_plan(spark, warc_dir):
    flt = (read_warc_ds(spark, warc_dir)
           .filter((F.col("rec_type") == "response")
                   & (F.col("http_status") == 200)))
    plan = flt._jdf.queryExecution().executedPlan().toString()
    # equality predicates were pushed: the residual JVM Filter keeps only
    # the null guards Spark adds around a pushed EqualTo
    assert "BatchScan uvwarc" in plan
    assert "= 200" not in plan and "response" not in plan
    got = _rows(flt)
    exp = [t for t in _rows(read_warc_ds(spark, warc_dir))
           if t[2] == "response" and t[3] == 200]
    assert got == exp and 0 < len(got) < 44


def test_null_never_matches_pushed_equality(spark, warc_dir):
    """metadata records carry NULL http_status; EqualTo(404) pushed into
    the source must exclude them (SQL comparison semantics)."""
    got = _rows(read_warc_ds(spark, warc_dir)
                .filter(F.col("http_status") == 404))
    assert got and all(t[3] == 404 for t in got)


def test_truncated_tail_member_dropped(tmp_path):
    recs = _mixed_records(0, n=12, step=1)
    data = build_warc(recs)
    whole = tmp_path / "a.warc.gz"
    whole.write_bytes(data)
    cut = tmp_path / "cut" / "a.warc.gz"
    cut.parent.mkdir()
    cut.write_bytes(data[:-10])
    r_full = WarcReader({"path": str(whole)})
    full = list(r_full.read(r_full.partitions()[0]))
    r_cut = WarcReader({"path": str(cut)})
    got = list(r_cut.read(r_cut.partitions()[0]))
    n_full = sum(b.num_rows for b in full)
    n_cut = sum(b.num_rows for b in got)
    assert n_cut == n_full - 1 == len(parse_warc(data[:-10]))


def test_uncompressed_warc_fallback(spark, tmp_path):
    recs = _mixed_records(1, n=20, step=2)
    d = tmp_path / "u"
    d.mkdir()
    (d / "u.warc").write_bytes(build_warc(recs, compress=False))
    a = _rows(read_warc_ds(spark, str(d)))
    b = sorted(
        (r["url"], r["warc_ts"].to_pydatetime(), r["rec_type"],
         None if r["http_status"] is pd.NA else int(r["http_status"]),
         r["content_type"], r["html"])
        for _, r in parse_warc(build_warc(recs, compress=False)).iterrows())
    assert a == b and len(a) > 5


def test_relation_reuse_last_plan_wins_pinned(spark, warc_dir):
    """Upstream Spark 4.1 Python-DS behavior, pinned so a change is
    noticed: a reused relation replays the LAST plan's pushed filters;
    a fresh .load() is isolated.  This is why read_warc_ds returns a
    fresh load and queries never branch two plans off one scan."""
    df = read_warc_ds(spark, warc_dir)
    assert df.count() == 44
    assert df.filter(F.col("http_status") == 200).count() == 26
    assert df.count() in (26, 44)      # same relation: 26 today (caveat)
    assert read_warc_ds(spark, warc_dir).count() == 44   # fresh: isolated


def test_option_and_path_errors(tmp_path):
    with pytest.raises(ValueError, match="load"):
        WarcReader({})
    with pytest.raises(ValueError, match="chunk_bytes"):
        WarcReader({"path": "/x", "chunk_bytes": "0"})
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        WarcReader({"path": str(empty)}).partitions()


# ---------------------------------------------------------------- streaming

def _run_available_now(df, out, ckpt):
    q = (df.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_stream_backfill_then_tail_exactly_once(spark, tmp_path):
    """Existing files land in the first run; files added afterwards —
    named above the high-water mark — land exactly once on a restart
    from the same checkpoint (parquet sink: the memory sink can't
    recover a checkpoint)."""
    from ultraviolet_spark.sources.warc_ds import read_warc_stream

    d = tmp_path / "tail"
    d.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    for s in range(2):
        (d / f"crawl-{s:04d}.warc.gz").write_bytes(
            build_warc(_mixed_records(s, n=20, step=2)))

    _run_available_now(read_warc_stream(spark, str(d)), out, ckpt)
    first = spark.read.parquet(out).count()
    assert first == len(_rows(read_warc_ds(spark, str(d))))

    for s in (2, 3):
        (d / f"crawl-{s:04d}.warc.gz").write_bytes(
            build_warc(_mixed_records(s % 2, n=8, step=2)))
    _run_available_now(read_warc_stream(spark, str(d)), out, ckpt)
    # same checkpoint + sink: every record exactly once, incl. the new
    # files; re-running with nothing new adds nothing
    total = len(_rows(read_warc_ds(spark, str(d))))
    assert spark.read.parquet(out).count() == total > first
    _run_available_now(read_warc_stream(spark, str(d)), out, ckpt)
    assert spark.read.parquet(out).count() == total


def test_stream_offsets_unit(tmp_path):
    from ultraviolet_spark.sources.warc_ds import WarcStreamReader

    d = tmp_path / "s"
    d.mkdir()
    r = WarcStreamReader({"path": str(d)})
    assert r.latestOffset() == {"last": "", "n_seen": 0}
    for s in range(3):
        (d / f"crawl-{s:04d}.warc.gz").write_bytes(
            build_warc(_mixed_records(0, n=4, step=2)))
    end = r.latestOffset()
    assert end == {"last": "crawl-0002.warc.gz", "n_seen": 3}
    parts = r.partitions({"last": "", "n_seen": 0}, end)
    assert [p.path.rsplit("/", 1)[1] for p in parts] == [
        "crawl-0000.warc.gz", "crawl-0001.warc.gz", "crawl-0002.warc.gz"]
    mid = {"last": "crawl-0000.warc.gz", "n_seen": 1}
    parts = r.partitions(mid, end)
    assert [p.path.rsplit("/", 1)[1] for p in parts] == [
        "crawl-0001.warc.gz", "crawl-0002.warc.gz"]
    # record content of one streamed partition == batch reader output
    # (_mixed_records(0, n=4, step=2): responses at i=0,2 + the i=0
    # metadata sidecar = 3 records)
    batches = list(r.read(parts[0]))
    assert sum(b.num_rows for b in batches) == 3


def test_stream_detects_non_monotone_and_deletion(tmp_path):
    from ultraviolet_spark.sources.warc_ds import WarcStreamReader

    d = tmp_path / "s2"
    d.mkdir()
    (d / "crawl-0005.warc.gz").write_bytes(
        build_warc(_mixed_records(0, n=4, step=2)))
    r = WarcStreamReader({"path": str(d)})
    end = r.latestOffset()
    start = {"last": "crawl-0005.warc.gz", "n_seen": 1}
    # a shard arrives named BELOW the consumed high-water mark
    (d / "crawl-0001.warc.gz").write_bytes(
        build_warc(_mixed_records(1, n=4, step=2)))
    with pytest.raises(ValueError, match="monotone|deleted"):
        r.partitions(start, r.latestOffset())
    # ... and a consumed file vanishing is equally loud
    (d / "crawl-0001.warc.gz").unlink()
    (d / "crawl-0005.warc.gz").unlink()
    with pytest.raises(ValueError, match="monotone|deleted"):
        r.partitions(start, end)


def test_stream_requires_directory(tmp_path):
    from ultraviolet_spark.sources.warc_ds import WarcStreamReader

    with pytest.raises(ValueError, match="directory"):
        WarcStreamReader({"path": str(tmp_path / "nope.warc.gz")})
