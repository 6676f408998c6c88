"""Streaming surface: native session windows agree with the batch
sessionizer; the streaming wiring runs end-to-end on a memory sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ultraviolet_spark.operators.windows import sessionize
from ultraviolet_spark.streaming.sessions import (
    session_window_agg,
    streaming_session_counts,
)

GAP = 1799.5  # non-integer: stays off the open/closed boundary


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").cache()


def test_session_window_matches_batch_sessionizer(events):
    batch = sessionize(events, by="user_id", order="ts", gap_secs=GAP,
                       tiebreak="event_id")
    batch_sessions = (
        batch.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("ts").alias("session_start"))
    )
    native = session_window_agg(events, by="user_id", order="ts", gap_secs=GAP)
    a = sorted(map(tuple, batch_sessions
                   .select("user_id", "session_start", "n_events").collect()))
    b = sorted(map(tuple, native
                   .select("user_id", "session_start", "n_events").collect()))
    assert a == b


def test_streaming_sessions_on_memory_sink(spark, sf_dir, tmp_path):
    # feed the events parquet through an actual readStream
    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    # file-stream sources need a directory; stage the file into one
    srcdir = tmp_path / "stream_in"
    srcdir.mkdir()
    (srcdir / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(src.schema).format("parquet")
        .load(str(srcdir))
    )
    out = streaming_session_counts(stream, gap_secs=GAP, watermark="2 hours")
    q = (
        out.writeStream.format("memory").queryName("uv_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n, sum(n_events) AS rows FROM uv_sessions").head()
    batch = session_window_agg(src, gap_secs=GAP)
    # append mode emits only watermark-closed sessions; with
    # availableNow the final watermark closes everything except
    # sessions inside the last watermark horizon
    assert got["n"] > 0
    assert got["rows"] <= src.count()
    assert got["n"] <= batch.count()
