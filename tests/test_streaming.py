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


def _file_stream(spark, tmp_path, src_path, name):
    srcdir = tmp_path / f"in_{name}"
    srcdir.mkdir()
    (srcdir / "part.parquet").symlink_to(src_path)
    schema = spark.read.parquet(src_path).schema
    return spark.readStream.schema(schema).format("parquet").load(str(srcdir))


def _run_to_memory(out, name, tmp_path, mode="append"):
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode(mode)
         .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    from ultraviolet_spark.streaming.stateful import streaming_dedup

    src = f"{sf_dir}/events.parquet"
    stream = _file_stream(spark, tmp_path, src, "dedup")
    # duplicate every event by unioning the stream with itself
    out = streaming_dedup(stream.union(stream), key_cols=["event_id"],
                          ts_col="ts", watermark="1 hour")
    _run_to_memory(out, "uv_dedup", tmp_path)
    got = spark.sql("SELECT count(*) n, count(DISTINCT event_id) d "
                    "FROM uv_dedup").head()
    n_src = spark.read.parquet(src).count()
    assert got["n"] == got["d"] == n_src


def test_streaming_tumbling_counts_match_batch(spark, sf_dir, tmp_path):
    from ultraviolet_spark.streaming.stateful import streaming_windowed_counts

    src = f"{sf_dir}/events.parquet"
    stream = _file_stream(spark, tmp_path, src, "tumble")
    out = streaming_windowed_counts(stream, size="6 hours",
                                    watermark="1 minute")
    _run_to_memory(out, "uv_tumble", tmp_path)
    batch = spark.read.parquet(src)
    want = (batch.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n"))
    got = spark.sql("SELECT window_start, event_type, n FROM uv_tumble")
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, want.collect()))
    # availableNow's final watermark closes every window except possibly
    # the last horizon; windows emitted must match batch exactly
    assert a == [r for r in b if r in set(a)]
    assert len(a) >= len(b) - len(set(t for _, t, _ in b))


def _two_batch_stream(spark, feats, tmp_path, name, ts_col="warc_ts"):
    """Split feats time-wise into two files fed ONE PER TRIGGER so
    stateful operators must carry state across micro-batches."""
    ts_d = F.col(ts_col).cast("timestamp").cast("double")
    cut = feats.selectExpr(
        f"percentile(cast(cast({ts_col} as timestamp) as double), 0.5) p"
    ).head()["p"]
    srcdir = tmp_path / f"in_{name}"
    srcdir.mkdir()
    for fname, part in (("a_early", feats.filter(ts_d < cut)),
                        ("b_late", feats.filter(ts_d >= cut))):
        d = tmp_path / f"{name}_{fname}"
        part.coalesce(1).write.parquet(str(d))
        (srcdir / f"{fname}.parquet").symlink_to(
            next(d.glob("part-*.parquet")))
    return (spark.readStream.schema(feats.schema)
            .option("maxFilesPerTrigger", 1)
            .format("parquet").load(str(srcdir)))


def test_streaming_crawl_progress_matches_batch_lag(spark, pages_path, tmp_path):
    from ultraviolet_spark.streaming.stateful import streaming_crawl_progress

    pages = spark.read.parquet(pages_path)
    feats = pages.select("url", "warc_ts",
                         F.length("text").cast("long").alias("text_len"))
    # two micro-batches: the cross-batch state path (where the
    # state.get-is-a-property bug hid) must be exercised
    stream = _two_batch_stream(spark, feats, tmp_path, "crawl")
    out = streaming_crawl_progress(stream)
    _run_to_memory(out, "uv_crawl", tmp_path, mode="append")
    got = spark.sql(
        "SELECT url, warc_ts, text_len, crawl_no, len_delta FROM uv_crawl")

    from pyspark.sql import Window
    w = Window.partitionBy("url").orderBy("warc_ts")
    want = (feats
            .withColumn("crawl_no", F.row_number().over(w).cast("long"))
            .withColumn("len_delta",
                        (F.col("text_len")
                         - F.coalesce(F.lag("text_len").over(w),
                                      F.col("text_len"))).cast("long")))
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, want.select(got.columns).collect()))
    assert a == b


def test_streaming_ffill_matches_batch(spark, pages_path, tmp_path):
    """Cross-micro-batch state: the stream is split time-wise into two
    files fed one per trigger, so fills in batch 2 depend on state
    carried from batch 1; result must equal the batch window ffill."""
    from ultraviolet_spark.operators.windows import with_ffill
    from ultraviolet_spark.streaming.stateful import streaming_ffill

    pages = spark.read.parquet(pages_path)
    feats = pages.select(
        "url", "warc_ts",
        F.when(F.abs(F.hash("url", "warc_ts")) % 3 == 0, None)
         .otherwise(F.col("lang")).alias("lang"))
    stream = _two_batch_stream(spark, feats, tmp_path, "ffill")
    out = streaming_ffill(stream)
    _run_to_memory(out, "uv_ffill", tmp_path)

    got = sorted(map(tuple, spark.sql(
        "SELECT url, warc_ts, lang, lang_ffill FROM uv_ffill").collect()))
    want = sorted(map(tuple, with_ffill(feats, "lang")
                      .select("url", "warc_ts", "lang", "lang_ffill")
                      .collect()))
    assert got == want
    # the nulling actually exercised the fill
    assert any(g[2] is None and g[3] is not None for g in got)


def test_streaming_asof_enrich_matches_batch_asof(spark, sf_dir, tmp_path):
    """The flagship as-of join as a stateful streaming op: tagged
    spine+feature stream split time-wise into two micro-batches; the
    enriched spine must equal the batch asof_join."""
    from ultraviolet_spark.operators.asof import asof_join
    from ultraviolet_spark.streaming.stateful import (
        streaming_asof_enrich, tag_spine_and_features)

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    spine = (ev.filter(F.col("event_type") == "purchase")
             .select("user_id", "ts"))
    feats = (ev.filter(F.col("event_type") == "click")
             .select("user_id", "ts", "value"))
    tagged = tag_spine_and_features(spine, feats, by="user_id",
                                    ts_col="ts", val_col="value")
    stream = _two_batch_stream(spark, tagged, tmp_path, "asof", ts_col="ts")
    out = streaming_asof_enrich(stream, by="key", ts_col="ts",
                                val_col="value")
    _run_to_memory(out, "uv_asof_enrich", tmp_path)
    got = sorted(map(tuple, spark.sql(
        "SELECT key, ts, value FROM uv_asof_enrich").collect()))

    want_df = asof_join(spine, feats.withColumnRenamed("value", "v"),
                        on="ts", by="user_id", value_cols=["v"])
    want = sorted(map(tuple, want_df.select(
        F.col("user_id").cast("string"), "ts", "v").collect()))
    assert len(got) == spine.count()
    assert got == want
    # non-vacuous: some spines have a prior click, some don't
    assert any(g[2] is None for g in got)
    assert any(g[2] is not None for g in got)


def _two_file_stream(spark, df, ts_col, mid, tmp_path, name):
    """Write df as two time-split parquet files (early half, then late
    half, mtime-ordered) and open them as a maxFilesPerTrigger=1 file
    stream — two genuine micro-batches in event-time order."""
    import os
    import shutil

    srcdir = tmp_path / f"in_{name}"
    srcdir.mkdir()
    for i, cond in enumerate((F.col(ts_col) <= F.lit(mid),
                              F.col(ts_col) > F.lit(mid))):
        half = tmp_path / f"__{name}_{i}"
        df.filter(cond).coalesce(1).write.parquet(str(half))
        part = next(p for p in half.iterdir()
                    if p.name.startswith("part-"))
        dst = srcdir / f"b{i}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))
    return (spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .format("parquet").load(str(srcdir)))


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """Native two-STREAM interval join (watermarks on both sides +
    range predicate => bounded state) across two event-time-ordered
    micro-batches ≡ the same condition executed in batch mode —
    including matches whose click arrived a micro-batch EARLIER than
    the purchase (state must cross the batch boundary)."""
    from ultraviolet_spark.streaming.joins import stream_interval_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # watermarks require TIMESTAMP (LTZ); events.ts is NTZ — cast once
    # (session tz is UTC, so the instant mapping is deterministic)
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select("user_id", F.col("ts").cast("timestamp").alias("ts")))
    click = (ev.filter(F.col("event_type") == "click")
             .select("user_id", F.col("ts").cast("timestamp").alias("ts"),
                     "value"))
    mid_expr = F.expr("percentile_approx(ts, 0.5)")
    mid = purch.unionByName(click.drop("value")).agg(
        mid_expr.alias("m")).head()["m"]

    ls = _two_file_stream(spark, purch, "ts", mid, tmp_path, "ssj_l")
    rs = _two_file_stream(spark, click, "ts", mid, tmp_path, "ssj_r")
    out = stream_interval_join(ls, rs, by="user_id", lookback="48 hours",
                               watermark="1 hour")
    _run_to_memory(out, "uv_ssj", tmp_path)
    got = sorted(map(tuple, spark.sql(
        "SELECT user_id, ts, r_ts, r_value FROM uv_ssj").collect()))

    want = sorted(map(tuple, stream_interval_join(
        purch, click, by="user_id", lookback="48 hours",
        watermark="1 hour")
        .select("user_id", "ts", "r_ts", "r_value").collect()))
    assert got == want
    assert len(got) > 0
    # non-vacuous boundary crossing: at least one match pairs a click
    # from the early half with a purchase from the late half
    assert any(r_ts <= mid < ts for _, ts, r_ts, _ in got)


def test_streaming_cusum_matches_batch(spark, pages_path, tmp_path):
    """Streaming CUSUM ≡ batch closed form: text-length drift per url,
    stream split time-wise into two micro-batches so the warmup
    baseline and the running S state must both cross the batch
    boundary intact."""
    from ultraviolet_spark.operators.windows import cusum_stats
    from ultraviolet_spark.streaming.stateful import streaming_cusum

    pages = spark.read.parquet(pages_path)
    feats = pages.select("url", "warc_ts",
                         F.length("text").cast("double").alias("v"))
    kw = dict(warmup=3, allowance=0, threshold=100, scale=1)

    stream = _two_batch_stream(spark, feats, tmp_path, "cusum")
    out = streaming_cusum(stream, by="url", ts_col="warc_ts",
                          value_col="v", **kw)
    _run_to_memory(out, "uv_cusum", tmp_path)
    got = spark.sql("""
        SELECT key AS url, MAX(obs_no) AS n_obs,
               MAX(cusum_up) AS max_cusum_up,
               MAX(cusum_down) AS max_cusum_down,
               SUM(CASE WHEN alarm_up THEN 1 ELSE 0 END) AS n_alarms_up,
               SUM(CASE WHEN alarm_down THEN 1 ELSE 0 END)
                 AS n_alarms_down,
               MIN(CASE WHEN alarm_up OR alarm_down THEN ts END)
                 AS first_alarm_ts
        FROM uv_cusum GROUP BY key""")
    want = cusum_stats(feats, by="url", order="warc_ts",
                       value_col="v", **kw)
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w
    # non-vacuous: drift fires somewhere, stays quiet somewhere
    alarms = [r for r in g if r[4] or r[5]]
    assert alarms and len(alarms) < len(g)


def test_streaming_rate_limit_matches_batch(spark, sf_dir, tmp_path):
    """Streaming rate limiter ≡ batch max-plus closed form: per-user
    event stream split into two micro-batches; the next-free state
    must cross the boundary so batch-2 requests queue behind batch-1's
    last serve."""
    from ultraviolet_spark.operators.windows import rate_limit_schedule
    from ultraviolet_spark.streaming.stateful import streaming_rate_limit

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select("user_id", "ts").dropDuplicates(["user_id", "ts"]))
    stream = _two_batch_stream(spark, ev, tmp_path, "rl", ts_col="ts")
    out = streaming_rate_limit(stream, by="user_id", ready_col="ts",
                               delay_s=120)
    _run_to_memory(out, "uv_rl", tmp_path)
    got = sorted(map(tuple, spark.sql(
        "SELECT key, ready_ts, sched_ts, wait_us FROM uv_rl").collect()))
    want_df = rate_limit_schedule(ev, by="user_id", ready_col="ts",
                                  delay_s=120)
    want = sorted(map(tuple, want_df.select(
        F.col("user_id").cast("string"), F.col("ts"),
        "sched_ts", "sched_wait_us").collect()))
    assert got == want
    # non-vacuous: some requests queued, some did not
    waits = [g[3] for g in got]
    assert any(w > 0 for w in waits) and any(w == 0 for w in waits)


def test_streaming_target_encode_matches_batch(spark, sf_dir, tmp_path):
    """Streaming per-category expanding label stats ≡ the batch range
    window, as plain integer equality, across a genuine micro-batch
    boundary (batch-2 rows must read batch-1 state) and with the
    strict-time rule (same-ts rows blind to each other)."""
    from pyspark.sql import Window
    from ultraviolet_spark.streaming.stateful import streaming_target_encode

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select("event_id", "event_type", "ts", "value"))
    stream = _two_batch_stream(spark, ev, tmp_path, "te", ts_col="ts")
    out = streaming_target_encode(stream, cat_col="event_type",
                                  ts_col="ts", target_col="value",
                                  id_col="event_id")
    _run_to_memory(out, "uv_te", tmp_path)
    got = sorted(map(tuple, spark.sql(
        "SELECT event_id, n_past_cat, s_past_micro FROM uv_te")
        .collect()))

    t = F.round(F.col("value").cast("double") * 1e6).cast("long")
    w = (Window.partitionBy("event_type")
         .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
         .rangeBetween(Window.unboundedPreceding, -1))
    want = sorted(map(tuple, ev
                      .withColumn("n", F.count(t).over(w))
                      .withColumn("s", F.coalesce(F.sum(t).over(w),
                                                  F.lit(0)))
                      .select("event_id", "n", "s").collect()))
    assert got == want
    # non-vacuous: state crossed the boundary (late rows carry history)
    assert any(n > 0 for _e, n, _s in got)


def test_streaming_sprt_matches_batch(spark, sf_dir, tmp_path):
    """Streaming SPRT ≡ batch sprt_decision on the final state, as
    exact integer equality, with the crossing found in EITHER
    micro-batch surviving the boundary."""
    from ultraviolet_spark.operators.stats import sprt_decision
    from ultraviolet_spark.streaming.stateful import streaming_sprt

    LR1, LR0, U, L = 223144, -64539, 2944439, -2944439
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .withColumn("cohort",
                      F.when(F.col("user_id") % 2 == 0, "A")
                      .otherwise("B"))
          .withColumn("succ", (F.col("event_type") == "purchase")
                      .cast("boolean"))
          .select("cohort", "ts", "event_id", "succ"))
    stream = _two_batch_stream(spark, ev, tmp_path, "sprt", ts_col="ts")
    out = streaming_sprt(stream, ts_col="ts", id_col="event_id",
                         success_col="succ", group_col="cohort",
                         lr1_micro=LR1, lr0_micro=LR0,
                         upper_micro=U, lower_micro=L)
    _run_to_memory(out, "uv_sprt", tmp_path)
    # the LAST emitted row per group is the final state
    got = {r["grp"]: (r["n"], r["final_llr_micro"], r["cross_idx"],
                      r["decision"])
           for r in spark.sql(
               "SELECT * FROM uv_sprt ORDER BY n").collect()}

    want_df = sprt_decision(
        ev.withColumnRenamed("succ", "y"), ts_col="ts",
        id_col="event_id", success_expr="y", group_col="cohort",
        lr1_micro=LR1, lr0_micro=LR0, upper_micro=U, lower_micro=L)
    want = {r["grp"]: (r["n"], r["final_llr_micro"], r["cross_idx"],
                       r["decision"]) for r in want_df.collect()}
    assert got == want


def test_streaming_holt_winters_matches_batch(spark, sf_dir, tmp_path):
    """Streaming HW ≡ batch holt_winters_by_key on the final state, as
    exact integer equality — including keys whose INIT season is split
    across the micro-batch boundary."""
    from ultraviolet_spark.operators.windows import holt_winters_by_key
    from ultraviolet_spark.streaming.stateful import (
        streaming_holt_winters,
    )

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .groupBy("event_type",
                   F.date_trunc("hour", F.col("ts")).alias("hh"))
          .agg(F.count("*").cast("double").alias("c")))
    stream = _two_batch_stream(spark, ev, tmp_path, "hw", ts_col="hh")
    out = streaming_holt_winters(stream, by="event_type", ts_col="hh",
                                 value_col="c", season_len=24,
                                 horizon=3)
    _run_to_memory(out, "uv_hw", tmp_path)
    # last emitted row per key = final state
    got = {r["key"]: (r["n"], r["level_micro"], r["trend_micro"],
                      r["season_micro"], r["fc_micro"])
           for r in spark.sql(
               "SELECT * FROM uv_hw ORDER BY n").collect()}

    want = {r["event_type"]: (r["n"], r["level_micro"],
                              r["trend_micro"], r["season_micro"],
                              r["fc_micro"])
            for r in holt_winters_by_key(
                ev, value_col="c", order_cols=["hh"], by="event_type",
                season_len=24, horizon=3).collect()}
    assert got == want


def test_streaming_holt_winters_init_split_across_batches(
        spark, tmp_path):
    """The init season itself crosses the micro-batch boundary: 3 of 4
    init points arrive in batch one, the rest later — the frozen
    buffer must survive in state and produce the identical model."""
    import datetime as dt

    from ultraviolet_spark.operators.windows import holt_winters_by_key
    from ultraviolet_spark.streaming.stateful import (
        streaming_holt_winters,
    )

    base = dt.datetime(2024, 1, 1)
    vals = [5.0, 9.0, 7.0, 11.0, 6.0, 10.0, 8.0, 12.0, 7.0, 11.0]
    rows = [("k1", base + dt.timedelta(hours=i), v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, hh timestamp_ntz, c double")
    stream = _two_batch_stream(spark, df, tmp_path, "hw2", ts_col="hh")
    out = streaming_holt_winters(stream, by="g", ts_col="hh",
                                 value_col="c", season_len=8, horizon=2)
    _run_to_memory(out, "uv_hw2", tmp_path)
    rows_out = spark.sql("SELECT * FROM uv_hw2 ORDER BY n").collect()
    # first batch ends mid-init (n < 4) → NULL model fields emitted
    assert rows_out[0]["n"] < 8 and rows_out[0]["level_micro"] is None
    got = rows_out[-1]
    want = holt_winters_by_key(df, value_col="c", order_cols=["hh"],
                               by="g", season_len=8, horizon=2).head()
    assert (got["n"], got["level_micro"], got["trend_micro"],
            got["season_micro"], got["fc_micro"]) == \
        (want["n"], want["level_micro"], want["trend_micro"],
         want["season_micro"], want["fc_micro"])


def test_streaming_ewma_matches_batch(spark, sf_dir, tmp_path):
    """Streaming EWMA ≡ batch ewma_by_key on the final per-key value,
    exact integer equality with state crossing the two-micro-batch
    boundary."""
    from ultraviolet_spark.operators.windows import ewma_by_key
    from ultraviolet_spark.streaming.stateful import streaming_ewma

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("event_type") == "purchase")
          .select("user_id", "ts", "event_id", "value"))
    stream = _two_batch_stream(spark, ev, tmp_path, "ewma", ts_col="ts")
    out = streaming_ewma(stream, by="user_id", ts_col="ts",
                         value_col="value", tiebreak_col="event_id")
    _run_to_memory(out, "uv_ewma", tmp_path)
    got = {r["key"]: (r["n"], r["ewma_micro"])
           for r in spark.sql(
               "SELECT * FROM uv_ewma ORDER BY n").collect()}

    want = {str(r["user_id"]): (r["n"], r["ewma_micro"])
            for r in ewma_by_key(ev, value_col="value",
                                 order_cols=["ts", "event_id"],
                                 by="user_id").collect()}
    assert got == want
