"""Structured-Streaming surface (SURVEY.md §2.8 — optional demo; the
north rule is batch point-in-time correctness).

* ``session_window_agg`` — Spark's native session windows; works on
  both batch and streaming DataFrames, cross-checked against the batch
  sessionizer in tests/test_streaming.py.
* ``streaming_session_counts`` — the streaming wiring: watermark +
  session_window groupBy, ready for ``writeStream`` on a cluster.

Boundary semantics note: ``F.session_window(ts, gap)`` closes a session
when the next event is ≥ gap after the last one, while the batch
sessionizer (operators/windows.py) starts a new session when the gap is
strictly > G.  Events exactly at the boundary are measure-zero for
continuous timestamps; tests use a non-integer gap to stay off it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_window_agg(df: DataFrame, *, by: str = "user_id",
                       order: str = "ts", gap_secs: float = 1800.0) -> DataFrame:
    """One row per (key, session): start/end/n_events.  Batch or
    streaming input."""
    gap = f"{gap_secs} seconds"
    return (
        df.groupBy(F.col(by), F.session_window(F.col(order), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(by),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_session_counts(stream: DataFrame, *, by: str = "user_id",
                             order: str = "ts", gap_secs: float = 1800.0,
                             watermark: str = "1 hour") -> DataFrame:
    """readStream → watermark → session windows.  Late rows beyond the
    watermark are dropped (documented, deterministic late-data policy);
    attach ``.writeStream.outputMode("append")`` downstream.

    Watermarks require TIMESTAMP (with zone); parquet event time is
    NTZ, so cast first — identity under the engine's fixed UTC session
    timezone."""
    stream = stream.withColumn(order, F.col(order).cast("timestamp"))
    return session_window_agg(
        stream.withWatermark(order, watermark),
        by=by, order=order, gap_secs=gap_secs,
    )


def stream_stream_interval_join(left, right, *, by: str = "user_id",
                                right_by: str | None = None,
                                left_ts: str = "l_ts",
                                right_ts: str = "r_ts",
                                max_delay: str = "1 hour",
                                watermark: str = "2 hours"):
    """Watermarked stream–stream INNER join with a time-interval
    condition (the attribution-join shape: every right event within
    ``max_delay`` AFTER its left event, same key).  Both sides carry a
    watermark so Spark can bound the join state: left rows are held at
    most ``watermark``, right rows at most ``watermark + max_delay`` —
    without the interval bound the state store grows forever, which is
    the classic stream-join production failure.

    Works identically on batch frames (the join condition is plain
    Catalyst), which is how the q184 oracle equivalence is phrased.
    """
    from pyspark.sql import functions as F

    right_by = right_by or by
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = ((lw[by] == rw[right_by])
            & (rw[right_ts] >= lw[left_ts])
            & (rw[right_ts] <= lw[left_ts] + F.expr(f"interval {max_delay}")))
    return lw.join(rw, cond, "inner")
