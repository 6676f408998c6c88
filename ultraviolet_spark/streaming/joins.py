"""Stream-stream interval joins (Structured Streaming's native
two-stream join, wrapped so the three correctness requirements cannot
be forgotten piecemeal).

Spark's stream-stream join is only correct AND state-bounded when all
three of these hold, and missing any one fails *silently* — state leaks
without bound, or matches are dropped with no error:

* watermarks on BOTH input streams (state eviction needs a global
  event-time horizon);
* a time-RANGE predicate in the join condition (the optimizer derives
  each side's state-retention bound from it — an equi-join alone keeps
  every row forever);
* the equality key in the condition (state is shuffled by it, so
  matching rows co-locate).

:func:`stream_interval_join` builds the canonical "right event within
``lookback`` BEFORE the left event" join — the streaming form of the
batch interval join (q11's error-within-hour-of-purchase shape) and the
candidate-generation step of a streaming as-of enrich.  Right-side
columns are prefix-renamed (both streams usually share ``(key, ts)``
names, and Spark's condition would otherwise be ambiguous).

Semantics vs batch: for on-time data (each micro-batch no older than
watermark − delay), the inner join emits exactly the batch join's rows
— pinned by tests/test_streaming.py against the same condition executed
in batch mode.  State: left rows retire once no future right row can
fall in their window; right rows once the watermark passes
``rts + lookback``.

Scale notes (100 TB/day streams): state is hash-partitioned by the
join key across executors; per-key state is bounded by the lookback
window × that key's rate, so hot keys behave exactly like the batch
skew problem — cap lookback first, salt the key only if a single
entity's window genuinely overflows one executor.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(left: DataFrame, right: DataFrame, *, by: str,
                         left_ts: str = "ts", right_ts: str = "ts",
                         lookback: str = "1 hour",
                         watermark: str = "1 hour",
                         prefix: str = "r_") -> DataFrame:
    """Inner-join ``left`` to every ``right`` row of the same ``by`` key
    with ``right.ts ∈ [left.ts − lookback, left.ts]``.  Works on batch
    DataFrames too (``withWatermark`` is a no-op there), so the same
    call is its own batch oracle."""
    l = left.withWatermark(left_ts, watermark)
    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, prefix + c)
    r = r.withWatermark(prefix + right_ts, watermark)
    lts, rts = F.col(left_ts), F.col(prefix + right_ts)
    cond = ((F.col(by) == F.col(prefix + by))
            & (rts >= lts - F.expr(f"INTERVAL {lookback}"))
            & (rts <= lts))
    return l.join(r, cond, "inner")
