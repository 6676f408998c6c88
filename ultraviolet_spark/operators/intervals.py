"""Interval-overlap join — find all pairs of time intervals that
overlap, WITHOUT a cartesian product.  The web-pipeline shapes: visit
sessions × campaign windows (attribution), crawl windows × outage
windows (fetch-quality triage), capture intervals × license embargo
intervals.

Method (the standard temporal-bucketing reduction): each interval
explodes into the coarse time buckets of width ``bucket_secs`` it
touches, the two sides equi-join on (keys…, bucket), and a CANONICAL-
bucket predicate — the pair is kept only in the bucket containing
``greatest(l.start, r.start)`` — makes every overlapping pair surface
exactly once with NO post-join dedup shuffle.  An exact overlap filter
removes same-bucket non-overlaps.

Scale: shuffle volume is Σ interval-length / bucket width per side —
linear, tunable, never pairs².  Pick ``bucket_secs`` near the median
interval length: too small multiplies the explode, too large turns
each bucket into a mini cross join.  Skewed buckets (one hot hour)
are ordinary join skew — AQE skew-join or salting applies unchanged.
Catalyst sees plain explode + equi-join, so AQE, broadcast promotion
and bucketed layouts all work; the plan is asserted cartesian-free in
the tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overlap_join(left: DataFrame, right: DataFrame, *,
                 key_cols: Sequence[str],
                 left_start: str = "start", left_end: str = "end",
                 right_start: str = "start", right_end: str = "end",
                 bucket_secs: int = 3600) -> DataFrame:
    """All (left, right) pairs with ``l.start <= r.end AND r.start <=
    l.end`` (closed intervals, microsecond precision), equi-joined on
    ``key_cols`` + time bucket.  Column names across the two frames
    must be disjoint apart from ``key_cols`` (rename before calling).
    Adds ``overlap_start``, ``overlap_end`` and ``overlap_secs``
    (floor of the exact integer-microsecond overlap — cross-engine
    stable, no double arithmetic).

    Malformed intervals (end < start, NULL bounds) produce no pairs:
    ``sequence()`` over a negative range would throw, so they are
    filtered, not exploded.
    """
    w_us = int(bucket_secs) * 1_000_000

    def buckets(df: DataFrame, s: str, e: str) -> DataFrame:
        ok = (F.col(s).isNotNull() & F.col(e).isNotNull()
              & (F.unix_micros(F.col(s)) <= F.unix_micros(F.col(e))))
        b = F.sequence(
            F.floor(F.unix_micros(F.col(s)) / F.lit(w_us)),
            F.floor(F.unix_micros(F.col(e)) / F.lit(w_us)))
        return df.filter(ok).withColumn("__bucket", F.explode(b))

    lb = buckets(left, left_start, left_end)
    rb = buckets(right, right_start, right_end)
    joined = lb.join(rb, [*key_cols, "__bucket"])
    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(right_start), F.col(right_end)
    canonical = (F.col("__bucket")
                 == F.floor(F.greatest(F.unix_micros(ls),
                                       F.unix_micros(rs)) / F.lit(w_us)))
    overlap = (F.unix_micros(ls) <= F.unix_micros(re_)) & \
              (F.unix_micros(rs) <= F.unix_micros(le))
    out = (joined.filter(canonical & overlap).drop("__bucket"))
    ov_start = F.greatest(ls, rs)
    ov_end = F.least(le, re_)
    secs = F.expr(
        f"(unix_micros(least({left_end}, {right_end})) - "
        f"unix_micros(greatest({left_start}, {right_start}))) "
        f"div 1000000")
    return (out.withColumn("overlap_start", ov_start)
               .withColumn("overlap_end", ov_end)
               .withColumn("overlap_secs", secs.cast("long")))


def interval_union(df: DataFrame, *, key_cols: Sequence[str],
                   start_col: str = "start",
                   end_col: str = "end") -> DataFrame:
    """Merge overlapping/touching closed intervals per key into
    disjoint coverage spans — the gaps-and-islands reduction of a
    visit log / crawl-window table (complement of :func:`overlap_join`
    which PAIRS intervals; this one UNIONS them).

    Per key, intervals sorted by (start, end) open a new span exactly
    when ``start > running_max(end)`` over all earlier intervals —
    touching closed intervals ([1,3],[3,5]) merge, and an interval
    swallowed by a longer predecessor ([1,10],[2,3]) extends nothing
    but still counts in ``n_merged``.  Output one row per span:
    ``span_start``, ``span_end``, ``n_merged``, ``span_us`` (exact
    integer-microsecond length — no double arithmetic anywhere).

    Ties need no tiebreak column: two intervals with equal starts
    always land in the same span (the running max is ≥ their shared
    start), so span boundaries — and therefore min/max/count per span
    — are identical under any tie order.

    Malformed intervals (end < start, NULL bounds) are filtered, not
    merged: a negative-length visit is sensor garbage, and silently
    clamping it would fabricate coverage.

    Scale: ONE exchange on ``key_cols`` shared by both window passes
    (running max + island cumsum, same partitioning/ordering) and the
    span groupBy; no self-join, no explode.  Row count only shrinks.
    """
    from pyspark.sql import Window

    keys = list(key_cols)
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    base = (df.filter(F.col(start_col).isNotNull()
                      & F.col(end_col).isNotNull())
            .select(*keys, s_us.alias("__s"), e_us.alias("__e"))
            .filter(F.col("__e") >= F.col("__s")))
    w = Window.partitionBy(*keys).orderBy("__s", "__e")
    pm = F.max("__e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = base.withColumn(
        "__new", F.when(pm.isNull() | (F.col("__s") > pm), 1).otherwise(0))
    isl = flagged.withColumn(
        "__island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (isl.groupBy(*keys, "__island")
            .agg(F.min("__s").alias("__ss"), F.max("__e").alias("__se"),
                 F.count("*").cast("long").alias("n_merged"))
            .select(*keys,
                    F.timestamp_micros(F.col("__ss")).alias("span_start"),
                    F.timestamp_micros(F.col("__se")).alias("span_end"),
                    "n_merged",
                    (F.col("__se") - F.col("__ss")).alias("span_us")))
