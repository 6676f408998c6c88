"""Leakage-safe categorical target encoding — the feature-engineering
operator family this engine's north rule is about, applied to labels.

Target (mean) encoding replaces a high-cardinality categorical column
with the mean of the target over "other" rows of the same category.
Done naively (mean over ALL rows including self and future) it leaks
the label into the feature; the two honest estimators are

* **point-in-time** (``pit_target_encode``): for each row, the target
  mean over rows of the same category at STRICTLY EARLIER event time,
  Bayesian-smoothed toward the global mean of ALL strictly earlier
  rows with pseudo-count ``m`` (micci-barreca smoothing with a prior
  that is itself leakage-free).  This is the encoding a model in
  production could actually have computed at event time.
* **leave-one-out** (``loo_target_encode``): mean over all OTHER rows
  of the category — the batch/offline variant (Owen Zhang's LOO); it
  removes self-leakage but not temporal leakage, so it's the
  train-time-only companion.

Exactness discipline (matches the registry parity rules): the target
is snapped once to integer micro-units; every prefix/group sum is an
exact int64 sum of those integers; the only doubles are the final
divisions, performed in a fixed operand order both engines replicate.

Scale: the per-category expanding sums are ONE window over a
(category) hash exchange.  The GLOBAL expanding prior never moves all
data to one partition: rows are bucketed by coarse time ranges
(contiguous in the (ts, id) total order by construction), cumsummed
within each bucket, and offset by an exclusive prefix over the tiny
bucket-totals frame broadcast back — the same two-phase distributed
prefix sum as ``textstats.heaps_fit`` / ``corpus.pack_sequences``.
At 10^12 rows the only data-sized shuffles are (category) and
(time-bucket); the unpartitioned window touches only ~n_buckets rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pit_target_encode", "loo_target_encode"]


def _micro(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("double") * 1e6).cast("long")


def loo_target_encode(df: DataFrame, *, cat_col: str,
                      target_col: str) -> DataFrame:
    """Leave-one-out encoding: (category sum − own target)/(n − 1).

    Rows whose category has a single occurrence get NULL (no "other"
    rows exist — emitting the global mean there would be a silent
    imputation policy; callers choose their own).  One (category)
    partial-agg exchange + one broadcast-or-hash join back; no window.
    """
    t = _micro(target_col)
    per_cat = (df.groupBy(cat_col)
               .agg(F.sum(t).alias("__cat_sum"),
                    F.count(t).alias("__cat_n")))
    out = (df.join(per_cat, cat_col)
           .withColumn(
               "enc_loo",
               F.when(F.col("__cat_n") > 1,
                      F.round((F.col("__cat_sum") - t).cast("double")
                              / (F.col("__cat_n") - 1).cast("double")
                              / F.lit(1e6), 6)))
           .withColumn("n_other", F.col("__cat_n") - 1))
    return out.drop("__cat_sum", "__cat_n")


def pit_target_encode(df: DataFrame, *, cat_col: str, ts_col: str,
                      target_col: str,
                      prior_weight: int = 20,
                      n_buckets: int = 64) -> DataFrame:
    """Point-in-time smoothed target encoding.

    For row *i* with category *c* at time *t*:

    ``enc_pit = (S_c + m · (S_all / N_all)) / (N_c + m)``

    where S_c/N_c sum/count the target over same-category rows at
    STRICTLY earlier event time, S_all/N_all over ALL strictly earlier
    rows, and ``m = prior_weight``.  The very first instant in the
    corpus (N_all = 0) has no defensible prior and encodes NULL.

    Strictness is on event TIME, not on any (ts, id) tiebreak: both
    windows are RANGE windows over integer microseconds, so
    same-timestamp rows never see each other's labels — at event time
    a concurrent label is not yet observable, the same
    zero-temporal-leakage rule the as-of join enforces for features
    (``operators/asof.py``) — and the result needs no tiebreak column
    to be deterministic.
    """
    t = _micro(target_col)
    # integer-microsecond event time: parquet timestamps are NTZ and
    # unix_micros refuses them, so cast through the UTC-pinned session
    um = F.unix_micros(F.col(ts_col).cast("timestamp"))
    out = df.withColumn("__um", um)
    w_cat = (Window.partitionBy(cat_col).orderBy("__um")
             .rangeBetween(Window.unboundedPreceding, -1))
    out = (out
           .withColumn("__n_cat", F.count(t).over(w_cat))
           .withColumn("__s_cat",
                       F.coalesce(F.sum(t).over(w_cat), F.lit(0))))

    # global strictly-earlier prefix via time-range buckets: bucket id
    # is floor((um - min_um) / span) — a non-decreasing function of
    # event time that never splits a timestamp across buckets, so
    # in-bucket range prefix + exclusive bucket offsets is the exact
    # global range prefix.  The offsets frame stays broadcast-sized
    # (≤ n_buckets + 1 rows).
    bounds = df.agg(F.min(um).alias("__lo"), F.max(um).alias("__hi"))
    out = (out.crossJoin(F.broadcast(bounds))
           .withColumn(
               "__b",
               F.expr(f"(__um - __lo) div "
                      f"((__hi - __lo) div {int(n_buckets)} + 1)")))
    w_in = (Window.partitionBy("__b").orderBy("__um")
            .rangeBetween(Window.unboundedPreceding, -1))
    out = (out
           .withColumn("__n_in", F.count(t).over(w_in))
           .withColumn("__s_in",
                       F.coalesce(F.sum(t).over(w_in), F.lit(0))))
    btot = out.groupBy("__b").agg(F.count(t).alias("__bn"),
                                  F.sum(t).alias("__bs"))
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "__b",
        F.coalesce(F.sum("__bn").over(w_b), F.lit(0)).alias("__on"),
        F.coalesce(F.sum("__bs").over(w_b), F.lit(0)).alias("__os"))
    out = (out.join(F.broadcast(boff), "__b")
           .withColumn("__n_all", F.col("__on") + F.col("__n_in"))
           .withColumn("__s_all", F.col("__os") + F.col("__s_in")))

    # fixed operand order, replicated verbatim in the oracle SQL:
    # prior = s_all/n_all; enc = (s_cat + m*prior) / (n_cat + m) / 1e6
    m = F.lit(int(prior_weight)).cast("double")
    prior = F.col("__s_all").cast("double") / F.col("__n_all").cast("double")
    enc = F.when(
        F.col("__n_all") > 0,
        F.round((F.col("__s_cat").cast("double") + m * prior)
                / (F.col("__n_cat").cast("double") + m) / F.lit(1e6), 6))
    out = (out.withColumn("enc_pit", enc)
           .withColumn("n_past_cat", F.col("__n_cat"))
           .withColumn("n_past_all", F.col("__n_all")))
    return out.drop("__n_cat", "__s_cat", "__n_in", "__s_in", "__b",
                    "__on", "__os", "__n_all", "__s_all", "__lo", "__hi",
                    "__um")
